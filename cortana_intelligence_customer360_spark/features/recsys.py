"""Collaborative-filtering primitives over the customer–part purchase
matrix: item–item cosine similarity through shared customers.

Reference parity: the upstream Customer-360 solution's recommendation
surface (SURVEY.md §1.1, §3 — checkout itself empty, §0) is an offline
item-affinity batch job; this is that job in one declarative plan.

Scale posture (100 TB): the incidence list is DISTINCT (customer,
part) — one shuffle — and pair generation goes through the customer
key, so a pair is only materialized when two parts share a buyer
(never an all-pairs part join). Per-customer item lists are capped at
``_UI_ITEM_CAP`` most-purchased items (deterministic strength rank,
mirrored in the oracle): the cap bounds the per-customer pair fan-out
at cap²/2, which is what keeps the pair volume linear in customers on
power-law purchase data. Degrees (n_i) are computed from the SAME
capped incidence list, so the cosine stays internally consistent
whether or not the cap binds. Cosine = cooc / sqrt(n_i · n_j) on
exact integers — identical IEEE doubles in both engines, ranked
before rounding, r6 at emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

# Each customer contributes only their _UI_ITEM_CAP most-purchased
# items (purchase-count desc, item-key tiebreak) — the cap BINDS on the
# ~80-item natural basket and bounds per-customer pair fan-out at
# cap²/2. The truncation rule is deterministic and mirrored
# bit-for-bit in the oracle, so the compare stays exact under it.
_UI_ITEM_CAP = 24
_SIM_TOPK = 50


def _capped_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ui = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("item")
        )
        .groupBy("cust", "item")
        .agg(bcount().alias("n_buys"))
    )
    w = Window.partitionBy("cust").orderBy(
        F.col("n_buys").desc(), F.col("item").asc()
    )
    return (
        ui.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _UI_ITEM_CAP)
        .select("cust", "item")
    )


def feat_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top item–item cosine pairs: sim(i,j) = |buyers(i) ∩ buyers(j)|
    / sqrt(|buyers(i)|·|buyers(j)|) — the "customers who bought X also
    bought Y" batch table."""
    ui = _capped_incidence(spark, sf_dir)
    a = ui.select(F.col("cust"), F.col("item").alias("i"))
    b = ui.select(F.col("cust"), F.col("item").alias("j"))
    cooc = (
        a.join(b, "cust")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(bcount().alias("cooc"))
    )
    deg = ui.groupBy("item").agg(bcount().alias("n"))
    di = deg.select(F.col("item").alias("i"), F.col("n").alias("n_i"))
    dj = deg.select(F.col("item").alias("j"), F.col("n").alias("n_j"))
    cos = F.col("cooc") / F.sqrt(F.col("n_i") * F.col("n_j"))
    scored = (
        cooc.join(di, "i")
        .join(dj, "j")
        .select("i", "j", "cooc", "n_i", "n_j", cos.alias("cos_raw"))
    )
    return (
        scored.orderBy(
            F.col("cos_raw").desc(),
            F.col("cooc").desc(),
            F.col("i").asc(),
            F.col("j").asc(),
        )
        .limit(_SIM_TOPK)
        .select(
            "i",
            "j",
            "cooc",
            "n_i",
            "n_j",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


_ITEM_SIM_SQL = f"""
WITH ui0 AS (
  SELECT o_custkey AS cust, l_partkey AS item,
         CAST(COUNT(*) AS BIGINT) AS n_buys
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
ui AS (
  SELECT cust, item FROM (
    SELECT cust, item,
           ROW_NUMBER() OVER (PARTITION BY cust
                              ORDER BY n_buys DESC, item ASC) AS rk
    FROM ui0)
  WHERE rk <= {_UI_ITEM_CAP}),
cooc AS (
  SELECT a.item AS i, b.item AS j, CAST(COUNT(*) AS BIGINT) AS cooc
  FROM ui a JOIN ui b ON a.cust = b.cust AND a.item < b.item
  GROUP BY 1, 2),
deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM ui GROUP BY item)
SELECT i, j, cooc, di.n AS n_i, dj.n AS n_j,
       round(cooc / sqrt(di.n * dj.n), 6) AS cosine
FROM cooc
JOIN deg di ON di.item = cooc.i
JOIN deg dj ON dj.item = cooc.j
ORDER BY cooc / sqrt(di.n * dj.n) DESC, cooc DESC, i ASC, j ASC
LIMIT {_SIM_TOPK}
"""


QUERIES = {
    "feat_item_similarity": feat_item_similarity,
}

ORACLE = {
    "feat_item_similarity": _ITEM_SIM_SQL,
}
