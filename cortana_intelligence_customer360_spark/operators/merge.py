"""Warehouse change-application operators: batch MERGE (upsert) and
SCD type-2 history building.

Neither needs a table format with MERGE INTO (no Delta/Iceberg libs in
this container): the distributed form of an upsert IS an outer join on
the merge key plus a union of the not-matched inserts, which is exactly
what Delta executes under the hood. Expressing it directly keeps the
whole operation one key-shuffle (plus a map-side union) and works on
plain parquet at any scale.

The changeset derives deterministically from the orders table, so both
operators carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..compat import bcount, dsum, dsum_sql, epoch_us, epoch_us_sql
from ..sources.tables import load_table

_CUTOFF = "2000-01-01 00:00:00"
_NEW_KEY_OFFSET = 10_000_000
_VIP_SPEND = 400_000.0


def _changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic changes derived from recent orders: per customer,
    total spend and order count since the cutoff."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(_CUTOFF).cast("timestamp")
    )
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum("o_totalprice").alias("spend"), bcount().alias("n_orders")
    )


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the changeset into the customer base table:

    - MATCHED  -> update: credit the spend into the balance, re-segment
      big spenders as VIP.
    - NOT MATCHED (new keys, offset to disjoint id space) -> insert.

    Plan: one shuffle join base<->changes on the merge key, then a
    union with the insert projection (no extra shuffle). This is the
    exact dataflow a Delta MERGE plans, on plain parquet."""
    base = load_table(spark, sf_dir, "customer")
    chg = _changeset(spark, sf_dir)

    updated = (
        base.join(chg, base.c_custkey == chg.custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.round(
                F.col("c_acctbal") + F.coalesce(F.col("spend"), F.lit(0.0)) / 100.0, 6
            ).alias("acctbal"),
            F.when(F.col("spend") > _VIP_SPEND, F.lit("VIP"))
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
            F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("n_orders"),
        )
    )
    inserts = chg.where(F.col("spend") > _VIP_SPEND).select(
        (F.col("custkey") + _NEW_KEY_OFFSET).alias("custkey"),
        F.concat(F.lit("PROSPECT_"), F.col("custkey")).alias("name"),
        F.lit(0.0).alias("acctbal"),
        F.lit("NEW").alias("segment"),
        F.col("n_orders"),
    )
    return updated.unionByName(inserts)


_MERGE_SQL = f"""
WITH chg AS (
  SELECT o_custkey AS custkey,
         {dsum_sql('o_totalprice')} AS spend,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
  GROUP BY 1)
SELECT c_custkey AS custkey, c_name AS name,
       round(c_acctbal + COALESCE(spend, 0.0) / 100.0, 6) AS acctbal,
       CASE WHEN spend > {_VIP_SPEND} THEN 'VIP' ELSE c_mktsegment END AS segment,
       COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders
FROM customer LEFT JOIN chg ON c_custkey = custkey
UNION ALL
SELECT custkey + {_NEW_KEY_OFFSET}, 'PROSPECT_' || custkey, 0.0, 'NEW', n_orders
FROM chg WHERE spend > {_VIP_SPEND}
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from the order stream:
    one row per (customer, consecutive run of order priority), with
    validity interval and version number.

    Run-compression is the lag!=current trick; validity close-off is a
    lead over the change points. Two window passes over ONE partition
    shuffle on custkey (same window spec), linear at scale."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marked = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev_prio"),
    ).where(
        F.col("prev_prio").isNull()
        | (F.col("prev_prio") != F.col("o_orderpriority"))
    )
    wv = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return marked.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        epoch_us("o_orderdate").alias("valid_from_us"),
        epoch_us(F.lead("o_orderdate").over(wv)).alias("valid_to_us"),
        F.row_number().over(wv).cast("long").alias("version_no"),
    )


_SCD2_SQL = f"""
WITH marked AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         lag(o_orderpriority) OVER w AS prev_prio
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
runs AS (
  SELECT * FROM marked
  WHERE prev_prio IS NULL OR prev_prio != o_orderpriority)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       {epoch_us_sql('o_orderdate')} AS valid_from_us,
       {epoch_us_sql('lead(o_orderdate) OVER w2')} AS valid_to_us,
       CAST(row_number() OVER w2 AS BIGINT) AS version_no
FROM runs
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


QUERIES = {
    "merge_upsert": merge_upsert,
    "scd2_history": scd2_history,
}
ORACLE = {
    "merge_upsert": _MERGE_SQL,
    "scd2_history": _SCD2_SQL,
}
