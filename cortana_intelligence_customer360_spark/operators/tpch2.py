"""TPC-H adaptations, second batch: Q2/Q6/Q9/Q11/Q13/Q16/Q17/Q20/Q21.

Together with operators/tpch.py (Q3/Q4/Q5/Q7/Q8/Q10/Q12/Q14/Q15/Q18/
Q19/Q22) and agg_pricing_summary (the Q1 shape), this completes all 22
TPC-H query shapes on the synthetic star schema.

Schema adaptations (this dataset has no partsupp table and no
commit/receipt dates): lineitem's (l_partkey, l_suppkey) pairs stand in
for the part-supplier relation, unit cost is min(l_extendedprice /
l_quantity), "late" means shipped >60 days after the order date, and
p_retailprice stands in for supply cost in the Q9 profit expression.

Cross-engine float discipline (compat.py rules): every sum goes through
DECIMAL; threshold comparisons that TPC-H states as float fractions
(Q11's 0.0001, Q17's 0.2, Q20's 0.5) are restated as EXACT integer /
decimal multiplications (``x * 10000 > total`` etc.) so no row can flip
on a ulp between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount, dsum, dsum_sql
from ..sources.tables import load_table


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the region supplier(s) with
    the MINIMUM unit cost — the correlated-scalar-subquery signature.
    Unit cost is a per-row IEEE division (identical in both engines),
    and MIN never accumulates, so the min-equality self-join is exact.
    All dims broadcast; lineitem aggregates before the equality join."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp_r = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_r), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit).alias("unit_cost"))
    )
    min_cost = cost.groupBy("p_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        cost.join(
            F.broadcast(min_cost.withColumnRenamed("p_partkey", "mp_partkey")),
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("s_suppkey").asc(), F.col("p_partkey").asc()
        )
        .limit(100)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost"
        )
    )


_Q2_SQL = """
WITH cost AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA' AND p_size = 15 AND p_type = 'STANDARD'
  GROUP BY 1, 2, 3, 4, 5, 6)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
FROM cost
WHERE unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                   WHERE c2.p_partkey = cost.p_partkey)
ORDER BY s_acctbal DESC, s_suppkey ASC, p_partkey ASC
LIMIT 100
"""


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue delta from a discount band in one year — a
    pure scan-filter-aggregate. All three predicates push into the
    parquet scan (asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        bcount().alias("n_lines"),
    )


_Q6_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year for parts
    whose name contains a token. Profit = revenue - p_retailprice *
    l_quantity (retail price stands in for the absent supply cost).
    part/supplier/nation broadcast; only lineitem-orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {dsum_sql('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose inventory value (for one nation's
    suppliers) exceeds a fraction of the nation's total — the
    scalar-subquery-threshold signature. The 0.001 fraction is
    restated as ``part_value * 1000 > total_value`` in EXACT decimal
    on both engines, so no part can flip on a float ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    supp_n = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    value = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    li_n = li.join(
        F.broadcast(supp_n.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey")
    )
    per_part = li_n.groupBy("l_partkey").agg(F.sum(value).alias("val_dec"))
    total = per_part.agg(F.sum("val_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("val_dec") * 1000 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


_Q11_SQL = """
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS val_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY 1)
SELECT l_partkey AS p_partkey,
       CAST(val_dec AS DOUBLE) AS part_value
FROM pv
WHERE val_dec * 1000 > (SELECT SUM(val_dec) FROM pv)
ORDER BY part_value DESC, p_partkey ASC
"""


def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count, including
    zero-order customers — LEFT OUTER join + COUNT(col) (which skips
    the unmatched NULLs), then a second aggregation over the counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(bcount("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(bcount().alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY 1)
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per (brand, type, size) for
    parts outside an excluded brand/type, skipping blacklisted
    suppliers — NOT IN over a non-null subquery becomes a LEFT ANTI
    join; the distinct count shuffles once on the group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity orders of one brand —
    the correlated-AVG signature. ``l_quantity < 0.2 * avg(part qty)``
    is restated exactly as ``qty * 5 * cnt < qty_sum`` in decimal
    (0.2 == 1/5), so the cutoff cannot flip on a cross-engine ulp.
    Per-part stats aggregate before the join (map-side combine)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    li_b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,3)")).alias("qty_sum"),
        bcount().cast("decimal(10,0)").alias("qty_cnt"),
    )
    return (
        li_b.join(per_part, li_b.l_partkey == F.col("pp_key"))
        .where(
            F.col("l_quantity").cast("decimal(12,3)") * 5 * F.col("qty_cnt")
            < F.col("qty_sum")
        )
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            bcount().alias("n_lines"),
        )
    )


_Q17_SQL = f"""
WITH pp AS (
  SELECT l_partkey AS pp_key,
         SUM(CAST(l_quantity AS DECIMAL(12,3))) AS qty_sum,
         CAST(COUNT(*) AS DECIMAL(10,0)) AS qty_cnt
  FROM lineitem GROUP BY 1)
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pp   ON l_partkey = pp_key
WHERE p_brand = 'Brand#11'
  AND CAST(l_quantity AS DECIMAL(12,3)) * 5 * qty_cnt < qty_sum
"""


def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers of one nation who dominated a part's 1996
    shipments — nested semi-join chain. "Excess stock" (availqty >
    0.5 * shipped) is adapted to ``supplier_qty * 2 > part_total`` in
    exact BIGINT (quantities are integral). Both quantity rollups
    aggregate lineitem on its natural keys before any join."""
    li = load_table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1996)
    part_f = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("small")
    )
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = load_table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("ps_qty")
    )
    ptot = li.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("p_qty")
    )
    dominant = (
        ps.join(ptot, ps.l_partkey == F.col("pt_key"))
        .where(F.col("ps_qty") * 2 > F.col("p_qty"))
        .join(F.broadcast(part_f), ps.l_partkey == part_f.p_partkey, "left_semi")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


_Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_qty
      FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2) ps
    WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND ps_qty * 2 > (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
                        WHERE year(l2.l_shipdate) = 1996
                          AND l2.l_partkey = ps.l_partkey))
"""


def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers of one nation who were the SOLE late
    supplier on a finished multi-supplier order — the EXISTS +
    NOT-EXISTS double-correlation signature. EXISTS (another supplier
    on the order) becomes a LEFT SEMI self-join; NOT EXISTS (another
    LATE supplier) becomes a LEFT ANTI self-join, both equi on
    orderkey with the supplier-inequality as a residual condition.
    "Late" = shipped >60 days after the order date (no receipt/commit
    dates in this schema)."""
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_0")
    supp = load_table(spark, sf_dir, "supplier")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name")
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.join(F.broadcast(supp_n), late.l_suppkey == F.col("s_suppkey"))
    others = li.select(
        F.col("l_orderkey").alias("lo2"), F.col("l_suppkey").alias("ls2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("lo3"), F.col("l_suppkey").alias("ls3")
    )
    waiting = l1.join(
        others,
        (l1.l_orderkey == F.col("lo2")) & (l1.l_suppkey != F.col("ls2")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("lo3")) & (F.col("l_suppkey") != F.col("ls3")),
        "left_anti",
    )
    return (
        waiting.groupBy("s_name")
        .agg(bcount().alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


_Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_0'
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def tpcds_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-style year-over-year growth: revenue per (market
    segment, order year) with each year's growth ratio vs the
    segment's previous year — aggregate first (segment x year is a
    tiny frame), then the lag window runs on the aggregate, never on
    the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            "c_mktsegment", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("o_year")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "c_mktsegment",
        "o_year",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


_YOY_SQL = f"""
WITH rev AS (
  SELECT c_mktsegment,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2)
SELECT c_mktsegment, o_year, revenue,
       round((revenue - lag(revenue) OVER w) / lag(revenue) OVER w, 6)
         AS yoy_growth
FROM rev
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_year)
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpcds_yoy_growth": tpcds_yoy_growth,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_parts": tpch_q11_important_parts,
    "tpch_q13_order_distribution": tpch_q13_order_distribution,
    "tpch_q16_supplier_count": tpch_q16_supplier_count,
    "tpch_q17_small_quantity": tpch_q17_small_quantity,
    "tpch_q20_dominant_supplier": tpch_q20_dominant_supplier,
    "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
}

ORACLE = {
    "tpch_q2_min_cost_supplier": _Q2_SQL,
    "tpcds_yoy_growth": _YOY_SQL,
    "tpch_q6_forecast_revenue": _Q6_SQL,
    "tpch_q9_product_profit": _Q9_SQL,
    "tpch_q11_important_parts": _Q11_SQL,
    "tpch_q13_order_distribution": _Q13_SQL,
    "tpch_q16_supplier_count": _Q16_SQL,
    "tpch_q17_small_quantity": _Q17_SQL,
    "tpch_q20_dominant_supplier": _Q20_SQL,
    "tpch_q21_waiting_supplier": _Q21_SQL,
}
