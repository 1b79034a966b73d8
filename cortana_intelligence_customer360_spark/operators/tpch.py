"""Composed TPC-H-shaped showcase queries (beyond the SURVEY §2
inventory): multi-join + aggregate + top-k pipelines exercising the
relational core end to end, with the same oracle discipline.

Q1/Q5/Q6 shapes already exist as agg_pricing_summary /
join_star_multiway / filter_conjunct; these add the Q3 (shipping
priority: join-filter-agg-topk) and Q10 (returned items: wide join +
revenue ranking) compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import bcount, dsum, dsum_sql, epoch_us
from ..sources.tables import load_table


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: revenue of undelivered orders for one segment, top 10
    by revenue. Filters push into all three scans before the joins."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
       o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned items in a quarter, ranked by
    lost revenue - the churn-risk report of the customer-360 world."""
    lo = F.lit("1995-10-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(revenue).alias("revenue"), bcount().alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1, 2, 3, 4, 5
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


QUERIES = {
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q10_returned_items": tpch_q10_returned_items,
}

ORACLE = {
    "tpch_q3_shipping_priority": _Q3_SQL,
    "tpch_q10_returned_items": _Q10_SQL,
}
