"""Projection / filter / predicate operators (SURVEY.md §2.2).

Predicates are plain Column expressions so Catalyst can push them to
the scan, reorder them, and fold constants. The correlated-subquery
shape is hand-decorrelated into a window plan (one shuffle) - the same
rewrite Catalyst's RewriteCorrelatedScalarSubquery performs, but
explicit so the predicate can use exact decimal arithmetic for oracle
stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import epoch_us, _DEC
from ..sources.tables import load_table


def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net price per lineitem: computed column + key columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


_PROJECT_EXPR_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
"""


def filter_conjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 predicate shape: date band AND discount band AND
    quantity bound, all pushable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


_FILTER_CONJUNCT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE pattern on the part dimension."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_type").isin("ECONOMY", "PROMO") & F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_name", "p_type", "p_retailprice")


_FILTER_IN_LIKE_SQL = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part
WHERE p_type IN ('ECONOMY', 'PROMO') AND p_name LIKE '%widget%'
"""


def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NOT NULL + null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(
        F.col("c_acctbal").isNotNull()
        & F.col("c_mktsegment").eqNullSafe(F.lit("BUILDING"))
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


_FILTER_NULL_SAFE_SQL = """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment
FROM customer
WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT DISTINCT FROM 'BUILDING'
"""


def filter_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN-subquery as a left-semi join: orders of
    high-balance customers. Semi join never duplicates and never
    carries the right side's columns - the cheapest join shape."""
    orders = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    return orders.join(
        rich, orders.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


_FILTER_SUBQ_IN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""


def filter_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (lineitems above their part's average
    quantity), decorrelated into a single window pass.

    The predicate ``qty > avg(qty per part)`` is evaluated as
    ``qty * count > exact_sum`` so both engines compare identical
    doubles - a raw float AVG could flip rows that sit exactly on the
    average (compat rule 1)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    sum_qty = F.sum(F.col("l_quantity").cast(_DEC)).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w).cast("long")
    return (
        li.withColumn("_sum", sum_qty)
        .withColumn("_cnt", cnt)
        .where(F.col("l_quantity") * F.col("_cnt") > F.col("_sum"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


_FILTER_SUBQ_CORR_SQL = """
WITH w AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) OVER (PARTITION BY l_partkey) AS DOUBLE) AS _sum,
         CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS _cnt
  FROM lineitem)
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM w WHERE l_quantity * _cnt > _sum
"""


QUERIES = {
    "project_expr": project_expr,
    "filter_conjunct": filter_conjunct,
    "filter_in_like": filter_in_like,
    "filter_null_safe": filter_null_safe,
    "filter_subquery_in": filter_subquery_in,
    "filter_subquery_corr": filter_subquery_corr,
}

ORACLE = {
    "project_expr": _PROJECT_EXPR_SQL,
    "filter_conjunct": _FILTER_CONJUNCT_SQL,
    "filter_in_like": _FILTER_IN_LIKE_SQL,
    "filter_null_safe": _FILTER_NULL_SAFE_SQL,
    "filter_subquery_in": _FILTER_SUBQ_IN_SQL,
    "filter_subquery_corr": _FILTER_SUBQ_CORR_SQL,
}


def filter_subquery_df_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 SUBQUERY-EXPRESSION DataFrame APIs — df.scalar() as an
    uncorrelated scalar subquery and df.exists() as a correlated
    EXISTS (outer references marked with Column.outer()) — the pure-
    DataFrame forms of what filter_subquery_in/corr express in SQL:
    above-average-balance customers having at least one open order.
    The average is dsum/count (one IEEE division of exact operands) so
    the threshold compare is bit-identical in both engines; Catalyst
    plans the exists as a left-semi join, same as the SQL form."""
    from ..compat import bcount, dsum

    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cu.agg(
        (dsum("c_acctbal") / bcount().cast("double")).alias("a")
    )
    open_orders = orders.where(
        (F.col("o_custkey") == F.col("c_custkey").outer())
        & (F.col("o_orderstatus") == "O")
    )
    return (
        cu.where(
            (F.col("c_acctbal") > avg_bal.scalar()) & open_orders.exists()
        )
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )


_FILTER_SUBQ_DF_SQL = """
SELECT c_custkey, c_acctbal, c_mktsegment
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)
                   FROM customer)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""

QUERIES["filter_subquery_df_api"] = filter_subquery_df_api
ORACLE["filter_subquery_df_api"] = _FILTER_SUBQ_DF_SQL
