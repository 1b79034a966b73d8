"""Scale-utility proofs: salting preserves join semantics while
spreading keys; bucketed tables join with zero exchanges (the plan
shape that amortizes fact-to-fact shuffles at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.plans.asserts import plan_string
from cortana_intelligence_customer360_spark.plans.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from cortana_intelligence_customer360_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders,
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        key="o_custkey",
        salt_buckets=8,
        unique_col="o_orderkey",
    )
    assert salted.count() == plain.count()
    assert salted.select(F.sum("o_orderkey")).first()[0] == plain.select(
        F.sum("o_orderkey")
    ).first()[0]


def test_salt_actually_spreads_keys(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    salted = orders.withColumn(
        "_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(8)).cast("int")
    )
    per_key = (
        salted.groupBy("o_custkey")
        .agg(F.countDistinct("_salt").alias("n_salts"), F.count("*").alias("n"))
        .where(F.col("n") >= 8)
    )
    rows = per_key.collect()
    if rows:  # keys with enough rows should hit several salt buckets
        assert sum(r["n_salts"] for r in rows) / len(rows) > 2


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    write_bucketed(orders, "t_orders_b", "o_custkey", n_buckets=8)
    write_bucketed(cust, "t_cust_b", "o_custkey", n_buckets=8)
    joined = bucketed_join(spark, "t_orders_b", "t_cust_b", "o_custkey")
    plan = plan_string(joined)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == orders.count()
