"""Empty-input robustness: operators must return their schema (and
sane zero rows), not crash, when a source or filter yields nothing -
the situation every incremental pipeline hits on a quiet partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.features.core import (
    profile_frame,
    sessionized,
)
from cortana_intelligence_customer360_spark.operators.aggregates import event_type_pivot
from cortana_intelligence_customer360_spark.operators.joins import asof_enrich
from cortana_intelligence_customer360_spark.sources.tables import load_table


def _empty_events(spark):
    return spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_pivot_on_empty_events(spark):
    out = event_type_pivot(_empty_events(spark))
    assert out.count() == 0
    assert out.columns == ["user_id", "n_click", "n_error", "n_purchase", "n_signup", "n_view"]


def test_sessionize_on_empty_events(spark):
    assert sessionized(_empty_events(spark)).count() == 0


def test_asof_on_empty_orders(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(5)
    empty_orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = asof_enrich(events, empty_orders).collect()
    assert len(out) == 5
    assert all(r["asof_orderkey"] is None for r in out)


def test_profile_join_without_events_keeps_spine(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    prof = profile_frame(customer, orders, _empty_events(spark), nation)
    assert prof.count() == customer.count()
    assert prof.where(F.col("n_click") != 0).count() == 0
