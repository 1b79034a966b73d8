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


def test_mg_sketch_on_empty_stream():
    import pandas as pd

    from cortana_intelligence_customer360_spark.llmops.text import _mg_sketch

    out = pd.concat(list(_mg_sketch(iter([pd.DataFrame({"word": []})]))))
    assert len(out) == 0 and list(out.columns) == ["word"]


def test_codecs_reject_empty_payloads():
    import pytest as _pytest

    from cortana_intelligence_customer360_spark.llmops.codecs import (
        decode_png_meta,
        decode_wav_meta,
    )

    with _pytest.raises(ValueError):
        decode_png_meta(b"")
    with _pytest.raises(ValueError):
        decode_wav_meta(b"")


def test_pagerank_on_empty_edge_graph(spark):
    """No edges -> no nodes -> empty result with the right schema, not
    a crash in the fixpoint loop."""
    from unittest import mock

    from cortana_intelligence_customer360_spark.operators import graph

    empty_li = spark.createDataFrame([], "l_orderkey long, l_suppkey long")
    empty_orders = spark.createDataFrame([], "o_orderkey long, o_custkey long")

    def fake_load(spark_, sf_dir_, name):
        return {"lineitem": empty_li, "orders": empty_orders}[name]

    with mock.patch.object(graph, "load_table", fake_load):
        out = graph.graph_pagerank(spark, "unused")
        assert out.columns == ["node", "rank"]
        assert out.count() == 0


def test_funnel_without_purchases_caps_depth(spark):
    from unittest import mock

    from cortana_intelligence_customer360_spark.features import core as fc

    ev = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 7, "view", 1.0, ""),
            (2, "2024-01-02 00:10:00", 7, "click", 1.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    with mock.patch.object(fc, "load_table", lambda s, d, n: ev):
        rows = fc.feat_funnel_conversion(spark, "unused").collect()
    assert len(rows) == 1
    assert rows[0]["depth"] == 2 and rows[0]["t_purchase"] is None


def test_spatial_ops_empty_at_sparse_density(spark, sf_dir):
    """sf0.001's 150 points scatter too sparsely for any pair or
    triangle: both ops must return EMPTY with the right schema, not
    fail."""
    from cortana_intelligence_customer360_spark.operators import spatial

    pairs = spatial.join_spatial_grid(spark, sf_dir)
    assert pairs.columns == ["pid_a", "pid_b", "dist2"]
    assert pairs.count() == 0
    tri = spatial.graph_triangle_count(spark, sf_dir)
    assert tri.columns == ["node", "n_triangles"]
    assert tri.count() == 0


def test_markov_single_event_users_drop_out(spark):
    """A user with one event has no transition: the pair frame must be
    empty, not a null-prev row."""
    from cortana_intelligence_customer360_spark.features.core import (
        feat_markov_transitions,
    )
    import tempfile

    ev = spark.createDataFrame(
        [
            (1, 1_704_067_200_000_000_000, 7, "click", 1.0, "{}"),
            (2, 1_704_067_300_000_000_000, 8, "view", 1.0, "{}"),
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        assert feat_markov_transitions(spark, d).count() == 0


def test_error_burst_none_below_threshold(spark):
    """Two consecutive errors (below the >=3 floor) must yield no
    burst."""
    from cortana_intelligence_customer360_spark.operators.windows import (
        win_error_burst,
    )
    import tempfile

    base = 1_704_067_200
    rows = [
        (i, (base + i * 60) * 1_000_000_000, 1, t, 1.0, "{}")
        for i, t in enumerate(["error", "error", "click", "error"])
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        assert win_error_burst(spark, d).count() == 0


def test_round3_ops_on_single_event(spark, tmp_path):
    """Degenerate one-event universe: every round-3 event operator must
    return sane output (not crash, not divide by zero) when a user has
    a single purchase and nothing else."""
    import datetime as dt

    from cortana_intelligence_customer360_spark.features.attribution import (
        feat_attribution_touch,
        feat_audience_overlap,
        feat_behavior_entropy,
        feat_churn_label,
        feat_time_to_convert,
        win_session_bounce,
    )
    from cortana_intelligence_customer360_spark.operators.timeseries import (
        ts_anomaly_mad,
        ts_autocorr_lag1,
        ts_changepoint_split,
    )

    ev = spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 5), "purchase", 9.0, "{}")],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "one")
    ev.write.parquet(f"{d}/events.parquet")

    attr = feat_attribution_touch(spark, d).collect()
    assert [r["channel"] for r in attr] == ["direct"]

    churn = feat_churn_label(spark, d).collect()
    assert churn[0]["churned"] == 1 and churn[0]["n_obs"] == 1

    assert feat_audience_overlap(spark, d).count() == 0  # no pairs
    assert feat_time_to_convert(spark, d).count() == 0  # no view

    ent = feat_behavior_entropy(spark, d).collect()[0]
    assert ent["entropy"] == 0.0 and ent["n_types"] == 1

    bounce = win_session_bounce(spark, d).collect()[0]
    assert bounce["n_sessions"] == 1 and bounce["bounce_rate"] == 1.0

    mad = ts_anomaly_mad(spark, d).collect()[0]
    assert mad["mad"] == 0.0 and mad["n_anomalies"] == 0

    assert ts_changepoint_split(spark, d).count() == 0  # < 2*min_side

    acf = ts_autocorr_lag1(spark, d).collect()[0]
    assert acf["r1"] is None  # zero denominator -> null, not error
