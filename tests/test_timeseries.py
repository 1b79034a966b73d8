"""Semantic tests for the time-series operators (hand-computed minis +
invariants), beyond the automatic oracle parity in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.operators.timeseries import (
    ts_gap_fill,
    ts_resample_ohlc,
    ts_rolling_zscore,
)


def test_ohlc_invariants(spark, sf_dir):
    out = ts_resample_ohlc(spark, sf_dir)
    bad = out.where(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
    )
    assert bad.count() == 0
    # single-event buckets: open == close == high == low
    single = out.where(F.col("n_events") == 1).where(
        (F.col("open") != F.col("close")) | (F.col("high") != F.col("low"))
    )
    assert single.count() == 0


def test_gap_fill_spine_is_dense_and_filled(spark, sf_dir):
    out = ts_gap_fill(spark, sf_dir).cache()
    # dense spine: per user, row count == h1 - h0 + 1, hours consecutive
    span = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.max("hour_idx") - F.min("hour_idx") + 1).alias("expect"),
    )
    assert span.where(F.col("n") != F.col("expect")).count() == 0
    # forward fill: after the first observed hour no null remains, and
    # non-gap rows carry their own observed value
    w_nulls = out.where(F.col("value_ffill").isNull() & (F.col("is_gap") == 0))
    assert w_nulls.count() == 0
    out.unpersist()


def test_gap_fill_tiny_handcomputed(spark):
    # user 1: hours B+10, B+13 observed -> spine B+10..B+13 with gaps
    # gap-filled. Mimic the real events layout: ts at rest is a raw
    # INT64 of nanos (load_table normalizes to µs TimestampType on
    # read). Use a 2024-era base like the real data: ns/µs magnitude
    # discrimination (tables.raw_ts_to_timestamp) is only defined for
    # realistic epochs, not 1970-adjacent toys.
    base_s = 1_704_067_200  # 2024-01-01 00:00:00 UTC
    B = base_s // 3600
    ev = spark.createDataFrame(
        [
            (1, (base_s + 10 * 3600) * 1_000_000_000, 1, "click", 5.0, "{}"),
            (2, (base_s + 13 * 3600) * 1_000_000_000, 1, "view", 7.0, "{}"),
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # write a miniature events table and point the operator at it
        ev.write.parquet(f"{d}/events.parquet")
        rows = {
            r["hour_idx"]: (r["value_ffill"], r["is_gap"])
            for r in ts_gap_fill(spark, d).collect()
        }
    assert rows == {
        B + 10: (5.0, 0),
        B + 11: (5.0, 1),
        B + 12: (5.0, 1),
        B + 13: (7.0, 0),
    }


def test_zscore_windows_are_full_and_flag_consistent(spark, sf_dir):
    out = ts_rolling_zscore(spark, sf_dir).cache()
    n = out.count()
    if n:  # sf0.001 has ~60+ events/user, windows exist
        assert (
            out.where(
                (F.abs(F.col("zscore")) > 2.0) != (F.col("is_anomaly") == 1)
            ).count()
            == 0
        )
        # z-score of a value equal to the rolling mean is 0
        assert out.where(F.col("roll_std") <= 0).count() == 0
    out.unpersist()
