"""Structured Streaming operators (SURVEY.md §2.10).

Each registered query runs a REAL streaming job: parquet file source ->
incremental plan -> availableNow trigger (drain everything, then stop)
-> memory/parquet sink, and returns the sink contents as the result
DataFrame. Where the drained result is deterministic (tumbling/sliding/
session windows, dedup, stateful counts, foreachBatch upsert) it
carries a full DuckDB oracle - streaming MUST agree with batch. The
watermark/late-data operator is S-tier: its result depends on
micro-batch boundaries, so the registered form is a smoke and the
multi-batch semantics are pinned in tests/test_streaming.py.

This mirrors the reference's ingest path (Event Hub -> Stream Analytics
hourly archival; SURVEY.md §3.1 [UPSTREAM, recalled]) as
readStream -> windowed agg -> sink. At scale the state store is
per-key-partition (RocksDB-backed on a real cluster) and watermarks
bound it; nothing here accumulates unbounded driver state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compat import dsum, dsum_sql
from ..operators.scans import _EVENTS_RAW_SCHEMA, scratch_dir
from ..sources.tables import ensure_session_confs

_SEQ = [0]


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming view of the events table with the same ts normalization
    as the batch loader (ns long -> µs timestamp)."""
    ensure_session_confs(spark)
    raw = spark.readStream.schema(_EVENTS_RAW_SCHEMA).parquet(f"{sf_dir}/events.parque[t]")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def _drain_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Run one availableNow pass into a uniquely-named memory sink and
    return the sink table."""
    _SEQ[0] += 1
    name = f"c360_stream_{_SEQ[0]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows x event_type (the reference's hourly
    archival shape). Epoch-aligned buckets match DuckDB time_bucket."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        dsum("value").alias("sum_value"),
    )
    out = agg.select(
        F.unix_micros(F.col("window.start")).cast("long").alias("win_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )
    return _drain_to_memory(out, "complete")


_TUMBLING_SQL = f"""
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4
    overlapping windows)."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour", "15 minutes")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    out = agg.select(
        F.unix_micros(F.col("window.start")).cast("long").alias("win_start_us"),
        F.unix_micros(F.col("window.end")).cast("long").alias("win_end_us"),
        "n_events",
    )
    return _drain_to_memory(out, "complete")


# An event at t belongs to the 4 sliding windows starting at
# bucket15(t) - k*15min, k=0..3 (those with start <= t < start+1h).
_SLIDING_SQL = """
WITH expanded AS (
  SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts)) - k.k * 900000000 AS win_start_us
  FROM events, (SELECT UNNEST(range(4)) AS k) k)
SELECT win_start_us, win_start_us + 3600000000 AS win_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM expanded GROUP BY 1
"""


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) per user: Spark merges
    events whose [t, t+30m) intervals overlap, so a gap of exactly
    30 minutes starts a NEW session; session end = last event + gap."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    out = agg.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).cast("long").alias("sess_start_us"),
        F.unix_micros(F.col("session_window.end")).cast("long").alias("sess_end_us"),
        "n_events",
    )
    return _drain_to_memory(out, "complete")


_SESSION_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events),
flagged AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER w IS NULL
                OR t - LAG(t) OVER w >= 1800000000 THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
numbered AS (
  SELECT user_id, t,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id,
       CAST(MIN(t) AS BIGINT) AS sess_start_us,
       CAST(MAX(t) + 1800000000 AS BIGINT) AS sess_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, sid
"""


def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute watermark + tumbling agg in append mode. S-tier: what
    reaches the sink depends on micro-batch boundaries (append emits
    only windows whose end <= final watermark), so the registered form
    is a smoke; tests/test_streaming.py pins the late-drop accounting
    across explicit multi-file micro-batches."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    out = agg.select(
        F.unix_micros(F.col("window.start")).cast("long").alias("win_start_us"),
        "event_type",
        "n_events",
    )
    return _drain_to_memory(out, "append")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup within the watermark: the stream is unioned with
    itself (every event arrives twice) and
    dropDuplicatesWithinWatermark must emit each event_id exactly
    once - verified by the full oracle (distinct event ids)."""
    a = _events_stream(spark, sf_dir)
    b = _events_stream(spark, sf_dir)
    doubled = a.unionByName(b).withWatermark("ts", "10 minutes")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"]).select("event_id")
    return _drain_to_memory(deduped, "append")


_DEDUP_SQL = "SELECT event_id FROM events"

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_STATE_STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _count_state_fn(key, pdf_iter, state):
    """applyInPandasWithState update: running per-user event count."""
    total = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        total += len(pdf)
    state.update((total,))
    import pandas as pd

    yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})


def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-state streaming operator: per-user running counts via
    applyInPandasWithState (state lives in the state store, keyed and
    partitioned - the custom-operator escape hatch). Under availableNow
    on one source pass the final update equals the batch count, so it
    carries a full oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = _events_stream(spark, sf_dir)
    counted = ev.groupBy("user_id").applyInPandasWithState(
        _count_state_fn,
        outputStructType=_STATE_SCHEMA,
        stateStructType=_STATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain_to_memory(counted, "update")


_STATEFUL_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins the
    customer dim in-flight (the dim is re-read per micro-batch, so a
    slowly-changing dimension stays fresh), then aggregates revenue-
    weighted activity per market segment. Deterministic -> full oracle."""
    from ..sources.tables import load_table

    ev = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id")
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        dsum("value").alias("sum_value"),
    )
    return _drain_to_memory(agg, "complete")


_STREAM_STATIC_SQL = f"""
SELECT c_mktsegment, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert into a parquet profile sink (the reference's
    SQL-DW bulk-upsert shape): each micro-batch's per-user aggregates
    are merged with the existing sink state (read-union-reaggregate,
    the storage-agnostic merge; a Delta/Iceberg MERGE INTO replaces
    this on a real lakehouse)."""
    sink = scratch_dir("stream_foreachbatch_sink", sf_dir)
    ev = _events_stream(spark, sf_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        try:
            existing = spark_l.read.parquet(sink)
        except Exception:
            existing = None
        if existing is not None:
            agg = (
                existing.unionByName(agg)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.round(F.sum("sum_value"), 6).alias("sum_value"),
                )
            )
        agg.write.mode("overwrite").parquet(sink + ".tmp")
        spark_l.read.parquet(sink + ".tmp").write.mode("overwrite").parquet(sink)

    import shutil

    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(sink + ".tmp", ignore_errors=True)
    q = ev.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(sink)


_FOREACHBATCH_SQL = f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events GROUP BY user_id
"""


QUERIES = {
    "stream_tumbling": stream_tumbling,
    "stream_sliding": stream_sliding,
    "stream_session_window": stream_session_window,
    "stream_watermark_late": stream_watermark_late,
    "stream_dedup": stream_dedup,
    "stream_stateful_count": stream_stateful_count,
    "stream_static_join": stream_static_join,
    "stream_foreachbatch_sink": stream_foreachbatch_sink,
}

ORACLE = {
    "stream_tumbling": _TUMBLING_SQL,
    "stream_sliding": _SLIDING_SQL,
    "stream_session_window": _SESSION_SQL,
    # stream_watermark_late: S-tier (batch-boundary dependent).
    "stream_dedup": _DEDUP_SQL,
    "stream_stateful_count": _STATEFUL_SQL,
    "stream_static_join": _STREAM_STATIC_SQL,
    "stream_foreachbatch_sink": _FOREACHBATCH_SQL,
}
