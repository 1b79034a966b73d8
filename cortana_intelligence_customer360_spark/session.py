"""SparkSession factory tuned for this engine.

Local testing runs on local[N] (single JVM); the configs below are the
ones that also matter on a real cluster at 100 TB:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  sort-merge->broadcast conversion replace hand-tuned partition counts.
- Arrow on: every JVM<->Python crossing (pandas_udf, applyInPandas,
  toPandas) moves columnar batches, not pickled rows.
- UTC session timezone: the data is UTC; keeps window()/date_trunc
  bucket edges identical between Spark and the DuckDB oracle.
- shuffle.partitions sized to cores locally; on a cluster AQE coalesces
  from a deliberately-high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "c360-spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, then os.cpu_count().
    ``driver_memory`` only takes effect if the JVM is not yet started.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    if driver_memory:
        builder = builder.config("spark.driver.memory", driver_memory)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
