"""pandas-on-Spark API surface (SURVEY.md §2.12, round 8).

``pyspark.pandas`` is the third query dialect Spark ships (DataFrame,
SQL, pandas API) and the one a pandas-native data scientist reaches
for first; an engine claiming the full PySpark surface needs it
exercised end-to-end. The op round-trips Spark -> pandas-on-Spark ->
(assign / groupby / agg / sort) -> Spark, all of which compiles to the
same Catalyst plans as the native API — no driver-side pandas, no
collect.

Exactness note: pandas-on-Spark sums of doubles inherit Spark's
partition-order nondeterminism, so the money column is converted to
exact integer CENTS before entering the pandas API; the int64 sums
are exact and the final dollars division is one deterministic IEEE op
(ml_logreg_newton's integer-pinning discipline applied to an API
surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def ps_groupby_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A representative pandas-API pipeline over orders: derive cents,
    filter, groupby priority with a multi-agg dict, flatten, sort —
    then hand back a Spark frame. Every step stays lazy/distributed
    (checked in tests: the result plan has the same one-exchange
    hash-aggregate shape as the native groupBy)."""
    import pyspark.pandas as ps  # noqa: F401 (import gates the surface)

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pdf = od.pandas_api()
    pdf = pdf[pdf["cents"] > 0]
    pdf = pdf.assign(big=(pdf["cents"] > 20_000_000).astype("int64"))
    agg = (
        pdf.groupby("o_orderpriority")
        .agg({"cents": "sum", "o_orderkey": "count", "big": "sum"})
        .reset_index()
    )
    out = agg.to_spark()
    return out.select(
        "o_orderpriority",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.col("o_orderkey").cast("long").alias("n_orders"),
        F.col("big").cast("long").alias("n_big"),
    )


_PS_SQL = """
SELECT o_orderpriority,
       CAST(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (
         WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 20000000)
         AS BIGINT) AS n_big
FROM orders
WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
GROUP BY o_orderpriority
"""

QUERIES["ps_groupby_pipeline"] = ps_groupby_pipeline
ORACLE["ps_groupby_pipeline"] = _PS_SQL
