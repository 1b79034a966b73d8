"""User-facing API: the replacement surface for the reference stack.

A user of the reference solution ran HiveQL/Spark-SQL scripts over
blob-backed tables (ADF -> HDInsight) and consumed one wide profile
table downstream. The equivalents here:

    from cortana_intelligence_customer360_spark import api

    spark = api.get_spark()                  # tuned session
    api.open_catalog(spark, sf_dir)          # all tables as views
    spark.sql("SELECT ... FROM orders JOIN customer ...")   # any SQL

    api.customer_profile(spark, sf_dir)      # the enriched 360 table
    api.run("agg_pricing_summary", spark, sf_dir)  # any named operator

Every named operator from the registry is also reachable by id, so the
full SURVEY §2 surface is one call away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import registry
from .features.core import feat_profile_join
from .session import get_spark  # noqa: F401  (re-export)
from .sources.tables import TABLES, ensure_session_confs, load_table


def open_catalog(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every catalog table as a temp view named
    ``{prefix}{table}`` and return the view names. After this, the
    entire engine surface is plain ``spark.sql``."""
    ensure_session_confs(spark)
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship enriched Customer-360 profile (one wide row per
    customer) - the table the reference served to Power BI."""
    return feat_profile_join(spark, sf_dir)


def run(query_id: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run any registered operator by its SURVEY §2 id."""
    queries, _ = registry.build()
    try:
        fn = queries[query_id]
    except KeyError:
        raise KeyError(
            f"unknown query id {query_id!r}; known ids: {sorted(queries)}"
        ) from None
    return fn(spark, sf_dir)


def query_ids() -> list[str]:
    return sorted(registry.build()[0])
