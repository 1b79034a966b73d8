"""Assembles the driver contract: queries() and oracle_sql().

Each operator module exports ``QUERIES`` (query id -> callable taking
(spark, sf_dir) and returning a DataFrame) and ``ORACLE`` (query id ->
DuckDB SQL string). This module merges them and enforces that ids are
unique and every oracle key has a matching query (SURVEY.md §2 is the
normative inventory; R/S-tier operators legitimately omit the oracle).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "cortana_intelligence_customer360_spark.operators.scans",
    "cortana_intelligence_customer360_spark.operators.filters",
    "cortana_intelligence_customer360_spark.operators.joins",
    "cortana_intelligence_customer360_spark.operators.aggregates",
    "cortana_intelligence_customer360_spark.operators.windows",
    "cortana_intelligence_customer360_spark.operators.setops",
    "cortana_intelligence_customer360_spark.operators.quality",
    "cortana_intelligence_customer360_spark.operators.tpch",
    "cortana_intelligence_customer360_spark.functions.scalar",
    "cortana_intelligence_customer360_spark.functions.udfs",
    "cortana_intelligence_customer360_spark.features.core",
    "cortana_intelligence_customer360_spark.features.ml",
    "cortana_intelligence_customer360_spark.llmops.text",
    "cortana_intelligence_customer360_spark.llmops.dedup",
    "cortana_intelligence_customer360_spark.llmops.similarity",
    "cortana_intelligence_customer360_spark.llmops.multimodal",
    "cortana_intelligence_customer360_spark.streaming.ops",
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def build() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = import_module(modname)
        except ModuleNotFoundError as exc:
            # Module not built yet (incremental rounds); skip only if it
            # is the module itself that's missing, not its dependencies.
            if exc.name and modname.endswith(exc.name.rsplit(".", 1)[-1]):
                continue
            raise
        for qid, fn in getattr(mod, "QUERIES", {}).items():
            if qid in queries:
                raise ValueError(f"duplicate query id {qid!r} in {modname}")
            queries[qid] = fn
        for qid, sql in getattr(mod, "ORACLE", {}).items():
            if qid in oracle:
                raise ValueError(f"duplicate oracle id {qid!r} in {modname}")
            oracle[qid] = sql
    missing = set(oracle) - set(queries)
    if missing:
        raise ValueError(f"oracle entries without queries: {sorted(missing)}")
    return queries, oracle
