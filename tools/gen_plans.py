"""Capture formatted physical plans for representative queries into
PLANS.md with the scale-relevant features annotated, so plan quality is
reviewable without a Spark session. Run: python tools/gen_plans.py"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cortana_intelligence_customer360_spark import registry  # noqa: E402
from cortana_intelligence_customer360_spark.plans.asserts import plan_string  # noqa: E402
from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

SHOWCASE = {
    "scan_project_pushdown": "Filters reach the parquet reader (PushedFilters) and "
    "ReadSchema carries only the 3 projected columns.",
    "join_star_multiway": "Dims broadcast; only the two fact tables exchange; "
    "aggregation is partial (map-side) before the final shuffle.",
    "feat_profile_join": "Both fact tables collapse to per-customer rows BEFORE "
    "joining the customer spine (aggregate-then-join); nation broadcast.",
    "join_asof": "Union-merge as-of join: single hashpartitioning exchange on the "
    "user key; the window carries the last order forward - no expanding join.",
    "agg_pricing_summary": "Whole-stage codegen over scan->filter->partial "
    "agg; exchange moves pre-aggregated group states only.",
    "win_topk_per_group": "Rank-filter compiles to WindowGroupLimit: per-group "
    "top-k pushed below the full window sort.",
    "tpch_q8_market_share": "Seven-table snowflake: every dim resolves to a "
    "BroadcastHashJoin; only lineitem-orders-customer exchange.",
    "tpch_q19_disjunctive": "The part-only residue of the cross-table "
    "disjunction still pushes to the part scan; part broadcasts.",
    "merge_upsert": "MERGE dataflow: one key-shuffle outer join base<->changes, "
    "then a union with the insert projection - no second shuffle.",
    "scd2_history": "Both window passes share one hashpartitioning exchange on "
    "custkey (same partition spec reused).",
    "join_spatial_grid": "Grid-binned proximity join: 9-cell explode is "
    "map-side; both sides exchange ONLY on the cell id (equi join, never "
    "BroadcastNestedLoop); the exact integer dist² refine is a post-join "
    "filter inside codegen.",
    "join_asof_nearest": "Dual-direction union-merge: ONE hashpartitioning "
    "exchange on user_id feeds two opposite-order sorts; no join operator "
    "in the plan at all.",
    "cdc_apply_log": "Last-writer-wins window and the full outer join share "
    "the same key partitioning; the apply is one shuffle per side.",
    "text_pii_redact": "Pure whole-stage-codegen scan->project: zero "
    "Exchange, zero Python - regex count+redact rides the JVM.",
    "feat_attribution_touch": "One user-keyed window pass feeds a single "
    "channel aggregate through the unpivot — no aggregate-vs-aggregate join.",
    "agg_pareto_revenue": "Distributed global ranking: RangePartitioning "
    "exchange + per-partition windows + broadcast offset table — never a "
    "single-partition global window.",
    "sample_reservoir_per_group": "rank<=k rides WindowGroupLimit: per-"
    "partition top-k BEFORE the 5-key exchange.",
    "sort_zorder": "Morton layout key in pure bit arithmetic; the query form "
    "is TakeOrderedAndProject, never a full sort.",
    "stream_attribution": "applyInPandasWithState over the user-keyed state "
    "store; one string of state per user.",
    "pipeline_corpus_curation": "Four curation gates compose into one plan: "
    "map-side quality/lang verdicts, one md5 aggregate for exact-dup, and "
    "the broadcast canonical table - the doc stream shuffles once.",
    "graph_modularity": "Scores from ONE materialized edge list + the "
    "checkpointed LPA labels (r7 fix): zero parquet scans in the final "
    "plan, labels broadcast twice onto the checkpointed edges.",
    "fn_protobuf_roundtrip": "Codec is map-only: scan -> mapInPandas with "
    "no hash/range exchange (the only Exchange ever allowed is the "
    "adaptive local round-robin split when input splits < cores).",
    "join_lateral_df_api": "The correlated limit-2 lateral subquery "
    "decorrelates into a rank window with WindowGroupLimit pushed below "
    "the o_custkey exchange (Partial+Final) — never a per-row "
    "re-execution or nested loop; the customer side broadcasts.",
    "ts_dtw_profiles": "Custom-operator shape: one hash aggregate to "
    "24-point profiles, a broadcast pair join, then applyInPandas over "
    "pairs — the O(L²) DP parallelizes across the P² pair groups, with "
    "no driver-side loop.",
    "sim_filtered_knn": "The label predicate is a JOIN conjunct, not a "
    "post-filter: candidate pruning happens inside the BroadcastHashJoin "
    "before any dot product is evaluated.",
    "ts_ses_grid": "The month series is aggregated once and "
    "localCheckpointed; the recursion (UnionLoop) joins the 80-row "
    "in-memory frame per level, 4 months per level with broadcast "
    "hints — the framework's ~0.15 s/level scheduling floor is the "
    "cost, not data movement.",
    "ps_merge_rolling": "pandas-API round-trip compiles to native "
    "Catalyst: the merge is a hash join of two partial-aggregated "
    "month frames and rolling(3) is a ROWS BETWEEN window — no "
    "driver-side pandas, no Python in the plan.",
    "ps_resample_monthly": "resample('ME') compiles to a Union of the "
    "month-binned daily aggregate with a calendar-cardinality filler "
    "LocalRelation feeding one HashAggregate — JVM-side end to end, "
    "no Python evaluation node.",
}


def main() -> None:
    spark = get_spark(app_name="c360-plans")
    queries, _ = registry.build()
    lines = [
        "# PLANS — physical-plan snapshots (sf0.01, local[32])",
        "",
        "Generated by tools/gen_plans.py; the features called out per plan",
        "are the ones tests/test_plans.py pins against regression.",
        "",
    ]
    for qid, note in SHOWCASE.items():
        plan = plan_string(queries[qid](spark, SF), "formatted")
        # keep the operator tree; drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        lines += [f"## {qid}", "", note, "", "```", tree, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
