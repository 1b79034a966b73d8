"""Physical-plan introspection helpers (SURVEY.md §4, §5.3 item 6).

The optimizer is Catalyst's job, but the *shape* of the chosen plan is
part of this engine's contract at scale: a scan must show pushed
filters and a pruned ReadSchema, a small-dim join must be a
BroadcastHashJoin, aggregates must have a partial_ (map-side) phase.
Tests assert on these strings so a regression that silently changes a
plan shape (e.g. a broadcast turning into a 100 TB shuffle) fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> None:
    plan = plan_string(df, mode)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in physical plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> None:
    plan = plan_string(df, mode)
    for needle in needles:
        assert needle not in plan, f"did NOT expect {needle!r} in physical plan:\n{plan}"
