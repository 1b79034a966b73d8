"""Logical-plan rewrite: ``ORDER BY cosine DESC LIMIT k`` → IVF probe
(SURVEY.md §4 stretch goal).

A user writes the naive nearest-neighbor query — score every corpus
vector against one probe, sort by cosine, keep k. Declaratively that is

    GlobalLimit k
    +- LocalLimit k
       +- Sort [cosine DESC, neighbor_id ASC]
          +- Project [... round(aggregate(zip_with(probe_vec, embedding,
                       ...)), 6) AS cosine]
             +- Filter NOT (vec_id = <probe>)
                +- corpus × broadcast(Filter (vec_id = <probe>))

which Catalyst executes as a full corpus scan + global top-k: correct,
but O(corpus) per probe. ``rewrite_knn`` pattern-matches exactly that
analyzed-plan shape and substitutes the IVF probe path over a pre-built
index (rank the broadcast centroid table, scan only the ``nprobe``
nearest inverted lists, exact-re-rank the candidates), preserving the
output schema, ordering and rounding. A plan that doesn't match is
returned UNCHANGED — the rewrite is opt-out-safe by construction.

This is the pragmatic PySpark form of a Catalyst extension rule: the
match runs over ``queryExecution().analyzed().toString()`` (structural
anchors: the limit pair, the sort keys, the zip_with dot-product, the
probe-id literal) instead of a JVM TreeNode rule, because a Python
process cannot register Scala rules without shipping a jar. Semantics:
on clustered corpora the substitute returns the SAME rows as the naive
plan (asserted in tests); on metric-uniform corpora it is the usual
IVF approximation (R-tier, like sim_ivf_ann).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHAPE_RE = re.compile(
    r"GlobalLimit (\d+)\n"
    r"\+- LocalLimit \1\n"
    r"\s+\+- Sort \[cosine#\d+ DESC NULLS LAST, neighbor_id#\d+L? ASC"
)
# The probe side's literal filter: `Filter (vec_id#.. = cast(3 as bigint))`
# (the `NOT (vec_id = ..)` self-exclusion spells `Filter NOT (`, so this
# pattern cannot match it).
_PROBE_RE = re.compile(r"Filter \(vec_id#\d+L? = (?:cast\()?(\d+)")


def knn_orderby_frame(emb: DataFrame, probe_id: int = 0, k: int = 5) -> DataFrame:
    """The naive user query rewrite_knn targets: score the whole corpus
    against one probe vector, ORDER BY cosine DESC LIMIT k."""
    from ..llmops.similarity import _dot

    probe = emb.where(F.col("vec_id") == probe_id).select(
        F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(probe))
        .where(F.col("vec_id") != probe_id)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("probe_vec"), F.col("embedding")), 6).alias(
                "cosine"
            ),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)


def rewrite_knn(
    df: DataFrame,
    indexed: DataFrame,
    centroids: DataFrame,
    nprobe: int = 3,
) -> DataFrame:
    """If ``df``'s analyzed plan is the naive ORDER BY cosine LIMIT k
    shape, return the equivalent IVF probe plan over (indexed,
    centroids); otherwise return ``df`` unchanged (identity — callers
    can test ``rewritten is df``). k and the probe id are extracted
    from the matched plan, so the substitute answers the SAME query."""
    from ..llmops.similarity import _dot

    plan = df._jdf.queryExecution().analyzed().toString()
    shape = _SHAPE_RE.match(plan)
    if not shape or "aggregate(zip_with(" not in plan:
        return df
    probe_m = _PROBE_RE.search(plan)
    if not probe_m:
        return df
    k = int(shape.group(1))
    probe_id = int(probe_m.group(1))

    probe = indexed.where(F.col("vec_id") == probe_id).select(
        F.col("embedding").alias("probe_vec")
    )
    # Rank the (tiny, broadcast) centroid table against the probe and
    # keep the nprobe nearest cells; only those inverted lists — the
    # partition column of the persisted index — are then scanned.
    probe_cells = (
        probe.crossJoin(F.broadcast(centroids))
        .select(
            "probe_vec",
            "cell",
            _dot(F.col("probe_vec"), F.col("centroid")).alias("cdot"),
        )
        .orderBy(F.col("cdot").desc(), F.col("cell"))
        .limit(nprobe)
    )
    cand = indexed.join(
        F.broadcast(probe_cells.select("probe_vec", "cell")), "cell"
    ).where(F.col("vec_id") != probe_id)
    scored = cand.select(
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("probe_vec"), F.col("embedding")), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)
