"""BFS correctness properties on the real trade graph: triangle
inequality over edges (no edge may skip a BFS level) and seed/frontier
invariants. Oracle parity (exact hop counts vs DuckDB's recursive CTE)
is automatic in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.operators.graph import (
    _BFS_MAX_HOPS,
    _edges,
    graph_bfs_hops,
)


def test_bfs_level_property(spark, sf_dir):
    dist = graph_bfs_hops(spark, sf_dir).cache()
    # seeds are exactly the hops=0 rows and carry customer keys < 10
    seeds = dist.where(F.col("hops") == 0)
    assert seeds.count() > 0
    assert seeds.where(F.col("node") >= 10).count() == 0
    assert dist.where(F.col("hops") > _BFS_MAX_HOPS).count() == 0
    # BFS property: for any edge (u, v) with both endpoints labeled,
    # |hops(u) - hops(v)| <= 1 (an edge can never skip a level)
    e = _edges(spark, sf_dir)
    du = dist.select(F.col("node").alias("src"), F.col("hops").alias("hu"))
    dv = dist.select(F.col("node").alias("dst"), F.col("hops").alias("hv"))
    labeled = e.join(du, "src").join(dv, "dst")
    violations = labeled.where(F.abs(F.col("hu") - F.col("hv")) > 1)
    assert violations.count() == 0
    # every non-seed labeled node has a predecessor one level closer
    nonseed = dist.where(F.col("hops") > 0)
    pred = (
        nonseed.join(e, nonseed.node == e.dst)
        .join(
            dist.select(F.col("node").alias("src"), F.col("hops").alias("hp")),
            "src",
        )
        .where(F.col("hp") == F.col("hops") - 1)
        .select("node")
        .distinct()
    )
    assert pred.count() == nonseed.count()
    dist.unpersist()
