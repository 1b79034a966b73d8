"""Graph analytics over the supplier<->customer trade graph: PageRank
(fixed-iteration, cross-engine bit-deterministic) and a deterministic
hash sampler for reproducible pipeline subsetting.

PageRank determinism across engines is the interesting part: the
per-node rank sum over incoming edges is order-dependent in doubles,
so each edge contribution is quantized to DECIMAL(38,12) before the
sum (exact, order-independent, ~5e-13 quantization error per edge so
rank mass stays conserved to ~1e-6) and the total cast back to double —
the same discipline ``compat.dsum`` applies to revenue sums, applied
per iteration. At 100 TB the edge list is partitioned on src once and
never moves again; each iteration shuffles only the node-cardinality
rank table (to the edges' partitioning, then by destination key for
the rank aggregation) — both orders of magnitude below an edge-list
shuffle.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount, dsum, dsum_sql
from ..sources.tables import load_table

_DAMPING = 0.85
_ITERS = 5
_SUPP_OFFSET = 1_000_000  # supplier node ids, disjoint from custkeys
_DEC = "decimal(38,12)"


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier<->customer trade edges (symmetric: one edge
    each way), node ids in one space via the supplier offset."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("s"),
            F.col("o_custkey").alias("c"),
        )
        .distinct()
    )
    return pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).union(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five damped PageRank iterations over the trade graph, returning
    (node, rank rounded to 9 dp). Every float step is either a single
    IEEE op on identical operands in both engines or an exact decimal
    sum, so the oracle hash-matches bit-for-bit."""
    # Materialize the DEGREE-WEIGHTED edge list ONCE, hash-partitioned
    # on src: out-degree is static across iterations, so folding it in
    # up front saves a join per iteration, and the persisted
    # InMemoryRelation keeps its HashPartitioning(src) so every
    # iteration's rank join streams the edges in place — the edge list
    # (the 100 TB side) never re-shuffles. persist(), not
    # localCheckpoint(): a checkpoint's LogicalRDD drops the output
    # partitioning, which would re-Exchange the edges per iteration.
    edges = _weighted_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.agg(bcount().alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", "n", (F.lit(1.0) / F.col("n").cast("double")).alias("rank")
    )
    for _ in range(_ITERS):
        ranks = _pagerank_step(edges, ranks).localCheckpoint()
    edges.unpersist()
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degree-weighted edge list, hash-partitioned on src and
    persisted (materialized eagerly). Caller owns unpersist()."""
    raw = _edges(spark, sf_dir)
    deg = raw.groupBy("src").agg(bcount().alias("outdeg"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = (
        raw.join(deg, "src")
        .repartition(n_parts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    return edges


def _pagerank_step(edges: DataFrame, ranks: DataFrame) -> DataFrame:
    """One damped iteration. Shuffle budget per iteration: the
    node-cardinality rank table moves to the edges' src partitioning
    (shuffle-hash join — no sort of the edge list), and the groupBy(dst)
    that IS the rank aggregation. Never a broadcast: at 10^8–10^9 nodes
    a rank table is tens of GB, past any broadcast limit, while a
    node-table shuffle is orders of magnitude below the edge shuffle
    this shape avoids."""
    contrib = edges.join(
        ranks.select(F.col("node").alias("src"), "rank").hint("shuffle_hash"),
        "src",
    ).select(
        "dst",
        (F.col("rank") / F.col("outdeg").cast("double")).cast(_DEC).alias("q"),
    )
    summed = contrib.groupBy("dst").agg(F.sum("q").cast("double").alias("acc"))
    return (
        ranks.select("node", "n")
        .join(summed, F.col("node") == summed.dst, "left")
        .select(
            "node",
            "n",
            (
                (1.0 - _DAMPING) / F.col("n").cast("double")
                + F.lit(_DAMPING) * F.coalesce("acc", F.lit(0.0))
            ).alias("rank"),
        )
    )


def _pagerank_sql() -> str:
    """Unrolled-iteration oracle (DuckDB disallows aggregates in the
    recursive term of a recursive CTE, and the iteration count is fixed
    anyway). Mirrors the Spark math op for op, including the DECIMAL
    quantization of edge contributions."""
    base = f"""
pairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, n, 1.0 / CAST(n AS DOUBLE) AS rank FROM nodes, nn)"""
    steps = []
    for i in range(_ITERS):
        steps.append(f"""
s{i} AS (
  SELECT e.dst, r.n,
         CAST(SUM(CAST(r.rank / CAST(d.outdeg AS DOUBLE) AS DECIMAL(38,12)))
              AS DOUBLE) AS acc
  FROM edges e
  JOIN r{i} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY 1, 2),
r{i + 1} AS (
  SELECT r.node, r.n,
         (1.0 - {_DAMPING}) / CAST(r.n AS DOUBLE)
           + {_DAMPING} * COALESCE(s.acc, 0.0) AS rank
  FROM r{i} r LEFT JOIN s{i} s ON r.node = s.dst)""")
    return (
        "WITH "
        + ",".join([base] + steps)
        + f"\nSELECT node, round(rank, 9) AS rank FROM r{_ITERS}"
    )


def sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample of orders: keep rows whose md5(key)
    prefix falls below the threshold. Unlike TABLESAMPLE/rand(), the
    selection is a pure function of the key — reproducible across
    engines, runs, partitionings, and retries, which is what a
    training-data pipeline needs from a sampler. Map-only: no shuffle,
    prunes at scan speed."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return orders.where(bucket % 100 < 10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_SAMPLE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
"""


def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE seeded Bernoulli sampler (df.sample) — the
    TABLESAMPLE surface users reach for first. R-tier by nature: the
    selection depends on Spark's XORShift stream per partition, so no
    cross-engine oracle exists (the driver records a rows-only check);
    tests pin (a) run-to-run determinism under a fixed seed and input
    layout and (b) the sampling fraction within binomial bounds. For
    engine-independent reproducibility use sample_hash_pct instead —
    that distinction is the point of registering both."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# Per-stratum keep-rates (permille) for the stratified sampler: the
# class-rebalancing shape of a training-data pipeline — downsample the
# abundant strata hard, keep the rare/valuable ones whole.
_STRATA_PERMILLE = {
    "view": 50,
    "click": 100,
    "error": 200,
    "signup": 500,
    "purchase": 1000,
}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling of events: each stratum
    (event_type) keeps its own md5-threshold fraction of rows. Like
    sample_hash_pct, selection is a pure function of the key — stable
    across engines, runs, partitionings, retries — but the rate varies
    per stratum. Map-only (the rate lookup folds to a literal CASE):
    no shuffle, prunes at scan speed."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 1000
    rate = F.coalesce(
        *[
            F.when(F.col("event_type") == et, F.lit(pm))
            for et, pm in _STRATA_PERMILLE.items()
        ],
        F.lit(0),
    )
    return ev.where(bucket < rate).select(
        "event_id", "user_id", "event_type", "value"
    )


_STRATIFIED_SQL = f"""
SELECT event_id, user_id, event_type, value
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 1000
      < CASE event_type
          {' '.join(f"WHEN '{et}' THEN {pm}" for et, pm in _STRATA_PERMILLE.items())}
          ELSE 0 END
"""


_BFS_MAX_HOPS = 4


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: minimum hop count from the seed set (customer
    nodes with key < 10) to every node reachable within 4 hops over
    the symmetric trade graph — the reachability/shortest-path
    primitive (fraud rings, influence radius). Frontier-based: each
    round joins ONLY the newly-reached frontier against the edge list
    (never the full visited set), so per-round work shrinks as the
    frontier saturates; level-order expansion guarantees first
    discovery = minimum hops, no min() re-aggregation needed. The
    per-round localCheckpoint keeps the plan depth constant (the same
    discipline as graph_pagerank's iterations)."""
    edges = _edges(spark, sf_dir).localCheckpoint()
    seeds = (
        edges.where(F.col("src") < 10)
        .select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(0).cast("long").alias("hops"))
    )
    dist = seeds.localCheckpoint()
    frontier = dist.select("node")
    for d in range(1, _BFS_MAX_HOPS + 1):
        # the frontier (and visited set) are node-cardinality —
        # broadcast both so the edge list never shuffles during
        # expansion; only the distinct() on newly-reached nodes does.
        reached = (
            edges.join(F.broadcast(frontier), frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new_frontier = reached.join(
            F.broadcast(dist.select("node")), "node", "left_anti"
        )
        new_rows = new_frontier.select(
            "node", F.lit(d).cast("long").alias("hops")
        ).localCheckpoint()
        dist = dist.union(new_rows).localCheckpoint()
        frontier = new_rows.select("node")
    return dist


def _bfs_sql() -> str:
    """DuckDB recursive-CTE twin. UNION (not UNION ALL) dedups the
    (node, d) working set, so the recursion is bounded by nodes x
    depth instead of path-enumeration blowup; MIN(d) collapses to the
    BFS distance."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
seeds AS (SELECT DISTINCT src AS node FROM edges WHERE src < 10),
r(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, r.d + 1
  FROM r JOIN edges e ON e.src = r.node
  WHERE r.d < {_BFS_MAX_HOPS})
SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM r GROUP BY node
"""


def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (Spark 4 recursive CTE support) walking a
    synthetic customer hierarchy — parent(k) = k DIV 10, roots are keys
    < 10 — to each row's depth and root ancestor. Both engines run a
    structurally identical recursive query; per-iteration work is one
    equi-computation over the frontier, ≤5 levels at any tested SF
    (and O(log10 maxkey) generally, so the recursion depth stays flat
    at 100 TB key ranges)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
WITH RECURSIVE walk(custkey, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer_rcte
  UNION ALL
  SELECT custkey, node DIV 10, depth + 1 FROM walk WHERE node >= 10)
SELECT custkey,
       CAST(MAX(depth) AS BIGINT) AS depth,
       CAST(MIN(node) AS BIGINT) AS root
FROM walk GROUP BY custkey
"""
    )


_RCTE_SQL = """
WITH RECURSIVE walk(custkey, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT custkey, node // 10, depth + 1 FROM walk WHERE node >= 10)
SELECT custkey,
       CAST(MAX(depth) AS BIGINT) AS depth,
       CAST(MIN(node) AS BIGINT) AS root
FROM walk GROUP BY custkey
"""


_RESERVOIR_K = 5


def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (k=5) uniform sample per event_type — the
    deterministic equivalent of a per-group reservoir: rank rows by
    md5(event_id) (a uniform permutation that is a pure function of
    the key) and keep the k smallest per group. Reproducible across
    engines, runs, partitionings, and retries, unlike an actual
    stateful reservoir. Scale shape: Spark's WindowGroupLimit rewrite
    pushes the rank<=k cut to a per-partition top-k BEFORE the
    exchange, so the 5-key shuffle moves only k rows per group per
    input partition, never the events table (plan-tested)."""
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _RESERVOIR_K)
        .select("event_type", "rank", "event_id", "user_id", "value")
    )


_RESERVOIR_SQL = f"""
SELECT event_type,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY md5(CAST(event_id AS VARCHAR)),
                                        event_id) AS BIGINT) AS rank,
       event_id, user_id, value
FROM events
QUALIFY rank <= {_RESERVOIR_K}
"""


# Link prediction over the part co-purchase graph. Every node keeps
# only its _CN_ADJ_CAP STRONGEST neighbors (edge weight = number of
# shared orders, tiebreak by neighbor key) — strength-ranked adjacency
# truncation, the standard way to bound Σ deg² wedge volume on
# co-occurrence graphs. The truncation rule is deterministic and
# mirrored bit-for-bit in the oracle, so the compare stays exact even
# where the cap binds (it does: natural degree here is ~90).
_CN_ADJ_CAP = 24
_CN_TOPK = 50


def _copurchase_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected weighted part–part edges (pa < pb), weight =
    co-purchase order count. The per-order pair fan-out is bounded by
    basket width (~4), so this grows linearly with the fact table."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(bcount().alias("w"))
    )


def _truncated_adjacency(und: DataFrame) -> DataFrame:
    """Mutual top-k adjacency: each node ranks its neighbors by edge
    strength (weight desc, neighbor key tiebreak) and an edge survives
    only if BOTH endpoints keep it in their top ``_CN_ADJ_CAP`` — the
    standard mutual-kNN sparsification. Symmetric by construction, so
    in-degree == out-degree <= cap and every wedge/degree invariant
    (n_common <= min deg, jaccard <= 1) holds exactly."""
    sym = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).union(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
    wr = Window.partitionBy("src").orderBy(
        F.col("w").desc(), F.col("dst").asc()
    )
    kept = (
        sym.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= _CN_ADJ_CAP)
        .select("src", "dst")
    )
    rev = kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return kept.join(rev, ["src", "dst"], "left_semi")


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction: the top non-adjacent part pairs
    ranked by how many co-purchase partners they share (plus the
    Jaccard overlap of their truncated neighborhoods) — "these two
    parts are never bought together but live in the same baskets", the
    classic second-order recommender signal.

    Shape at scale: wedges come from ONE self-join of the truncated
    symmetric edge list on the middle vertex — both sides share the
    src partitioning, so a pre-partitioned edge table makes it
    co-located — and the adjacency cap bounds the wedge count at
    nodes·cap² regardless of how skewed the raw degree distribution
    is. Adjacent pairs leave via one anti-join; the final top-k is
    driver-bounded."""
    # Materialize und (the lineitem self-join) and the truncated
    # adjacency ONCE: und feeds both the adjacency and the anti-join,
    # and e feeds the degree table plus BOTH wedge sides — without the
    # checkpoints the co-purchase join replays up to 4x (the
    # graph_modularity lesson, r7).
    und = _copurchase_und(spark, sf_dir).localCheckpoint(eager=False)
    e = _truncated_adjacency(und).localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(bcount().alias("deg"))
    wedges = (
        e.select(F.col("src").alias("m"), F.col("dst").alias("a"))
        .join(
            e.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .where(F.col("a") < F.col("b"))
    )
    cn = wedges.groupBy("a", "b").agg(bcount().alias("n_common"))
    # Non-adjacency is tested against the FULL graph: an edge truncated
    # out of an adjacency list is still a real co-purchase.
    nonadj = cn.join(
        und.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        nonadj.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "n_common",
            "deg_a",
            "deg_b",
            F.round(
                F.col("n_common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("n_common").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(_CN_TOPK)


_COMMON_NEIGHBORS_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
sym AS (
  SELECT pa AS src, pb AS dst, w FROM und
  UNION ALL SELECT pb AS src, pa AS dst, w FROM und),
kept AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY w DESC, dst ASC) AS rk
    FROM sym)
  WHERE rk <= {_CN_ADJ_CAP}),
e AS (
  SELECT k.src, k.dst FROM kept k
  WHERE EXISTS (SELECT 1 FROM kept r
                WHERE r.src = k.dst AND r.dst = k.src)),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
cn AS (
  SELECT x.dst AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2),
nonadj AS (
  SELECT cn.* FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM und
                    WHERE und.pa = cn.a AND und.pb = cn.b))
SELECT a, b, n_common, da.deg AS deg_a, db.deg AS deg_b,
       round(n_common / (da.deg + db.deg - n_common), 6) AS jaccard
FROM nonadj
JOIN deg da ON da.src = nonadj.a
JOIN deg db ON db.src = nonadj.b
ORDER BY n_common DESC, a ASC, b ASC
LIMIT {_CN_TOPK}
"""


_LPA_ITERS = 3
# argmax encoding: label that maximizes (count, then smallest label).
# count < 1e7 (degree bound), label < 1e7 → key = count*1e7 - label is
# an exact int64 total order both engines agree on.
_LPA_KEY = 10_000_000


def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation (Raghavan
    et al. 2007), 3 fixed rounds over the trade graph: every node
    starts as its own label; each round it adopts its neighbors'
    majority label, ties broken by smallest label — the deterministic
    tie rule that makes fixed-round LPA fully oracle-able (classic LPA
    breaks ties randomly and is R-tier by construction).

    Scale posture: identical to PageRank's — the edge list is
    materialized once, hash-partitioned on src, and each round
    shuffles only the node-cardinality label table (join to edges on
    src, count per (dst, label) with map-side combine, argmax per
    dst). Rounds are a fixed constant, so the lineage stays bounded
    (localCheckpoint per round like the BFS frontier)."""
    edges = _edges(spark, sf_dir).localCheckpoint()
    return _label_prop_rounds(edges)


def _label_prop_rounds(edges: DataFrame) -> DataFrame:
    """The LPA rounds over an already-materialized (localCheckpointed)
    edge frame — split out so graph_modularity can share ONE edge
    materialization between propagation and scoring instead of
    replaying the lineitem⋈orders edge derivation per consumer."""
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(_LPA_ITERS):
        counts = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"), "label")
            .agg(bcount().alias("cnt"))
        )
        labels = counts.groupBy(F.col("node2").alias("node")).agg(
            F.max_by(
                "label", F.col("cnt") * _LPA_KEY - F.col("label")
            ).alias("label")
        ).localCheckpoint()
    return labels.select("node", F.col("label").cast("long").alias("label"))


def _lpa_sql() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ITERS + 1):
        rounds.append(
            f"""c{i} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS cnt
  FROM edges e JOIN {prev} l ON l.node = e.src GROUP BY 1, 2),
l{i} AS (
  SELECT node, arg_max(label, cnt * {_LPA_KEY} - label) AS label
  FROM c{i} GROUP BY node)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH pairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
l0 AS (SELECT node, node AS label FROM nodes),
{chain}
SELECT node, CAST(label AS BIGINT) AS label FROM {prev}
"""


QUERIES = {
    "graph_label_prop": graph_label_prop,
    "graph_common_neighbors": graph_common_neighbors,
    "sql_recursive_cte": sql_recursive_cte,
    "sample_reservoir_per_group": sample_reservoir_per_group,
    "graph_pagerank": graph_pagerank,
    "graph_bfs_hops": graph_bfs_hops,
    "sample_hash_pct": sample_hash_pct,
    "sample_stratified": sample_stratified,
    # R-tier: native seeded sampler has no cross-engine oracle.
    "sample_bernoulli_seeded": sample_bernoulli_seeded,
}
ORACLE = {
    "graph_label_prop": _lpa_sql(),
    "graph_common_neighbors": _COMMON_NEIGHBORS_SQL,
    "sql_recursive_cte": _RCTE_SQL,
    "sample_reservoir_per_group": _RESERVOIR_SQL,
    "graph_pagerank": _pagerank_sql(),
    "graph_bfs_hops": _bfs_sql(),
    "sample_hash_pct": _SAMPLE_SQL,
    "sample_stratified": _STRATIFIED_SQL,
}


# ---------------------------------------------------------------------------
# k-core decomposition (round 4): iterative degree peeling.

_KCORE_K = 8
_KCORE_ROUNDS = 8


def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes of the k-core (k=8) of the trade graph: repeatedly delete
    nodes with degree < k until fixpoint, output surviving nodes with
    their in-core degree.

    Fixed peeling rounds (8 — measured fixpoint at every tested SF;
    semantics are "8 peeling rounds", identical in the oracle, so the
    result is well-defined even pre-convergence). Each round is one
    degree aggregate over the surviving edge list plus two semi-joins
    against the keep set; the keep set is node-cardinality so it
    broadcasts (same discipline as graph_bfs_hops' frontier — at a
    node count beyond broadcast reach, drop the hint and the same plan
    runs as a shuffle-hash join). localCheckpoint per round keeps the
    plan depth constant. The edge list only ever shrinks, so per-round
    cost is monotonically decreasing — the peeling loop is strictly
    cheaper than pagerank's fixed-size iterations."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    prev_n = edges.count()
    for _ in range(_KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(bcount().alias("deg"))
            .where(F.col("deg") >= _KCORE_K)
            .select("src")
        ).localCheckpoint(eager=False)
        # ^ both broadcast builds below consume keep; checkpointing it
        # runs the degree aggregate once per round instead of twice
        # (guide §2.4), halving the dominant per-round pass count.
        edges = (
            edges.join(F.broadcast(keep), "src")
            .join(
                F.broadcast(keep.select(F.col("src").alias("dst"))),
                "dst",
            )
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n = edges.count()  # forces the checkpoint; also the fixpoint probe
        if n == prev_n:
            # Peeling only deletes: an unchanged edge COUNT means an
            # unchanged edge SET, so every remaining round is a no-op —
            # breaking here is bit-identical to running all 8 rounds
            # (the oracle runs them; idempotence makes the results
            # equal) and saves the dominant cost at scale, where k=8
            # stabilizes after 2-3 rounds.
            break
        prev_n = n
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(bcount().alias("core_degree"))
    )


def _kcore_sql() -> str:
    parts = [
        f"""
pairs AS MATERIALIZED (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e0 AS MATERIALIZED (SELECT s AS src, c AS dst FROM pairs
       UNION ALL SELECT c, s FROM pairs)"""
    ]
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"""
k{i} AS MATERIALIZED (SELECT src FROM e{i - 1} GROUP BY src
         HAVING COUNT(*) >= {_KCORE_K}),
e{i} AS MATERIALIZED (SELECT t.src, t.dst FROM e{i - 1} t
         WHERE t.src IN (SELECT src FROM k{i})
           AND t.dst IN (SELECT src FROM k{i}))"""
        )
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e{_KCORE_ROUNDS} GROUP BY src
"""


# ---------------------------------------------------------------------------
# Weighted shortest paths (round 4): Bellman-Ford relaxation rounds.

_SSSP_ROUNDS = 4


def graph_shortest_path_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path distances (<= 4 relaxation rounds) from
    the seed customers (key < 10) over the trade graph, edge cost =
    greatest(1, 6 - n_trades): strong relationships (many distinct
    orders between the pair) are cheap to traverse — the supply-chain
    "effort distance" query.

    Bellman-Ford as level-synchronous relaxation: each round joins the
    CURRENT distance table (node-cardinality) to the edge list and
    re-aggregates min(dist) per node — no path enumeration, integer
    distances throughout (exact, order-independent min), so the result
    hash-matches the unrolled-SQL twin bit-for-bit. Edge list computed
    once; rounds shuffle only node-cardinality frames (the pagerank
    shape). 4 rounds = distances over paths of <= 4 hops, documented
    semantics in both engines (the graph's diameter from the seed set
    at tested SFs is smaller)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("s"),
            F.col("o_custkey").alias("c"),
        )
        .agg(F.count_distinct("l_orderkey").alias("n_trades"))
        .select(
            "s",
            "c",
            F.greatest(F.lit(1), F.lit(6) - F.col("n_trades")).cast("long").alias("w"),
        )
    )
    edges = (
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
        .union(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w"))
        .localCheckpoint()
    )
    dist = (
        edges.where(F.col("src") < 10)
        .select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(0).cast("long").alias("dist"))
        .localCheckpoint()
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            edges.join(F.broadcast(dist), dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint()
        )
    return dist


def _sssp_sql() -> str:
    parts = [
        f"""
pairs AS (
  SELECT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c,
         COUNT(DISTINCT l_orderkey) AS n_trades
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
edges AS (
  SELECT s AS src, c AS dst,
         CAST(greatest(1, 6 - n_trades) AS BIGINT) AS w FROM pairs
  UNION ALL
  SELECT c, s, CAST(greatest(1, 6 - n_trades) AS BIGINT) FROM pairs),
d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
       FROM edges WHERE src < 10)"""
    ]
    for i in range(1, _SSSP_ROUNDS + 1):
        parts.append(
            f"""
d{i} AS (
  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.w AS dist
    FROM d{i - 1} p JOIN edges e ON e.src = p.node)
  GROUP BY node)"""
        )
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT node, dist FROM d{_SSSP_ROUNDS}
"""


QUERIES["graph_k_core"] = graph_k_core
QUERIES["graph_shortest_path_weighted"] = graph_shortest_path_weighted
ORACLE["graph_k_core"] = _kcore_sql()
ORACLE["graph_shortest_path_weighted"] = _sssp_sql()


# ---------------------------------------------------------------------------
# HITS hubs & authorities (round 4): the directed complement of
# pagerank on the supplier -> customer trade graph (suppliers are
# hubs, customers authorities).

_HITS_ITERS = 3
_HITS_DEC = "decimal(38,12)"


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three HITS iterations with L1 normalization: authority(c) =
    sum of hub scores over in-edges, hub(s) = sum of authority scores
    over out-edges, each vector rescaled to sum 1 after every step.

    Exactness discipline (the pagerank contract): every per-node sum
    is over 12-dp DECIMAL-quantized contributions (order-independent),
    each normalization is one IEEE division by an exact decimal total,
    and the result is re-quantized before the next step — so both
    engines walk identical numeric states. Scale: the edge list is
    computed once; every iteration shuffles only node-cardinality
    score tables (broadcast joins, same shape as graph_bfs_hops)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("s"),
            F.col("o_custkey").alias("c"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    hubs = (
        edges.select("s")
        .distinct()
        .select("s", F.lit(1.0).cast(_HITS_DEC).alias("h"))
        .localCheckpoint(eager=False)
    )
    auths = None
    for _ in range(_HITS_ITERS):
        # localCheckpoint the raw-score table: atot's broadcast job and
        # the normalized-score projection BOTH consume araw, so without
        # it the edges>(broadcast hubs) aggregate ran twice per
        # iteration (guide §2.4 — the graph_adamic_adar class of bug,
        # 2 duplicate edge-cardinality passes per HITS iteration).
        araw = (
            edges.join(F.broadcast(hubs), "s")
            .groupBy("c")
            .agg(F.sum("h").alias("a_raw"))
        ).localCheckpoint(eager=False)
        atot = araw.groupBy().agg(F.sum("a_raw").alias("a_tot"))
        auths = (
            araw.join(F.broadcast(atot))
            .select(
                "c",
                (
                    F.col("a_raw").cast("double") / F.col("a_tot").cast("double")
                )
                .cast(_HITS_DEC)
                .alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        hraw = (
            edges.join(F.broadcast(auths), "c")
            .groupBy("s")
            .agg(F.sum("a").alias("h_raw"))
        ).localCheckpoint(eager=False)
        htot = hraw.groupBy().agg(F.sum("h_raw").alias("h_tot"))
        hubs = (
            hraw.join(F.broadcast(htot))
            .select(
                "s",
                (
                    F.col("h_raw").cast("double") / F.col("h_tot").cast("double")
                )
                .cast(_HITS_DEC)
                .alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    out_h = hubs.select(
        F.col("s").alias("node"),
        F.lit("hub").alias("role"),
        # round in the DECIMAL domain: the quantized scores hit exact
        # half-ties at 9 dp and double-domain rounding diverges 1 ulp
        F.round(F.col("h"), 9).cast("double").alias("score"),
    )
    out_a = auths.select(
        F.col("c").alias("node"),
        F.lit("authority").alias("role"),
        F.round(F.col("a"), 9).cast("double").alias("score"),
    )
    return out_h.unionByName(out_a)


def _hits_sql() -> str:
    parts = [
        f"""
edges AS MATERIALIZED (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
h0 AS MATERIALIZED (
  SELECT DISTINCT s, CAST(1.0 AS DECIMAL(38,12)) AS h FROM edges)"""
    ]
    for i in range(1, _HITS_ITERS + 1):
        parts.append(
            f"""
araw{i} AS MATERIALIZED (
  SELECT c, SUM(h) AS a_raw
  FROM edges JOIN h{i - 1} USING (s) GROUP BY c),
a{i} AS MATERIALIZED (
  SELECT c, CAST(CAST(a_raw AS DOUBLE)
    / CAST((SELECT SUM(a_raw) FROM araw{i}) AS DOUBLE)
    AS DECIMAL(38,12)) AS a
  FROM araw{i}),
hraw{i} AS MATERIALIZED (
  SELECT s, SUM(a) AS h_raw
  FROM edges JOIN a{i} USING (c) GROUP BY s),
h{i} AS MATERIALIZED (
  SELECT s, CAST(CAST(h_raw AS DOUBLE)
    / CAST((SELECT SUM(h_raw) FROM hraw{i}) AS DOUBLE)
    AS DECIMAL(38,12)) AS h
  FROM hraw{i})"""
        )
    body = ",".join(parts)
    n = _HITS_ITERS
    return f"""
WITH {body}
SELECT s AS node, 'hub' AS role, CAST(round(h, 9) AS DOUBLE) AS score
FROM h{n}
UNION ALL
SELECT c, 'authority', CAST(round(a, 9) AS DOUBLE) FROM a{n}
"""


QUERIES["graph_hits"] = graph_hits
ORACLE["graph_hits"] = _hits_sql()


# ---------------------------------------------------------------------------
# Connected components (round 5): hash-min label propagation to exact
# FIXPOINT over the symmetric trade graph. Labels start at the node id
# and only ever DECREASE (monotone), so the fixpoint probe is the
# label sum: one O(1) scalar per round, and an unchanged sum proves an
# unchanged label SET. Per round the 100 TB edge list never moves —
# persisted hash-partitioned on src (pagerank's discipline), only the
# node-cardinality label table shuffles. Rounds needed = graph
# diameter; this trade graph's is small (dense bipartite). For a
# pathological high-diameter graph (long chains) the same contract
# would be served by the alternating large-star/small-star algorithm
# (Kiveris et al., "Connected Components in MapReduce and Beyond",
# SoCC'14) — pointer-doubling in O(log d) rounds; hash-min is chosen
# here because it is exact, simpler, and optimal on low-diameter
# graphs, which web-scale entity graphs overwhelmingly are.

_CC_MAX_ROUNDS = 20


def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, component, comp_size) where component = min node id
    reachable from the node — the canonical component label."""
    edges = _edges(spark, sf_dir).repartition(F.col("src")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges.count()
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(_CC_MAX_ROUNDS):
        prop = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "lbl")
        labels = (
            prop.unionByName(labels)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        s = labels.agg(F.sum("lbl")).collect()[0][0]
        if s == prev_sum:
            break
        prev_sum = s
    edges.unpersist()
    sizes = labels.groupBy("lbl").agg(bcount().alias("comp_size"))
    return labels.join(sizes, "lbl").select(
        "node", F.col("lbl").alias("component"), "comp_size"
    )


_CC_ORACLE_ROUNDS = 8  # >= measured fixpoint (2-4) with headroom;
# labels are monotone-decreasing so extra rounds are no-ops and the
# unrolled form equals the exact fixpoint the Spark side iterates to.


def _cc_sql() -> str:
    parts = [
        f"""
pairs AS MATERIALIZED (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS MATERIALIZED (SELECT s AS src, c AS dst FROM pairs
       UNION ALL SELECT c, s FROM pairs),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
    ]
    for i in range(1, _CC_ORACLE_ROUNDS + 1):
        parts.append(
            f"""
l{i} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT e.dst AS node, l.lbl FROM edges e JOIN l{i - 1} l ON l.node = e.src
    UNION ALL SELECT node, lbl FROM l{i - 1})
  GROUP BY node)"""
        )
    n = _CC_ORACLE_ROUNDS
    return f"""
WITH {",".join(parts)},
comp AS (SELECT node, lbl AS component FROM l{n}),
sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS comp_size
          FROM comp GROUP BY component)
SELECT node, component, comp_size
FROM comp JOIN sizes USING (component)
"""


QUERIES["graph_connected_components"] = graph_connected_components
ORACLE["graph_connected_components"] = _cc_sql()


# ---------------------------------------------------------------------------
# Modularity (round 5): Newman's Q for the communities
# graph_label_prop finds — the quality score that closes the loop on
# community detection (detect -> quantify). Per community c:
# contribution = e_c/(2m) - (d_c/(2m))^2 with e_c = within-community
# DIRECTED edge count and d_c = degree sum; Q = sum of contributions.
# Every operand is an exact integer count, so each contribution is the
# same two-IEEE-op expression in both engines; the (communities-sized)
# label table broadcasts onto the edge list twice — the 100 TB edge
# list never shuffles for the scoring pass.


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE edge materialization shared by the LPA rounds, the 2m count,
    # and the scoring join — previously _edges() (a lineitem⋈orders
    # distinct union) was recomputed three times, which is why r6's
    # bench read ~2x r5 on this id. The converged label frame is
    # already localCheckpointed by the last LPA round, so the two
    # broadcast scans + the sizes aggregate below never replay the
    # propagation either.
    edges = _edges(spark, sf_dir).localCheckpoint()
    labels = _label_prop_rounds(edges)
    two_m = edges.count()
    el = edges.join(
        F.broadcast(
            labels.select(F.col("node").alias("src"), F.col("label").alias("src_lbl"))
        ),
        "src",
    ).join(
        F.broadcast(
            labels.select(F.col("node").alias("dst"), F.col("label").alias("dst_lbl"))
        ),
        "dst",
    )
    per = el.groupBy(F.col("src_lbl").alias("label")).agg(
        F.sum((F.col("src_lbl") == F.col("dst_lbl")).cast("long"))
        .cast("long")
        .alias("within_edges"),
        bcount().alias("degree_sum"),
    )
    sizes = labels.groupBy("label").agg(bcount().alias("n_nodes"))
    e_frac = F.col("within_edges").cast("double") / F.lit(float(two_m))
    d_frac = F.col("degree_sum").cast("double") / F.lit(float(two_m))
    return per.join(sizes, "label").select(
        "label",
        "n_nodes",
        "within_edges",
        "degree_sum",
        F.round(e_frac - d_frac * d_frac, 9).alias("contribution"),
    )


def _modularity_sql() -> str:
    lpa = _lpa_sql().strip()
    assert lpa.startswith("WITH ")
    body = lpa[len("WITH "):]
    # reuse the full LPA chain; its final SELECT becomes the labels CTE
    chain, final_select = body.rsplit("SELECT node, CAST(label AS BIGINT)", 1)
    last = final_select.split("FROM ")[1].strip()
    return f"""
WITH {chain.rstrip().rstrip(',')},
labels AS (SELECT node, CAST(label AS BIGINT) AS label FROM {last}),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS two_m FROM edges),
el AS (
  SELECT ls.label AS label, ls.label = ld.label AS within
  FROM edges e
  JOIN labels ls ON ls.node = e.src
  JOIN labels ld ON ld.node = e.dst),
per AS (
  SELECT label,
         CAST(SUM(CAST(within AS BIGINT)) AS BIGINT) AS within_edges,
         CAST(COUNT(*) AS BIGINT) AS degree_sum
  FROM el GROUP BY label),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM labels GROUP BY label)
SELECT p.label, s.n_nodes, p.within_edges, p.degree_sum,
       round(CAST(p.within_edges AS DOUBLE) / m.two_m
             - (CAST(p.degree_sum AS DOUBLE) / m.two_m)
               * (CAST(p.degree_sum AS DOUBLE) / m.two_m), 9) AS contribution
FROM per p JOIN sizes s ON s.label = p.label, m
"""


QUERIES["graph_modularity"] = graph_modularity
ORACLE["graph_modularity"] = _modularity_sql()


# ---------------------------------------------------------------------------
# Deterministic DeepWalk sampling (round 5): one fixed-length random
# walk per node over the trade graph, with every neighbor choice a pure
# md5 function of (start, step, current node) — the sample_hash_pct
# reproducibility discipline applied to graph walks, so the corpus a
# node2vec/DeepWalk embedding trains on is identical across engines,
# runs, partitionings, and retries.

_WALK_LEN = 4


def graph_random_walk_deepwalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One _WALK_LEN-step deterministic random walk from EVERY node.

    At step t from node u the walk moves to the neighbor with 1-based
    index md5(start:t:u) % deg(u) + 1 in u's dst-sorted adjacency list.
    Symmetric edges guarantee deg >= 1, so walks never strand.

    Shape at scale: the adjacency list (row_number + count per src —
    one window shuffle on src, computed ONCE and persisted with its
    partitioning) is the only big table; each of the 4 steps joins the
    node-cardinality frontier to it on src, so the edge list never
    re-shuffles and the walk corpus streams out as
    nodes x (len+1) rows. No RNG state, no driver loop over nodes.
    """
    raw = _edges(spark, sf_dir)
    w = Window.partitionBy("src").orderBy("dst")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    adj = (
        raw.select(
            "src",
            "dst",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("src")).alias("deg"),
        )
        .repartition(n_parts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    cur = adj.select("src").distinct().select(
        F.col("src").alias("start"), F.col("src").alias("node")
    )
    steps = [
        cur.select("start", F.lit(0).cast("long").alias("step"), "node")
    ]
    for t in range(1, _WALK_LEN + 1):
        # The choice hash depends ONLY on the frontier row, so it is
        # computed on |nodes| rows BEFORE the join; the per-edge work in
        # the join is then a single integer mod/compare, not an md5 of
        # every candidate edge (30x cheaper measured at 10x scale).
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("start"), F.lit(t), F.col("node"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        cur2 = cur.withColumn("h", h)
        # Eager per-step checkpoint: without it each unioned step frame
        # re-executes the whole prefix of joins (O(L^2) work), and the
        # shuffle_hash hint keeps the persisted adjacency from being
        # re-SORTED per step (SMJ would sort the 100 TB side L times).
        cur = (
            cur2.hint("shuffle_hash")
            .join(adj, cur2.node == adj.src)
            .where(F.col("rn") == F.col("h") % F.col("deg") + 1)
            .select("start", F.col("dst").alias("node"))
            .localCheckpoint()
        )
        steps.append(
            cur.select("start", F.lit(t).cast("long").alias("step"), "node")
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    # Materialize eagerly (the corpus is nodes x (len+1), driver-small)
    # so the cached adjacency can be released before returning — the
    # parity sweep runs hundreds of queries in one session and leaked
    # cache entries add up.
    out = out.orderBy("start", "step").localCheckpoint()
    adj.unpersist()
    return out


def _walk_sql() -> str:
    base = f"""
WITH pairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) AS rn,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM edges),
w0 AS (SELECT DISTINCT src AS start, src AS node FROM edges)"""
    steps = []
    for t in range(1, _WALK_LEN + 1):
        steps.append(f"""
w{t} AS (
  SELECT w.start, a.dst AS node
  FROM w{t - 1} w
  JOIN adj a ON a.src = w.node
   AND a.rn = ('0x' || substr(md5(CAST(w.start AS VARCHAR) || ':{t}:'
                              || CAST(w.node AS VARCHAR)), 1, 8))::BIGINT
               % a.deg + 1)""")
    selects = " UNION ALL ".join(
        f"SELECT start, CAST({t} AS BIGINT) AS step, node FROM w{t}"
        for t in range(0, _WALK_LEN + 1)
    )
    return base + "," + ",".join(steps) + "\n" + selects


QUERIES["graph_random_walk_deepwalk"] = graph_random_walk_deepwalk
ORACLE["graph_random_walk_deepwalk"] = _walk_sql()


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the co-purchase graph: for
    non-adjacent part pairs, score = sum over common neighbors m of
    1/ln(deg(m)) — common-neighbor counting that discounts promiscuous
    hubs (Adamic & Adar 2003), the standard upgrade over raw counts.

    Shape: identical single self-join wedge plan as
    graph_common_neighbors (same mutual-top-k truncated adjacency, so
    wedge count is bounded by nodes*cap^2 under any skew); the only
    addition is the per-middle weight 1/ln(deg_m), a deterministic
    double joined in BEFORE the wedge groupBy so the score reduces
    with map-side partial aggregation. deg_m >= 2 for every wedge
    middle by construction (a wedge needs two distinct neighbors), so
    ln(deg_m) > 0 always. Scores go through DECIMAL per-term rounding
    (compat rule 1) to be order-free, and the top-k orders by the
    6 dp-rounded score with (a, b) tiebreak so the cut is
    deterministic in both engines.
    """
    # Same materialize-once discipline as graph_common_neighbors, BOTH
    # checkpoints: e feeds deg + both wedge sides, and und feeds the
    # adjacency AND the final non-adjacency anti-join — the previous
    # round checkpointed only e (its comment claimed und had a single
    # consumer), so the lineitem co-purchase self-join replayed once
    # per run for the anti-join side.
    und = _copurchase_und(spark, sf_dir).localCheckpoint(eager=False)
    e = _truncated_adjacency(und).localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(bcount().alias("deg"))
    # deg = 1 nodes can never be a wedge middle (a wedge needs two
    # distinct neighbors); filter BEFORE the 1/ln(deg) weight so ANSI
    # mode never evaluates a ln(1) = 0 divisor.
    ew = e.join(
        deg.where(F.col("deg") >= 2).select(
            "src", (1.0 / F.log(F.col("deg").cast("double"))).alias("aa")
        ),
        "src",
    )
    wedges = (
        ew.select(F.col("src").alias("m"), F.col("dst").alias("a"), "aa")
        .join(
            e.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .where(F.col("a") < F.col("b"))
    )
    scored = wedges.groupBy("a", "b").agg(
        bcount().alias("n_common"), F.round(dsum("aa"), 6).alias("aa_score")
    )
    nonadj = scored.join(
        und.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return nonadj.orderBy(
        F.col("aa_score").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(_CN_TOPK)


_ADAMIC_ADAR_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
sym AS (
  SELECT pa AS src, pb AS dst, w FROM und
  UNION ALL SELECT pb AS src, pa AS dst, w FROM und),
kept AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY w DESC, dst ASC) AS rk
    FROM sym)
  WHERE rk <= {_CN_ADJ_CAP}),
e AS (
  SELECT k.src, k.dst FROM kept k
  WHERE EXISTS (SELECT 1 FROM kept r
                WHERE r.src = k.dst AND r.dst = k.src)),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
wedges AS (
  SELECT x.dst AS a, y.dst AS b, 1.0 / ln(CAST(d.deg AS DOUBLE)) AS aa
  FROM e x
  JOIN e y ON x.src = y.src AND x.dst < y.dst
  JOIN deg d ON d.src = x.src),
scored AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common,
         round({dsum_sql('aa')}, 6) AS aa_score
  FROM wedges GROUP BY a, b),
nonadj AS (
  SELECT scored.* FROM scored
  WHERE NOT EXISTS (SELECT 1 FROM und
                    WHERE und.pa = scored.a AND und.pb = scored.b))
SELECT a, b, n_common, aa_score
FROM nonadj
ORDER BY aa_score DESC, a ASC, b ASC
LIMIT {_CN_TOPK}
"""

QUERIES["graph_adamic_adar"] = graph_adamic_adar
ORACLE["graph_adamic_adar"] = _ADAMIC_ADAR_SQL


_ARES_K = 50
# Efraimidis-Spirakis key with DETERMINISTIC pseudo-randomness: u from
# the md5 bucket (pure function of doc_id, reproducible across engines
# and retries), key = u^(1/w). Rounded to 12 dp so the pow() libm
# wiggle can't reorder the top-k cut; ties break on doc_id.
_ARES_KEY = (
    "round(pow((CAST(bkt AS DOUBLE) + 0.5) / 4294967296.0,"
    " 1.0 / CAST(w AS DOUBLE)), 12)"
)


def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-Res): select 50 documents with probability proportional to
    length (w = n_chars) by ranking on key = u^(1/w) — the
    quality/length-weighted corpus subsampling step of a training-data
    mix, made reproducible by deriving u from md5(doc_id) instead of a
    RNG (the sample_hash_pct discipline: survives retries,
    repartitioning, and engine changes).

    Shape: map-only key computation at scan speed, then one
    TakeOrderedAndProject top-k — no shuffle of the corpus, no sort of
    more than k rows per partition.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("bkt"),
    )
    keyed = docs.withColumn("ares_key", F.expr(_ARES_KEY))
    return (
        keyed.select("doc_id", "w", "ares_key")
        .orderBy(F.col("ares_key").desc(), F.col("doc_id").asc())
        .limit(_ARES_K)
    )


_ARES_SQL = f"""
WITH docs AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS bkt
  FROM documents)
SELECT doc_id, w, {_ARES_KEY} AS ares_key
FROM docs
ORDER BY ares_key DESC, doc_id ASC
LIMIT {_ARES_K}
"""

QUERIES["sample_weighted_ares"] = sample_weighted_ares
ORACLE["sample_weighted_ares"] = _ARES_SQL


# Degree assortativity: Pearson r over edge-endpoint degree pairs,
# shared closed-form text over DECIMAL-exact sums.
_ASSORT_R = (
    "((CAST(m AS DOUBLE) * sxy - sx * sy)"
    " / (sqrt(CAST(m AS DOUBLE) * sxx - sx * sx)"
    " * sqrt(CAST(m AS DOUBLE) * syy - sy * sy)))"
)


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the trade graph (Newman 2002): the
    Pearson correlation of (deg(src), deg(dst)) over all directed
    edges — do well-connected nodes attach to other hubs (r > 0,
    social) or to leaves (r < 0, hub-and-spoke)? The supplier<->customer
    bipartite trade graph should read strongly negative, pinned in
    tests.

    Shape: the degree table joins the edge list twice on its ends —
    both joins key on the src/dst hash partitioning the edge list
    already has — and everything reduces to six DECIMAL-exact sums
    feeding one shared closed-form expression. One row out.
    """
    # edges feeds the degree aggregate AND both ends of the pair join —
    # materialize once (the graph_modularity replay class, r7).
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(bcount().alias("deg"))
    paired = (
        edges.join(deg.select(F.col("src"), F.col("deg").alias("dx")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")),
            "dst",
        )
        .select(F.col("dx").cast("double").alias("x"), F.col("dy").cast("double").alias("y"))
    )
    suff = paired.agg(
        bcount().alias("m"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    return suff.select("m", F.round(F.expr(_ASSORT_R), 6).alias("assortativity"))


_ASSORT_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
paired AS (
  SELECT CAST(dx.deg AS DOUBLE) AS x, CAST(dy.deg AS DOUBLE) AS y
  FROM edges e
  JOIN deg dx ON e.src = dx.src
  JOIN deg dy ON e.dst = dy.src),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy,
         {dsum_sql('x * x')} AS sxx,
         {dsum_sql('y * y')} AS syy
  FROM paired)
SELECT m, round({_ASSORT_R}, 6) AS assortativity
FROM suff
"""

QUERIES["graph_degree_assortativity"] = graph_degree_assortativity
ORACLE["graph_degree_assortativity"] = _ASSORT_SQL


_PPR_SEEDS = 10
_PPR_ITERS = 5


def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: random walks RESTART at a seed set (the
    10 highest-degree customer nodes, deterministic tiebreak) instead
    of uniformly — 'importance relative to my best customers', the
    graph-recommendation primitive (PPR-based related-entity retrieval).

    Same fixed-iteration DECIMAL(38,12) contribution quantization and
    edges-never-reshuffle shape as graph_pagerank; the only change is
    the teleport vector: (1-d)*seed_mass(node) + d*incoming. Seeds get
    1/|S| mass, everyone else 0 — so rank mass stays conserved and the
    oracle unrolls identically.
    """
    edges = _weighted_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    deg = edges.groupBy("src").agg(F.max("outdeg").alias("deg"))
    ws = Window.orderBy(F.col("deg").desc(), F.col("src").asc())
    seeds = (
        deg.where(F.col("src") < _SUPP_OFFSET)  # customer nodes only
        .withColumn("rk", F.row_number().over(ws))
        .where(F.col("rk") <= _PPR_SEEDS)
        .select(F.col("src").alias("node"), F.lit(1.0 / _PPR_SEEDS).alias("seed"))
    )
    # base feeds EVERY iteration's teleport join; without the one-time
    # checkpoint each round re-ran the nodes distinct + degree pass +
    # seed window over the edge list (round 11, measured).
    base = (
        nodes.join(F.broadcast(seeds), "node", "left")
        .select("node", F.coalesce("seed", F.lit(0.0)).alias("seed"))
        .localCheckpoint()
    )
    ranks = base.select("node", "seed", F.col("seed").alias("rank"))
    for _ in range(_PPR_ITERS):
        contrib = edges.join(
            ranks.select(F.col("node").alias("src"), "rank").hint("shuffle_hash"),
            "src",
        ).select(
            "dst",
            (F.col("rank") / F.col("outdeg").cast("double")).cast(_DEC).alias("q"),
        )
        summed = contrib.groupBy("dst").agg(
            F.sum("q").cast("double").alias("acc")
        )
        ranks = (
            base.join(summed, F.col("node") == summed.dst, "left")
            .select(
                "node",
                "seed",
                (
                    (1.0 - _DAMPING) * F.col("seed")
                    + F.lit(_DAMPING) * F.coalesce("acc", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    edges.unpersist()
    return ranks.select("node", F.round("rank", 9).alias("ppr"))


def _ppr_sql() -> str:
    base = f"""
pairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
seeds AS (
  SELECT src AS node, 1.0 / {_PPR_SEEDS} AS seed FROM (
    SELECT src, ROW_NUMBER() OVER (ORDER BY outdeg DESC, src ASC) AS rk
    FROM deg WHERE src < {_SUPP_OFFSET})
  WHERE rk <= {_PPR_SEEDS}),
base AS (
  SELECT n.node, COALESCE(s.seed, 0.0) AS seed
  FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
r0 AS (SELECT node, seed, seed AS rank FROM base)"""
    steps = []
    for i in range(_PPR_ITERS):
        steps.append(f"""
s{i} AS (
  SELECT e.dst,
         CAST(SUM(CAST(r.rank / CAST(d.outdeg AS DOUBLE) AS DECIMAL(38,12)))
              AS DOUBLE) AS acc
  FROM edges e
  JOIN r{i} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY 1),
r{i + 1} AS (
  SELECT b.node, b.seed,
         (1.0 - {_DAMPING}) * b.seed
           + {_DAMPING} * COALESCE(s.acc, 0.0) AS rank
  FROM base b LEFT JOIN s{i} s ON b.node = s.dst)""")
    return (
        "WITH "
        + ",".join([base] + steps)
        + f"\nSELECT node, round(rank, 9) AS ppr FROM r{_PPR_ITERS}"
    )


QUERIES["graph_pagerank_personalized"] = graph_pagerank_personalized
ORACLE["graph_pagerank_personalized"] = _ppr_sql()


_CLOSE_MAX_HOPS = 4
_CLOSE_SEED_MAX = 5  # customer-node seeds: custkey < 5
# Frontier rows above which the BFS joins abandon broadcast for
# shuffle: ~20M (seed, node) pairs ≈ 320 MB serialized — the
# per-executor-memory cliff, NOT a performance crossover (measured at
# the 100x blow-up: broadcast 411 s vs shuffle 1001 s on a 7.5M-row
# frontier; see docstring).
_CLOSE_BCAST_CAP = 20_000_000
# The anti-join's `seen` side is dist — the CUMULATIVE union of all
# frontiers — so late in the walk it is the larger frame and both
# broadcasts coexist in the same stage. Gate it at half the frontier
# cap so dist stops broadcasting before the combined hash relations
# (frontier + dist) reach the executor-memory cliff (r9 ADVICE).
_CLOSE_DIST_BCAST_CAP = _CLOSE_BCAST_CAP // 2


def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic closeness centrality from a fixed seed set
    (customer nodes with key < 5): per-seed minimum-hop distances out
    to 4 hops via per-seed frontier BFS, then closeness = Σ 1/d over
    reached nodes — the centrality that stays defined on disconnected
    graphs (contrast graph_bfs_hops, which emits the merged hop MAP of
    the whole seed set; here each seed keeps its own distance field
    and collapses to one score row).

    Exactness: the per-distance reach counts n1..n4 are exact
    integers, and the harmonic score is one fixed-order expression
    over them (n1/1 + n2/2 + n3/3 + n4/4) — no float accumulation.

    Scale: frontiers are (seed, node) pairs — |seeds| x node-
    cardinality, which saturates toward seeds x all-nodes on a dense
    graph. BOTH physical strategies were measured at the 100x blow-up
    (1.5M nodes, 7.5M-row frontier, local[32]): forced broadcast 411 s
    vs shuffle joins 1001 s — re-shuffling the dense edge list twice
    per round costs ~2.4x more than broadcasting the frontier, so
    broadcast stays the right plan far beyond where intuition says a
    "growing" frame must stop being broadcast. The real cliff is
    executor memory: the joins therefore gate the hint on the MEASURED
    frontier/dist row count (the frames are checkpointed, and the lazy
    checkpoint + count fold into one job) and swap to shuffle joins
    above _CLOSE_BCAST_CAP rows — the anti-join's `seen` side (dist,
    the cumulative union of all frontiers, so the larger frame late in
    the walk) at half that cap because both hash relations coexist in
    one stage — the guard for billion-node graphs
    where a frontier can no longer be held per-executor, while every
    tested scale keeps the measured-faster broadcast plan. The 100x
    wall is expansion-bound (frontier x degree before the distinct),
    intrinsic to the densified blow-up, not plan-bound. Level-order
    expansion means first discovery is the minimum distance, and
    per-round anti-joins keep the frontier shrinking; per-round
    localCheckpoint keeps plan depth constant (pagerank discipline)."""
    edges = _edges(spark, sf_dir).localCheckpoint()
    dist = (
        edges.where(F.col("src") < _CLOSE_SEED_MAX)
        .select("src")
        .distinct()
        .select(
            F.col("src").alias("seed"),
            F.col("src").alias("node"),
            F.lit(0).cast("long").alias("d"),
        )
        .localCheckpoint()
    )
    bcast_cap = _CLOSE_BCAST_CAP
    frontier = dist.select("seed", "node")
    frontier_n = dist.count()
    dist_n = frontier_n
    for d in range(1, _CLOSE_MAX_HOPS + 1):
        f_side = F.broadcast(frontier) if frontier_n < bcast_cap else frontier
        reached = (
            edges.join(f_side, f_side.node == edges.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        seen = dist.select("seed", "node")
        if dist_n < _CLOSE_DIST_BCAST_CAP:
            seen = F.broadcast(seen)
        new_rows = (
            reached.join(seen, ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(d).cast("long").alias("d"))
            .localCheckpoint(eager=False)
        )
        # lazy checkpoint + count = one job that both materializes the
        # round and yields the broadcast-gate cardinality
        frontier_n = new_rows.count()
        dist_n += frontier_n
        dist = dist.union(new_rows).localCheckpoint()
        frontier = new_rows.select("seed", "node")
    per_d = dist.where(F.col("d") > 0).groupBy("seed").pivot(
        "d", list(range(1, _CLOSE_MAX_HOPS + 1))
    ).count()
    cols = [
        F.coalesce(F.col(str(d)), F.lit(0)).cast("long").alias(f"n{d}")
        for d in range(1, _CLOSE_MAX_HOPS + 1)
    ]
    out = per_d.select("seed", *cols)
    harmonic = F.round(
        F.col("n1") / 1.0 + F.col("n2") / 2.0
        + F.col("n3") / 3.0 + F.col("n4") / 4.0,
        6,
    )
    return out.select(
        "seed",
        *[f"n{d}" for d in range(1, _CLOSE_MAX_HOPS + 1)],
        (F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4"))
        .cast("long")
        .alias("n_reached"),
        harmonic.alias("harmonic_closeness"),
    )


_CLOSENESS_SQL = f"""
WITH RECURSIVE
cpairs AS (
  SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
cedges AS (
  SELECT s AS src, c AS dst FROM cpairs
  UNION ALL
  SELECT c AS src, s AS dst FROM cpairs),
cseeds AS (SELECT DISTINCT src AS seed FROM cedges
           WHERE src < {_CLOSE_SEED_MAX}),
r(seed, node, d) AS (
  SELECT seed, seed, 0 FROM cseeds
  UNION
  SELECT r.seed, e.dst, r.d + 1
  FROM r JOIN cedges e ON e.src = r.node
  WHERE r.d < {_CLOSE_MAX_HOPS}),
md AS (
  SELECT seed, node, MIN(d) AS d FROM r GROUP BY seed, node),
cnt AS (
  SELECT seed,
         CAST(COUNT(*) FILTER (WHERE d = 1) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE d = 2) AS BIGINT) AS n2,
         CAST(COUNT(*) FILTER (WHERE d = 3) AS BIGINT) AS n3,
         CAST(COUNT(*) FILTER (WHERE d = 4) AS BIGINT) AS n4
  FROM md WHERE d > 0 GROUP BY seed)
SELECT seed, n1, n2, n3, n4,
       CAST(n1 + n2 + n3 + n4 AS BIGINT) AS n_reached,
       round(n1 / 1.0 + n2 / 2.0 + n3 / 3.0 + n4 / 4.0, 6)
         AS harmonic_closeness
FROM cnt
"""

QUERIES["graph_closeness_sampled"] = graph_closeness_sampled
ORACLE["graph_closeness_sampled"] = _CLOSENESS_SQL
