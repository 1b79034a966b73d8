"""Spatial proximity operators via grid binning (SURVEY.md §2.12).

The generic "find all pairs within distance r" problem is quadratic if
expressed naively (cross join + distance filter -> BroadcastNestedLoop,
the classic scale-killer). The standard distributed rewrite bins points
into grid cells of side r, replicates ONE side into its 3x3 neighbor
cells, and equi-joins on the cell id: every qualifying pair shares a
cell with one replica, so the join is a plain hash-partitioned equi
join whose cost is local point density, not corpus size. This is the
same bucket-rewrite family as join_range_bucketed (1-D) lifted to 2-D.

Coordinates derive from the customer key through md5 (the same
engine-portable construction as sample_hash_pct) so points scatter
uniformly — a multiplicative-mod hash was tried first and produced a
degenerate lattice where the only close pairs were exact collisions.
The distance test is exact integer arithmetic (dist² <= r²): no floats
anywhere, so the DuckDB all-pairs oracle matches bit-for-bit and no
boundary pair can flip on rounding.

graph_triangle_count closes the loop: 3-cliques of the proximity graph
(co-located triples) via the ordered wedge join — every triangle
a<b<c is counted exactly once, the canonical distributed triangle
enumeration (edge list joined with itself on the middle vertex, then
closed against the edge list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

_GRID = 1000  # points scatter over a _GRID x _GRID integer plane
_R = 5  # proximity radius for join_spatial_grid (= cell side)
_TRI_R = 10  # wider radius for the triangle graph (denser edges)


def _coord(pid, salt: str):
    """Uniform integer coordinate in [0, _GRID): md5-derived, portable
    across engines (identical construction in the oracle SQL)."""
    h = F.md5(F.concat(pid.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _GRID


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    pid = F.col("c_custkey")
    return cu.select(
        pid.alias("pid"),
        _coord(pid, "x").alias("x"),
        _coord(pid, "y").alias("y"),
    )


def _pairs_within(pts: DataFrame, r: int) -> DataFrame:
    """All pid_a < pid_b with dist² <= r², via the grid rewrite with
    cell side r (3x3 neighbor replication of the left side)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = (
        pts.select("pid", "x", "y", F.explode(offsets).alias("o"))
        .select(
            F.col("pid").alias("pid_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("x") / r).cast("long") + F.col("o.dx"),
            (F.col("y") / r).cast("long") + F.col("o.dy"),
        )
        .toDF("pid_a", "xa", "ya", "cx", "cy")
    )
    right = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        (F.col("x") / r).cast("long").alias("cx"),
        (F.col("y") / r).cast("long").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .where((F.col("pid_a") < F.col("pid_b")) & (d2 <= r * r))
        .select("pid_a", "pid_b", d2.cast("long").alias("dist2"))
    )


def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within distance _R, via the grid-cell rewrite.

    Left side replicates into its 9 neighbor cells (a 9x map-side
    explode — no shuffle), both sides hash-partition on the cell id,
    and the refine step is an exact integer dist² filter. Each
    unordered pair (a<b) meets in exactly one (cell, replica)
    combination, so no post-join dedup is needed."""
    return _pairs_within(_points(spark, sf_dir), _R)


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation in the radius-_TRI_R proximity
    graph: the canonical distributed triangle enumeration. Edges carry
    a<b ordering, wedges join on the middle vertex (a<b<c by
    construction), and the closing edge (a,c) arrives via one more
    equi-join — every triangle counted exactly once, no orientation
    dedup. Cost is Σ deg(v)² (wedge count), the known bound; at real
    scale the standard refinement is degree-ordered edge direction,
    which this a<b ordering already approximates."""
    e = _pairs_within(_points(spark, sf_dir), _TRI_R).select(
        F.col("pid_a").alias("a"), F.col("pid_b").alias("b")
    )
    wedges = e.select(F.col("a"), F.col("b")).join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")).withColumn(
            "closed", F.lit(1)
        ),
        ["a", "c"],
    )
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


_COORD_SQL = (
    "('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '{salt}'), 1, 8))::BIGINT"
    f" % {_GRID}"
)

_PTS_SQL = f"""
  SELECT c_custkey AS pid,
         CAST({_COORD_SQL.format(salt='x')} AS BIGINT) AS x,
         CAST({_COORD_SQL.format(salt='y')} AS BIGINT) AS y
  FROM customer"""

_SPATIAL_SQL = f"""
WITH pts AS ({_PTS_SQL})
SELECT a.pid AS pid_a, b.pid AS pid_b,
       CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
FROM pts a JOIN pts b
  ON a.pid < b.pid
 AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_R * _R}
"""

_TRIANGLE_SQL = f"""
WITH pts AS ({_PTS_SQL}),
e AS (
  SELECT a.pid AS a, b.pid AS b
  FROM pts a JOIN pts b
    ON a.pid < b.pid
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_TRI_R * _TRI_R}),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
nodes AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY node
"""


_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"  # standard geohash base32
_GH_BITS = 15  # bits per dimension -> 6 base32 chars


def _spread15_sql(expr: str) -> str:
    x = f"(({expr}) & 32767)"
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding of the customer point cloud: each dimension
    min/max-scales to 15 bits, bit-interleaves (x on even bits), and
    the 30-bit cell id renders as 6 base32 chars — the string whose
    PREFIX property (shared prefix ⟺ nearby cell) makes range scans
    and prefix joins do spatial locality on ordinary string indexes.
    Pure bit arithmetic + substring lookups (whole-stage codegen, no
    UDF); same mask-shift spread as sort_zorder, base32 instead of a
    sort key. gh3 (3-char prefix) is included as the coarse bucket a
    locality groupBy would key on."""
    from .setops import _spread16, scale16

    pts = _points(spark, sf_dir)
    gx = scale16(F.col("x"), F.lit(0), F.lit(_GRID - 1)).bitwiseAND(
        F.lit(0xFFFF)
    ) / F.lit(2)
    # 16-bit scale then halve -> 15 bits; floor via long cast of exact .0/.5
    gx = F.floor(gx).cast("long")
    gy = F.floor(
        scale16(F.col("y"), F.lit(0), F.lit(_GRID - 1)) / F.lit(2)
    ).cast("long")
    z = _spread16(gx).bitwiseOR(F.shiftleft(_spread16(gy), 1))
    chars = [
        F.substring(
            F.lit(_GH_ALPHABET),
            (F.shiftright(z, 25 - 5 * k).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for k in range(6)
    ]
    gh = F.concat(*chars)
    return pts.select(
        "pid", "x", "y", gh.alias("geohash"), F.substring(gh, 1, 3).alias("gh3")
    )


def _geohash_sql() -> str:
    def scale15(expr: str) -> str:
        s16 = f"CAST(floor((({expr}) - 0) * 65535 / ({_GRID - 1} - 0)) AS BIGINT)"
        return f"CAST(floor(({s16} & 65535) / 2) AS BIGINT)"

    z = (
        f"({_spread15_sql(scale15('x'))}"
        f" | ({_spread15_sql(scale15('y'))} << 1))"
    )
    chars = " || ".join(
        f"substr('{_GH_ALPHABET}', CAST((({z} >> {25 - 5 * k}) & 31) + 1 AS INT), 1)"
        for k in range(6)
    )
    return f"""
WITH pts AS (
  SELECT c_custkey AS pid,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 8))::BIGINT
           % {_GRID} AS x,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 8))::BIGINT
           % {_GRID} AS y
  FROM customer)
SELECT pid, x, y, {chars} AS geohash,
       substr({chars}, 1, 3) AS gh3
FROM pts
"""


_EARTH_KM = 6371.0


def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance between each customer point
    and its key-successor — the geodesic primitive under store-radius /
    delivery-range queries. Grid coordinates map affinely to
    lat ∈ [-85, 85], lon ∈ [-180, 180); the trig chain runs the
    identical IEEE/libm expression on identical operands in both
    engines and the result rounds at 3 dp (km) — coarse enough that a
    1-ulp libm wobble can never flip a digit. Map-side self-join on
    key+1 (co-partitioned equi join, no range blowup)."""
    pts = _points(spark, sf_dir)
    lat = (F.col("y") * (170.0 / (_GRID - 1)) - 85.0) * (3.141592653589793 / 180.0)
    lon = (F.col("x") * (360.0 / _GRID) - 180.0) * (3.141592653589793 / 180.0)
    p = pts.select("pid", lat.alias("lat"), lon.alias("lon"))
    q = p.select(
        (F.col("pid") - 1).alias("pid"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    j = p.join(q, "pid")
    dlat = (F.col("lat2") - F.col("lat")) / 2.0
    dlon = (F.col("lon2") - F.col("lon")) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos("lat") * F.cos("lat2") * F.sin(
        dlon
    ) * F.sin(dlon)
    d = F.lit(2.0 * _EARTH_KM) * F.asin(F.sqrt(a))
    return j.select(
        "pid",
        F.round(F.col("lat") * (180.0 / 3.141592653589793), 6).alias("lat_deg"),
        F.round(F.col("lon") * (180.0 / 3.141592653589793), 6).alias("lon_deg"),
        F.round(d, 3).alias("dist_next_km"),
    )


def _haversine_sql() -> str:
    pi = "3.141592653589793"
    coords = f"""
pts AS (
  SELECT c_custkey AS pid,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 8))::BIGINT
           % {_GRID} AS x,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 8))::BIGINT
           % {_GRID} AS y
  FROM customer),
p AS (
  SELECT pid,
         (y * (170.0 / {_GRID - 1}) - 85.0) * ({pi} / 180.0) AS lat,
         (x * (360.0 / {_GRID}) - 180.0) * ({pi} / 180.0) AS lon
  FROM pts)"""
    return f"""
WITH {coords}
SELECT a.pid,
       ROUND(a.lat * (180.0 / {pi}), 6) AS lat_deg,
       ROUND(a.lon * (180.0 / {pi}), 6) AS lon_deg,
       ROUND(2.0 * {_EARTH_KM} * asin(sqrt(
         sin((b.lat - a.lat) / 2.0) * sin((b.lat - a.lat) / 2.0)
         + cos(a.lat) * cos(b.lat)
           * sin((b.lon - a.lon) / 2.0) * sin((b.lon - a.lon) / 2.0))), 3)
         AS dist_next_km
FROM p a JOIN p b ON b.pid = a.pid + 1
"""


def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of the proximity graph:
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — how close each node's
    neighborhood is to a clique (the community-structure signal next
    to raw triangle counts). Exact integer T and deg feed ONE double
    division, so the coefficient is bit-identical cross-engine; nodes
    with deg < 2 report cc = 0 by convention.

    Scale posture: reuses the grid-bucketed proximity pairs (never
    all-pairs) and the a<b wedge-join triangle enumeration; degrees
    come from one symmetric-edge aggregate. All joins keyed by node
    id."""
    e = _pairs_within(_points(spark, sf_dir), _TRI_R).select(
        F.col("pid_a").alias("a"), F.col("pid_b").alias("b")
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    wedges = e.select(F.col("a"), F.col("b")).join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    tcount = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    cc = F.when(
        F.col("deg") >= 2,
        F.round(
            2.0
            * F.coalesce("n_triangles", F.lit(0)).cast("double")
            / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return deg.join(tcount, "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
        cc.alias("clustering_coeff"),
    )


_CLUSTERING_SQL = f"""
WITH pts AS ({_PTS_SQL}),
e AS (
  SELECT a.pid AS a, b.pid AS b
  FROM pts a JOIN pts b
    ON a.pid < b.pid
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_TRI_R * _TRI_R}),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tc AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node)
SELECT deg.node, deg.deg,
       CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.deg >= 2
            THEN round(2.0 * CAST(COALESCE(tc.n_triangles, 0) AS DOUBLE)
                       / CAST(deg.deg * (deg.deg - 1) AS DOUBLE), 6)
            ELSE 0.0 END AS clustering_coeff
FROM deg LEFT JOIN tc USING (node)
"""


QUERIES = {
    "join_spatial_grid": join_spatial_grid,
    "graph_clustering_coeff": graph_clustering_coeff,
    "graph_triangle_count": graph_triangle_count,
    "fn_geohash": fn_geohash,
    "fn_haversine": fn_haversine,
}
ORACLE = {
    "join_spatial_grid": _SPATIAL_SQL,
    "graph_clustering_coeff": _CLUSTERING_SQL,
    "graph_triangle_count": _TRIANGLE_SQL,
    "fn_geohash": _geohash_sql(),
    "fn_haversine": _haversine_sql(),
}
