"""Spatial proximity join via grid binning (SURVEY.md §2.12).

The generic "find all pairs within distance r" problem is quadratic if
expressed naively (cross join + distance filter -> BroadcastNestedLoop,
the classic scale-killer). The standard distributed rewrite bins points
into grid cells of side r, replicates ONE side into its 3x3 neighbor
cells, and equi-joins on the cell id: every qualifying pair shares a
cell with one replica, so the join is a plain hash-partitioned equi
join whose cost is local point density, not corpus size. This is the
same bucket-rewrite family as join_range_bucketed (1-D) lifted to 2-D.

Coordinates are derived deterministically from the customer key with
multiplicative integer hashing (Knuth/Fibonacci constants), and the
distance test is exact integer arithmetic (dist² <= r²) — no floats
anywhere, so the DuckDB all-pairs oracle matches bit-for-bit and no
boundary pair can flip on rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

_GRID = 1000  # points scatter over a _GRID x _GRID integer plane
_R = 5  # proximity radius (= cell side, so 3x3 neighbors suffice)
_R2 = _R * _R
# Multiplicative hash constants (public domain: Knuth 2654435761,
# xxhash prime 2246822519) — plain BIGINT arithmetic in both engines.
_HX = 2654435761
_HY = 2246822519


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * _HX) % _GRID).cast("long").alias("x"),
        ((F.col("c_custkey") * _HY) % _GRID).cast("long").alias("y"),
    )


def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within distance _R, via the grid-cell rewrite.

    Left side replicates into its 9 neighbor cells (a 9x map-side
    explode — no shuffle), both sides hash-partition on the cell id,
    and the refine step is an exact integer dist² filter. Each
    unordered pair (a<b) meets in exactly one (cell, replica)
    combination, so no post-join dedup is needed."""
    pts = _points(spark, sf_dir)
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
            (F.col("x") / _R).cast("long") + F.col("o.dx"),
            (F.col("y") / _R).cast("long") + F.col("o.dy"),
        )
        .toDF("pid_a", "xa", "ya", "cx", "cy")
    )
    right = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        (F.col("x") / _R).cast("long").alias("cx"),
        (F.col("y") / _R).cast("long").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .where((F.col("pid_a") < F.col("pid_b")) & (d2 <= _R2))
        .select("pid_a", "pid_b", d2.cast("long").alias("dist2"))
    )


_SPATIAL_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS pid,
         CAST((c_custkey * {_HX}) % {_GRID} AS BIGINT) AS x,
         CAST((c_custkey * {_HY}) % {_GRID} AS BIGINT) AS y
  FROM customer)
SELECT a.pid AS pid_a, b.pid AS pid_b,
       CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
FROM pts a JOIN pts b
  ON a.pid < b.pid
 AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_R2}
"""


QUERIES = {"join_spatial_grid": join_spatial_grid}
ORACLE = {"join_spatial_grid": _SPATIAL_SQL}
