"""ml_dbscan_grid pairs-build prototypes (verdict-11 item 3).

Variants (same candidate semantics, same output pair BAG):
  v0: shipped 9-offset explode join
  v1: 5-offset half-neighborhood + mirror (halves the exploded side;
      distance symmetry makes the mirrored pairs exactly the missing 4
      offsets)
  v2: v1 + corner bounding-box pre-filter on the exploded side (a
      point can only reach a DIAGONAL neighbor cell if its distance to
      the shared corner is <= eps) — prunes exploded rows before the
      exchange (guide §2.3/§3.2)

Asserts bag equality via (count, xxhash64 sum over id,bid) and times
each variant's full pairs materialization (noop).

Usage: python tools/r12/dbscan_pairs_proto.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402
from cortana_intelligence_customer360_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EPS = 0.02


def base(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    pts = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    eps = F.lit(EPS)
    return pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") / eps).cast("long").alias("cx"),
        F.floor(F.col("y") / eps).cast("long").alias("cy"),
    )


def d2(ax, ay, bx, by):
    return (F.col(ax) - F.col(bx)) * (F.col(ax) - F.col(bx)) + (
        F.col(ay) - F.col(by)
    ) * (F.col(ay) - F.col(by))


def v0(spark):
    a = base(spark)
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    b = a.crossJoin(F.broadcast(offs)).select(
        F.col("id").alias("bid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    return (
        a.join(b, ["cx", "cy"])
        .where(d2("x", "y", "bx", "by") <= F.lit(EPS) * F.lit(EPS))
        .select("id", "bid")
    )


def _half(spark, corner_prune: bool):
    a = base(spark)
    # (0,0) stays two-sided; positive offsets generate each cross-cell
    # unordered pair once, mirrored after the join.
    offs = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 1), (1, -1)], "dx long, dy long"
    )
    b = a.crossJoin(F.broadcast(offs))
    if corner_prune:
        eps = F.lit(EPS)
        # target cell of the exploded row: (cx+dx, cy+dy). For dx=1 the
        # shared boundary is at x0 = (cx+1)*eps; a match needs
        # bx >= x0 - eps (always true) AND for diagonal offsets the
        # corner distance <= eps.
        x0 = (F.col("cx") + F.col("dx")).cast("double") * eps
        y0 = F.when(F.col("dy") == 1, (F.col("cy") + 1).cast("double") * eps).otherwise(
            F.col("cy").cast("double") * eps
        )
        dxd = F.when(F.col("dx") == 1, x0 - F.col("x")).otherwise(F.lit(0.0))
        dyd = F.when(F.col("dy") == 0, F.lit(0.0)).otherwise(
            F.when(F.col("dy") == 1, y0 - F.col("y")).otherwise(F.col("y") - y0)
        )
        b = b.where(dxd * dxd + dyd * dyd <= eps * eps)
    b = b.select(
        F.col("id").alias("bid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    same = (
        a.join(
            a.select(
                F.col("id").alias("bid"),
                F.col("x").alias("bx"),
                F.col("y").alias("by"),
                "cx",
                "cy",
            ),
            ["cx", "cy"],
        )
        .where(d2("x", "y", "bx", "by") <= F.lit(EPS) * F.lit(EPS))
        .select("id", "bid")
    )
    cross = (
        a.join(b, ["cx", "cy"])
        .where(d2("x", "y", "bx", "by") <= F.lit(EPS) * F.lit(EPS))
        .select("id", "bid")
    )
    return same.unionByName(cross).unionByName(
        cross.select(F.col("bid").alias("id"), F.col("id").alias("bid"))
    )


def sig(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("id", "bid").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def main() -> None:
    spark = get_spark(app_name="dbscan-proto", driver_memory="48g")
    load_table(spark, SF_DIR, "embeddings").count()
    variants = {
        "v0_shipped": lambda: v0(spark),
        "v1_half_mirror": lambda: _half(spark, False),
        "v2_half_corner": lambda: _half(spark, True),
    }
    sigs = {}
    for name, fn in variants.items():
        sigs[name] = sig(fn())
        print(name, "sig", sigs[name])
    assert len(set(sigs.values())) == 1, f"BAG MISMATCH: {sigs}"
    for name, fn in variants.items():
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(name, "best", round(best, 3))


if __name__ == "__main__":
    main()
