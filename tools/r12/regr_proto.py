"""Prototype: agg_regr_family wide-decimal sums -> limbed LONG sums
(verdict-11 item 4). Computes the shipped frame and the limbed variant
at each SF and asserts bit-identical canonical rows, then times both
with the noop sink.

Usage: python tools/r12/regr_proto.py [--time]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cortana_intelligence_customer360_spark.compat import bcount  # noqa: E402
from cortana_intelligence_customer360_spark.operators.aggregates import (  # noqa: E402
    agg_regr_family,
)
from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402
from cortana_intelligence_customer360_spark.sources.tables import load_table  # noqa: E402


def limbs_of(expr, n_limbs: int):
    """Exact scale-10 integer limbs (base 1e7) of cast(expr as
    decimal(38,10)): returns long columns [lo, mid, hi...] whose
    weighted sum reconstructs the decimal sum exactly."""
    d = expr.cast("decimal(38,10)")
    v = (d * F.lit(10000000000)).cast("decimal(38,0)")
    cols = []
    for _ in range(n_limbs - 1):
        lo = F.pmod(v, F.lit(10000000)).cast("long")
        cols.append(lo)
        v = ((v - lo.cast("decimal(38,0)")) / F.lit(10000000)).cast(
            "decimal(38,0)"
        )
    cols.append(v.cast("long"))
    return cols


def recombine(sums, scale_pow10: int = 10):
    """sums = [sum_lo, sum_mid, sum_hi...] (long sums). Returns the
    exact decimal value sum(d) where d were the scale-10 decimals."""
    total = None
    for i, s in enumerate(sums):
        # limb i has weight 1e(7i - 10)
        w = 7 * i - scale_pow10
        c = s.cast("decimal(20,0)")
        if w >= 0:
            term = c * F.lit(10**w).cast(f"decimal({w + 1},0)")
        else:
            term = c / F.lit(10 ** (-w))
        total = term if total is None else total + term
    return total


def agg_regr_family_new(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    sxy_l = limbs_of(q * p, 3)
    syy_l = limbs_of(p * p, 3)
    moments = li.groupBy("l_returnflag").agg(
        bcount().alias("n"),
        # qty and qty^2 are exact small integers; price is exact cents.
        F.sum(q.cast("long")).alias("sx_i"),
        F.sum(F.round(p * 100, 0).cast("long")).alias("sy_c"),
        F.sum((q * q).cast("long")).alias("sxx_i"),
        *[F.sum(c).alias(f"sxy_{i}") for i, c in enumerate(sxy_l)],
        *[F.sum(c).alias(f"syy_{i}") for i, c in enumerate(syy_l)],
    )
    moments = moments.select(
        "l_returnflag",
        "n",
        F.col("sx_i").cast("double").alias("sx"),
        (F.col("sy_c").cast("decimal(20,0)") / F.lit(100))
        .cast("double")
        .alias("sy"),
        F.col("sxx_i").cast("double").alias("sxx"),
        recombine([F.col(f"sxy_{i}") for i in range(3)])
        .cast("double")
        .alias("sxy"),
        recombine([F.col(f"syy_{i}") for i in range(3)])
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = F.col("sxy") - sx * sy / n
    varx_n = F.col("sxx") - sx * sx / n
    vary_n = F.col("syy") - sy * sy / n
    return moments.select(
        "l_returnflag",
        n.alias("regr_n"),
        F.round(cov_n / varx_n, 6).alias("slope"),
        F.round(sy / n - (cov_n / varx_n) * (sx / n), 6).alias("intercept"),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias("r2"),
        F.round(sx / n, 6).alias("avg_x"),
        F.round(sy / n, 6).alias("avg_y"),
    )


def canon_rows(df):
    return sorted(tuple(repr(c) for c in r) for r in df.collect())


def main() -> None:
    spark = get_spark(app_name="regr-proto", driver_memory="48g")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        old = canon_rows(agg_regr_family(spark, d))
        new = canon_rows(agg_regr_family_new(spark, d))
        ok = old == new
        print(sf, "IDENTICAL" if ok else "MISMATCH")
        if not ok:
            for a, b in zip(old, new):
                if a != b:
                    print(" old:", a)
                    print(" new:", b)
            sys.exit(1)
    if "--time" in sys.argv:
        d = "/root/testdata/sf0.1"
        for tag, fn in (("old", agg_regr_family), ("new", agg_regr_family_new)):
            for rep in range(3):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                print(f"{tag} rep{rep}: {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()


def agg_regr_family_hybrid(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    dec = "decimal(38,10)"
    raw = li.groupBy("l_returnflag").agg(
        bcount().alias("n"),
        F.sum(q.cast("long")).alias("sx_i"),
        F.sum(F.round(p * 100, 0).cast("long")).alias("sy_c"),
        F.sum((q * q).cast("long")).alias("sxx_i"),
        F.sum((q * p).cast(dec)).cast("double").alias("sxy"),
        F.sum((p * p).cast(dec)).cast("double").alias("syy"),
    )
    moments = raw.select(
        "l_returnflag",
        "n",
        F.col("sx_i").cast("double").alias("sx"),
        (F.col("sy_c").cast("decimal(20,0)") / F.lit(100))
        .cast("double")
        .alias("sy"),
        F.col("sxx_i").cast("double").alias("sxx"),
        "sxy",
        "syy",
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = F.col("sxy") - sx * sy / n
    varx_n = F.col("sxx") - sx * sx / n
    vary_n = F.col("syy") - sy * sy / n
    return moments.select(
        "l_returnflag",
        n.alias("regr_n"),
        F.round(cov_n / varx_n, 6).alias("slope"),
        F.round(sy / n - (cov_n / varx_n) * (sx / n), 6).alias("intercept"),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias("r2"),
        F.round(sx / n, 6).alias("avg_x"),
        F.round(sy / n, 6).alias("avg_y"),
    )
