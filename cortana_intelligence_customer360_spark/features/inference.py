"""Statistical inference operators (round-5 session-3 additions).

Reference parity note: the upstream Azure/cortana-intelligence-customer360
checkout is empty (SURVEY.md §0); SURVEY §2.8/§2.12 are the normative
inventory. This module rounds out the experimentation family with the
non-parametric / multiple-testing toolkit an analyst reaches for when
the t-test's normality assumption fails:

- stat_mann_whitney    rank-sum U test (tie-corrected normal approx)
                       comparing order values across two segments
- stat_brown_forsythe  median-based Levene test for variance
                       homogeneity across all five market segments
- stat_cohens_kappa    inter-rater agreement between two binary
                       labelers (priority rule vs. observed returns)
- stat_fdr_bh          per-nation two-proportion z-tests corrected by
                       Benjamini-Hochberg FDR (step-up, adjusted p)
- ml_isotonic_pava     weighted isotonic regression of discount on
                       quantity via the exact minimax characterization

Cross-engine float discipline (compat.py): every test statistic is a
closed-form expression over EXACT integer/DECIMAL sufficient statistics,
and the expression is shared as ONE SQL text string evaluated by both
engines (Spark via ``F.expr``, DuckDB verbatim), so the IEEE operation
order is identical by construction. Normal-tail p-values use the
Abramowitz-Stegun 7.1.26 erf polynomial (|err| < 1.5e-7) because
neither engine exposes erf portably; p-values are rounded to 6 dp
BEFORE any threshold comparison so knife-edge decisions can't diverge.

Scale notes (100 TB posture): each operator collapses the fact table to
sufficient statistics in one or two key-partitioned shuffles (value
groups for ranks, segment groups for variances, nation groups for
proportions, quantity buckets for isotonic), and all remaining math
runs on tiny frames (<= a few thousand rows) that Spark broadcasts.
Global/segment ranks (Mann-Whitney's cumulative count, Brown-
Forsythe's median) are distributed by DETERMINISTIC VALUE BUCKETS —
floor(x/256), a pure function of the data — so prefix sums shard into
per-bucket windows plus a tiny bucket-offset frame, with no
partitionless window and no dependence on runtime partition ids
(spark_partition_id pairs rows with offsets from a different
partitioning if an exchange is ever replanned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount, dsum, dsum_sql
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def _p_two_sided(zabs: str) -> str:
    """SQL text for the two-sided normal tail 2*(1-Phi(|z|)) using the
    Abramowitz-Stegun 7.1.26 erf polynomial: 1-erf(x) = poly(t)*exp(-x^2)
    with x = |z|/sqrt(2), t = 1/(1+0.3275911*x). The SAME string is
    evaluated by Spark (F.expr) and DuckDB, so both engines execute the
    identical IEEE operation tree."""
    x = f"({zabs} * 0.7071067811865476)"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"(((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741)"
        f" * {t} - 0.284496736) * {t} + 0.254829592) * {t})"
    )
    return f"({poly} * exp(-({x} * {x})))"


# ---------------------------------------------------------------------------
# stat_mann_whitney
# ---------------------------------------------------------------------------

_MW_SEGS = ("BUILDING", "MACHINERY")

# Closed-form columns over exact BIGINT sufficient statistics
# (r1x2 = 2*R1 midrank sum, tsum = sum(t^3 - t) tie correction).
_MW_U1 = "(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0)"
_MW_SIG2 = (
    "((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)"
    " * ((CAST(n AS DOUBLE) + 1.0)"
    " - CAST(tsum AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))"
)
_MW_Z = (
    f"(({_MW_U1} - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)"
    f" / sqrt({_MW_SIG2}))"
)


def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: are BUILDING order
    values stochastically larger than MACHINERY ones?

    Midranks are computed WITHOUT a per-row global sort: one groupBy on
    the value collapses the sample to distinct values with (total,
    group-1) counts, and a cumulative count over that distinct-value
    table yields every midrank. 2*midrank = 2*cum_before + t + 1 is an
    exact BIGINT, so the rank sum R1, U, and the tie correction
    sum(t^3-t) are integer-exact in both engines; only the final
    z/p are floats, computed from one shared expression string.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .where(F.col("c_mktsegment").isin(*_MW_SEGS))
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_totalprice").alias("x"),
            (F.col("c_mktsegment") == _MW_SEGS[0]).cast("long").alias("in1"),
        )
    )
    vals = obs.groupBy("x").agg(
        bcount().alias("tv"), F.sum("in1").cast("long").alias("n1v")
    )
    # Distinct-price cardinality grows with the data, so the cumulative
    # count is distributed by DETERMINISTIC VALUE BUCKETS (bkt =
    # floor(x/256), a pure function of the data — immune to exchange
    # replans, unlike spark_partition_id): per-bucket totals feed a
    # tiny offset window, and the data-sized window runs per bucket.
    vals = vals.withColumn("bkt", F.floor(F.col("x") / F.lit(256.0)).cast("long"))
    boff = (
        vals.groupBy("bkt")
        .agg(F.sum("tv").alias("btv"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btv").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "boff")
    )
    wloc = Window.partitionBy("bkt").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    vals = vals.join(F.broadcast(boff), "bkt").withColumn(
        "cumb", F.col("boff") + F.sum("tv").over(wloc) - F.col("tv")
    )
    suff = vals.agg(
        F.sum(
            F.col("n1v") * (2 * F.col("cumb") + F.col("tv") + 1)
        ).cast("long").alias("r1x2"),
        F.sum("n1v").cast("long").alias("n1"),
        F.sum("tv").cast("long").alias("n"),
        F.sum(
            F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv")
        ).cast("long").alias("tsum"),
    ).withColumn("n2", F.col("n") - F.col("n1"))
    return suff.select(
        "n1",
        "n2",
        F.expr(_MW_U1).alias("u1"),
        "tsum",
        F.round(F.expr(_MW_Z), 6).alias("z"),
        F.round(F.expr(_p_two_sided(f"abs({_MW_Z})")), 6).alias("p_approx"),
    )


_MANN_WHITNEY_SQL = f"""
WITH obs AS (
  SELECT o.o_totalprice AS x,
         CASE WHEN c.c_mktsegment = '{_MW_SEGS[0]}' THEN 1 ELSE 0 END AS in1
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{_MW_SEGS[0]}', '{_MW_SEGS[1]}')),
vals AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS tv, CAST(SUM(in1) AS BIGINT) AS n1v
  FROM obs GROUP BY x),
cum AS (
  SELECT *, SUM(tv) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS cumb
  FROM vals),
suff AS (
  SELECT CAST(SUM(n1v * (2 * cumb + tv + 1)) AS BIGINT) AS r1x2,
         CAST(SUM(n1v) AS BIGINT) AS n1,
         CAST(SUM(tv) AS BIGINT) AS n,
         CAST(SUM(tv * tv * tv - tv) AS BIGINT) AS tsum
  FROM cum),
s2 AS (SELECT *, n - n1 AS n2 FROM suff)
SELECT n1, n2, {_MW_U1} AS u1, tsum,
       round({_MW_Z}, 6) AS z,
       round({_p_two_sided(f'abs({_MW_Z})')}, 6) AS p_approx
FROM s2
"""

QUERIES["stat_mann_whitney"] = stat_mann_whitney
ORACLE["stat_mann_whitney"] = _MANN_WHITNEY_SQL


# ---------------------------------------------------------------------------
# stat_brown_forsythe
# ---------------------------------------------------------------------------

_BF_K = 5  # market segments
# SSB = a - ssz^2/nn, SSW = ssw; F = (SSB/(k-1)) / (SSW/(N-k)).
_BF_F = (
    "(((a - ssz * ssz / CAST(nn AS DOUBLE)) / (5.0 - 1.0))"
    " / (ssw / (CAST(nn AS DOUBLE) - 5.0)))"
)


def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-based Levene) test: do the five market
    segments have equal order-value spread?

    The group center is the LOWER MEDIAN — the ((n+1) DIV 2)-th
    smallest value, selected by an explicit per-segment row_number —
    because it is an exact data element both engines agree on
    bit-for-bit (interpolated medians differ in the low bits across
    engines: DuckDB computes lo + 0.5*(hi-lo), Spark 0.5*lo + 0.5*hi).
    z = |x - median| is then a deterministic double per row, and the
    one-way ANOVA on z collapses to per-segment DECIMAL-exact sums
    (n, S_z, S_zz) feeding one shared closed-form F expression.

    Shape: one shuffle on (segment) for the median window, one
    re-aggregation for the sums; the 5-row segment frame is broadcast
    back for the |x - med| pass.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").alias("x"),
            "o_orderkey",
        )
    )
    # Per-segment rank distributed by DETERMINISTIC VALUE BUCKETS
    # (seg, floor(x/256)) — a pure function of the data, immune to
    # exchange replans — so no 5-partition segment window ever holds a
    # fifth of the fact table in one task: per-(seg, bucket) counts
    # feed a tiny per-segment offset window, and row_number runs per
    # bucket. rank-in-segment = bucket offset + local rank.
    obs2 = obs.withColumn("bkt", F.floor(F.col("x") / F.lit(256.0)).cast("long"))
    boff = (
        obs2.groupBy("seg", "bkt")
        .agg(bcount().alias("btv"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btv").over(
                    Window.partitionBy("seg")
                    .orderBy("bkt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("seg", "bkt", "boff")
    )
    wloc = Window.partitionBy("seg", "bkt").orderBy(
        F.col("x").asc(), F.col("o_orderkey").asc()
    )
    ranked = obs2.join(F.broadcast(boff), ["seg", "bkt"]).withColumn(
        "rn", F.col("boff") + F.row_number().over(wloc)
    )
    seg_cnt = ranked.groupBy("seg").agg(bcount().alias("cnt"))
    med = (
        ranked.join(F.broadcast(seg_cnt), "seg")
        .where(F.col("rn") == F.expr("(cnt + 1) DIV 2"))
        .select("seg", F.col("x").alias("med"))
    )
    z = obs.join(F.broadcast(med), "seg").select(
        "seg", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    per = z.groupBy("seg").agg(
        bcount().alias("nj"),
        dsum("z").alias("sz"),
        dsum(F.col("z") * F.col("z")).alias("szz"),
    )
    suff = per.agg(
        F.sum("nj").cast("long").alias("nn"),
        dsum("sz").alias("ssz"),
        dsum(F.col("sz") * F.col("sz") / F.col("nj").cast("double")).alias("a"),
        dsum(
            F.col("szz") - F.col("sz") * F.col("sz") / F.col("nj").cast("double")
        ).alias("ssw"),
    )
    return suff.select(
        "nn",
        F.lit(_BF_K).cast("int").alias("k"),
        F.round(F.expr(_BF_F), 6).alias("f_bf"),
    )


_BROWN_FORSYTHE_SQL = f"""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x, o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
rn AS (
  SELECT seg, x,
         ROW_NUMBER() OVER (PARTITION BY seg
                            ORDER BY x ASC, o_orderkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY seg) AS cnt
  FROM obs),
med AS (SELECT seg, x AS med FROM rn WHERE rn = (cnt + 1) // 2),
z AS (
  SELECT obs.seg, abs(obs.x - med.med) AS z
  FROM obs JOIN med ON obs.seg = med.seg),
per AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS nj,
         {dsum_sql('z')} AS sz,
         {dsum_sql('z * z')} AS szz
  FROM z GROUP BY seg),
suff AS (
  SELECT CAST(SUM(nj) AS BIGINT) AS nn,
         {dsum_sql('sz')} AS ssz,
         {dsum_sql('sz * sz / CAST(nj AS DOUBLE)')} AS a,
         {dsum_sql('szz - sz * sz / CAST(nj AS DOUBLE)')} AS ssw
  FROM per)
SELECT nn, CAST({_BF_K} AS INT) AS k, round({_BF_F}, 6) AS f_bf
FROM suff
"""

QUERIES["stat_brown_forsythe"] = stat_brown_forsythe
ORACLE["stat_brown_forsythe"] = _BROWN_FORSYTHE_SQL


# ---------------------------------------------------------------------------
# stat_cohens_kappa
# ---------------------------------------------------------------------------

_KAPPA_PO = "(CAST(n11 + n00 AS DOUBLE) / CAST(nn AS DOUBLE))"
_KAPPA_PE = (
    "((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)"
    " + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))"
    " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))"
)
_KAPPA = f"(({_KAPPA_PO} - {_KAPPA_PE}) / (1.0 - {_KAPPA_PE}))"


def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary order labelers: rater A flags
    high-priority orders (1-URGENT/2-HIGH), rater B flags orders that
    experienced a return (any lineitem with l_returnflag = 'R').
    Chance-corrected agreement = (po - pe) / (1 - pe).

    Shape: lineitem collapses to a per-order return flag in one
    groupBy(l_orderkey); the join back to orders is co-partitioned on
    the same key, and the 2x2 contingency table is four BIGINT cells
    from one final aggregate — kappa itself is a shared closed-form
    expression over those exact integers.
    """
    returns = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("b"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("a"),
    )
    j = o.join(returns, F.col("o_orderkey") == F.col("l_orderkey"), "left").select(
        "a", F.coalesce(F.col("b"), F.lit(0)).alias("b")
    )
    cells = j.agg(
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
        bcount().alias("nn"),
    )
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        "nn",
        F.round(F.expr(_KAPPA_PO), 6).alias("po"),
        F.round(F.expr(_KAPPA_PE), 6).alias("pe"),
        F.round(F.expr(_KAPPA), 6).alias("kappa"),
    )


_COHENS_KAPPA_SQL = f"""
WITH returns AS (
  SELECT l_orderkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS b
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS a,
         COALESCE(r.b, 0) AS b
  FROM orders o LEFT JOIN returns r ON o.o_orderkey = r.l_orderkey),
cells AS (
  SELECT CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
         CAST(COUNT(*) AS BIGINT) AS nn
  FROM j)
SELECT n11, n10, n01, n00, nn,
       round({_KAPPA_PO}, 6) AS po,
       round({_KAPPA_PE}, 6) AS pe,
       round({_KAPPA}, 6) AS kappa
FROM cells
"""

QUERIES["stat_cohens_kappa"] = stat_cohens_kappa
ORACLE["stat_cohens_kappa"] = _COHENS_KAPPA_SQL


# ---------------------------------------------------------------------------
# stat_fdr_bh
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.05
_BH_M = 25  # nations
# Two-proportion z: nation return rate vs. rest-of-world, pooled SE.
_FDR_Z = (
    "((CAST(rj AS DOUBLE) / CAST(nj AS DOUBLE)"
    " - CAST(rr - rj AS DOUBLE) / CAST(nr - nj AS DOUBLE))"
    " / sqrt((CAST(rr AS DOUBLE) / CAST(nr AS DOUBLE))"
    " * (1.0 - CAST(rr AS DOUBLE) / CAST(nr AS DOUBLE))"
    " * (1.0 / CAST(nj AS DOUBLE) + 1.0 / CAST(nr - nj AS DOUBLE))))"
)


def stat_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation return-rate z-tests with Benjamini-Hochberg FDR.

    Each nation's lineitem return rate ('R' flag share) is compared to
    the rest of the world with a pooled two-proportion z-test; the 25
    p-values then go through the BH step-up: sort ascending, reject
    the largest prefix where p_(i) <= i/m * alpha, and report the
    monotone adjusted p (reverse running minimum of p*m/i, capped at 1).

    Determinism: z and p come from one shared expression over exact
    BIGINT counts; p is rounded to 6 dp BEFORE the threshold compare
    and before the adjusted-p window, so the step-up decisions are
    bit-identical across engines. The BH pass itself runs on a 25-row
    frame — driver-trivial at any scale; the heavy lifting is the two
    fact-table shuffles (orderkey join, custkey join) that produce the
    per-nation counts with map-side partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_returnflag") == "R").cast("long").alias("r")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(bcount().alias("nj"), F.sum("r").cast("long").alias("rj"))
    )
    tot = per.agg(
        F.sum("nj").cast("long").alias("nr"), F.sum("rj").cast("long").alias("rr")
    )
    scored = per.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "nj",
        "rj",
        F.round(F.expr(_FDR_Z), 6).alias("z"),
        F.round(F.expr(_p_two_sided(f"abs({_FDR_Z})")), 6).alias("p"),
    )
    wi = Window.orderBy(F.col("p").asc(), F.col("n_name").asc())
    wrev = Window.orderBy(F.col("p").desc(), F.col("n_name").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = (
        scored.withColumn("i", F.row_number().over(wi))
        .withColumn(
            "p_adj",
            F.round(
                F.least(
                    F.min(
                        F.col("p") * F.lit(float(_BH_M)) / F.col("i").cast("double")
                    ).over(wrev),
                    F.lit(1.0),
                ),
                6,
            ),
        )
        .withColumn(
            "flag",
            F.when(
                F.col("p") <= F.col("i").cast("double") * F.lit(_BH_ALPHA / _BH_M),
                F.col("i"),
            ).otherwise(F.lit(0)),
        )
    )
    k = ranked.agg(F.max("flag").alias("kmax"))
    return (
        ranked.crossJoin(F.broadcast(k))
        .select(
            "n_name",
            "nj",
            "rj",
            "z",
            "p",
            "p_adj",
            (F.col("i") <= F.col("kmax")).cast("int").alias("rejected"),
        )
        .orderBy("n_name")
    )


_FDR_BH_SQL = f"""
WITH per AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS nj,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS rj
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name),
tot AS (
  SELECT CAST(SUM(nj) AS BIGINT) AS nr, CAST(SUM(rj) AS BIGINT) AS rr
  FROM per),
scored AS (
  SELECT n_name, nj, rj,
         round({_FDR_Z}, 6) AS z,
         round({_p_two_sided(f'abs({_FDR_Z})')}, 6) AS p
  FROM per CROSS JOIN tot),
numbered AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p ASC, n_name ASC) AS i
  FROM scored),
ranked AS (
  SELECT *,
         round(LEAST(MIN(p * {float(_BH_M)} / CAST(i AS DOUBLE))
               OVER (ORDER BY p DESC, n_name DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             1.0), 6) AS p_adj
  FROM numbered),
k AS (
  SELECT COALESCE(MAX(CASE WHEN p <= CAST(i AS DOUBLE) * {_BH_ALPHA / _BH_M}
                           THEN i ELSE 0 END), 0) AS kmax
  FROM ranked)
SELECT n_name, nj, rj, z, p, p_adj,
       CAST(CASE WHEN i <= kmax THEN 1 ELSE 0 END AS INT) AS rejected
FROM ranked CROSS JOIN k
ORDER BY n_name
"""

QUERIES["stat_fdr_bh"] = stat_fdr_bh
ORACLE["stat_fdr_bh"] = _FDR_BH_SQL


# ---------------------------------------------------------------------------
# ml_isotonic_pava
# ---------------------------------------------------------------------------


def ml_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic regression of mean discount on quantity via
    the exact minimax characterization g(k) = max_{i<=k} min_{j>=k}
    wavg(i..j) — the closed form of the pool-adjacent-violators fit
    (Barlow et al. 1972), which needs no iteration and therefore
    oracles exactly.

    Shape at scale: lineitem collapses to <=50 quantity buckets in one
    map-side-combined groupBy; DECIMAL prefix sums over that 50-row
    frame make every interval mean an exact-difference quotient, and
    the (i, k, j) triple frame is ~22k broadcast-joined rows — all the
    O(n^2) work happens on the bucket frame, never the fact table.
    min/max over doubles are order-free, so the fit is bit-identical
    across engines; the monotonicity g(1) <= ... <= g(50) is pinned in
    tests.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("int").alias("q"), F.col("l_discount").alias("y")
    )
    # Keep the per-bucket sum in DECIMAL (no double round-trip): prefix
    # differences below must be EXACT so interval means are identical
    # quotients in both engines.
    b = li.groupBy("q").agg(
        bcount().alias("nb"), F.sum(F.col("y").cast("decimal(30,6)")).alias("sy")
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    b = (
        b.withColumn("cw", F.sum("nb").over(w))
        .withColumn("cy", F.sum("sy").over(w))
        .select(
            "q",
            "nb",
            "sy",
            "cw",
            "cy",
            (F.col("cw") - F.col("nb")).alias("cwb"),
            (F.col("cy") - F.col("sy")).alias("cyb"),
        )
        .localCheckpoint()  # <=50 rows; reused by three self-joins below
    )
    lo = b.select(
        F.col("q").alias("qi"), F.col("cwb").alias("cwb_i"), F.col("cyb").alias("cyb_i")
    )
    hi = b.select(
        F.col("q").alias("qj"), F.col("cw").alias("cw_j"), F.col("cy").alias("cy_j")
    )
    ranges = (
        lo.join(hi, F.col("qi") <= F.col("qj"))
        .select(
            "qi",
            "qj",
            (
                (F.col("cy_j") - F.col("cyb_i")).cast("double")
                / (F.col("cw_j") - F.col("cwb_i")).cast("double")
            ).alias("mean_ij"),
        )
    )
    ks = b.select(F.col("q").alias("k"))
    triples = ranges.join(
        F.broadcast(ks), (F.col("qi") <= F.col("k")) & (F.col("qj") >= F.col("k"))
    )
    inner = triples.groupBy("k", "qi").agg(F.min("mean_ij").alias("minj"))
    fit = inner.groupBy("k").agg(F.max("minj").alias("g"))
    return (
        b.join(fit, F.col("q") == F.col("k"))
        .select(
            "q",
            F.col("nb").alias("n"),
            F.round(F.col("sy").cast("double") / F.col("nb").cast("double"), 6).alias(
                "raw_mean"
            ),
            F.round("g", 6).alias("fitted"),
        )
        .orderBy("q")
    )


_ISOTONIC_SQL = f"""
WITH b0 AS (
  SELECT CAST(trunc(l_quantity) AS INT) AS q,
         CAST(COUNT(*) AS BIGINT) AS nb,
         SUM(CAST(l_discount AS DECIMAL(30,6))) AS sy
  FROM lineitem GROUP BY 1),
b AS (
  SELECT q, nb, sy,
         SUM(nb) OVER (ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(sy) OVER (ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cy
  FROM b0),
b2 AS (
  SELECT q, nb, sy, cw, cy,
         cw - nb AS cwb, cy - sy AS cyb
  FROM b),
ranges AS (
  SELECT lo.q AS qi, hi.q AS qj,
         CAST(hi.cy - lo.cyb AS DOUBLE)
           / CAST(hi.cw - lo.cwb AS DOUBLE) AS mean_ij
  FROM b2 lo JOIN b2 hi ON lo.q <= hi.q),
triples AS (
  SELECT k.q AS k, r.qi, r.mean_ij
  FROM ranges r JOIN b2 k ON r.qi <= k.q AND r.qj >= k.q),
inner_min AS (
  SELECT k, qi, MIN(mean_ij) AS minj FROM triples GROUP BY k, qi),
fit AS (SELECT k, MAX(minj) AS g FROM inner_min GROUP BY k)
SELECT b2.q, b2.nb AS n,
       round(CAST(b2.sy AS DOUBLE) / CAST(b2.nb AS DOUBLE), 6) AS raw_mean,
       round(fit.g, 6) AS fitted
FROM b2 JOIN fit ON b2.q = fit.k
ORDER BY b2.q
"""

QUERIES["ml_isotonic_pava"] = ml_isotonic_pava
ORACLE["ml_isotonic_pava"] = _ISOTONIC_SQL


# ---------------------------------------------------------------------------
# ml_adaboost_stumps
# ---------------------------------------------------------------------------

_ADA_ROUNDS = 3
_ADA_CANDS = [
    ("quantity", 10.0, 1), ("quantity", 25.0, 1), ("quantity", 40.0, 1),
    ("quantity", 10.0, -1), ("quantity", 25.0, -1), ("quantity", 40.0, -1),
    ("discount", 0.02, 1), ("discount", 0.05, 1), ("discount", 0.08, 1),
    ("discount", 0.02, -1), ("discount", 0.05, -1), ("discount", 0.08, -1),
    ("tax", 0.02, 1), ("tax", 0.04, 1), ("tax", 0.06, 1),
    ("tax", 0.02, -1), ("tax", 0.04, -1), ("tax", 0.06, -1),
]
# Shared expression texts (Spark F.expr == DuckDB verbatim) over columns
# (q, dc, tx, feature, thr, pol, y, margin, alpha): the stump response,
# the boosting weight, and the margin update.
_ADA_VAL = "(CASE feature WHEN 'quantity' THEN q WHEN 'discount' THEN dc ELSE tx END)"
_ADA_H = f"(pol * (CASE WHEN {_ADA_VAL} <= thr THEN 1 ELSE -1 END))"
_ADA_W = "exp(-margin)"
_ADA_UPD = f"(margin + alpha * CAST(y * {_ADA_H} AS DOUBLE))"
_ADA_ALPHA = "round(0.5 * ln((1.0 - eps) / eps), 6)"


def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost.M1 over decision stumps, 3 unrolled rounds: predict
    returned lineitems (l_returnflag = 'R' -> y = +1) from quantity /
    discount / tax against a fixed 18-candidate stump grid (3 features
    x 3 thresholds x 2 polarities). Emits one row per round: the
    chosen stump, its weighted error eps, its vote alpha, and the
    ensemble's 0/1 training error after that round.

    Determinism discipline: boosting weights are never materialized —
    w_i = exp(-margin_i) with margin_i = sum_t alpha_t y_i h_t(x_i)
    rebuilt from shared-text expressions, eps is rounded to 6 dp
    BEFORE both the argmin comparison and the alpha = ln((1-eps)/eps)
    transform, and ties break on (feature, thr, pol), so the greedy
    stump choice — the only data-dependent branch — is bit-identical
    across engines. Weighted sums go through DECIMAL (compat rule 1).

    Shape at scale: each round is ONE narrow aggregation pass over the
    fact table — the 18 candidate errors are 18 conditional DECIMAL
    aggregates computed in one whole-stage-codegen scan (NO 18x row
    expansion; the shuffle moves one sufficient-stat row per
    partition), and the round's training error rides in the same pass.
    Margin updates are single-row broadcast-join projections, so the
    whole fit is 4 scans of the data, each map-side-combined. The
    oracle keeps the equivalent crossJoin+groupBy formulation — the
    per-term DECIMAL quantization makes both layouts sum identically.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(-1).alias("y"),
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("dc"),
        F.col("l_tax").alias("tx"),
    )
    # NOT checkpointed, deliberately (r8 measured): the 4-column
    # pruned parquet scan each pass re-runs is CHEAPER than a
    # localCheckpoint write + 4 block-store re-reads (4.1-4.4 s/run
    # scan-based vs 5.1-5.7 s checkpointed at sf0.1) — the wall clock
    # here is the 19 decimal aggregates, not the scan, unlike
    # ml_gmm_em_1d where the obs frame is consumed by 4 heavyweight
    # passes and persisting won.
    feat_col = {"quantity": "q", "discount": "dc", "tax": "tx"}
    _TRAIN_ERR = (
        "round(CAST(SUM(CASE WHEN (CASE WHEN margin > 0 THEN 1 ELSE -1 END)"
        " <> y THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)"
    )

    def one_pass(data):
        """18 candidate errors + total weight + ensemble 0/1 error, in
        ONE aggregation (1-row checkpointed result). The per-row weight
        is cast to DECIMAL once in a projection — CASE-selecting the
        pre-cast decimal sums identically to the oracle's
        cast-the-CASE-result form, at 1/19th the exp()/cast work."""
        prj = data.select(
            "y",
            "q",
            "dc",
            "tx",
            "margin",
            F.expr("CAST(exp(-margin) AS DECIMAL(30,6))").alias("wd"),
        )
        aggs = []
        for i, (f, thr, pol) in enumerate(_ADA_CANDS):
            h = f"({pol} * (CASE WHEN {feat_col[f]} <= {thr} THEN 1 ELSE -1 END))"
            aggs.append(
                F.expr(
                    f"CAST(SUM(CASE WHEN {h} <> y THEN wd"
                    f" ELSE CAST(0.0 AS DECIMAL(30,6)) END) AS DOUBLE)"
                ).alias(f"err{i}")
            )
        aggs.append(F.expr("CAST(SUM(wd) AS DOUBLE)").alias("tot"))
        aggs.append(F.expr(_TRAIN_ERR).alias("train_err"))
        return prj.agg(*aggs).localCheckpoint()

    def pick_best(p):
        stumps = F.array(
            *[
                F.struct(
                    F.lit(f).alias("feature"),
                    F.lit(thr).alias("thr"),
                    F.lit(pol).alias("pol"),
                    F.col(f"err{i}").alias("err"),
                )
                for i, (f, thr, pol) in enumerate(_ADA_CANDS)
            ]
        )
        return (
            p.select(F.explode(stumps).alias("s"), "tot")
            .select("s.*", "tot")
            .withColumn("eps", F.round(F.col("err") / F.col("tot"), 6))
            .orderBy("eps", "feature", "thr", "pol")
            .limit(1)
            .withColumn("alpha", F.expr(_ADA_ALPHA))
            .select("feature", "thr", "pol", "eps", "alpha")
            .localCheckpoint()
        )

    data = li.withColumn("margin", F.lit(0.0))
    bests, accs = [], []
    for t in range(1, _ADA_ROUNDS + 1):
        p = one_pass(data)
        if t > 1:
            accs.append(p.select("train_err"))  # ensemble error after t-1
        bests.append(pick_best(p))
        data = data.crossJoin(F.broadcast(bests[-1])).select(
            "y", "q", "dc", "tx", F.expr(_ADA_UPD).alias("margin")
        )
    accs.append(data.agg(F.expr(_TRAIN_ERR).alias("train_err")))
    out = [
        best.select(
            F.lit(t).cast("long").alias("t"),
            "feature",
            "thr",
            "pol",
            "eps",
            "alpha",
        ).crossJoin(F.broadcast(acc))
        for t, (best, acc) in enumerate(zip(bests, accs), start=1)
    ]
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("t")


def _ada_sql() -> str:
    cands = ", ".join(
        f"('{f}', {thr}, {pol})" for f, thr, pol in _ADA_CANDS
    )
    ctes = [
        f"cands(feature, thr, pol) AS (VALUES {cands})",
        "d0 AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y, "
        "l_quantity AS q, l_discount AS dc, l_tax AS tx, 0.0 AS margin "
        "FROM lineitem)",
    ]
    selects = []
    for t in range(1, _ADA_ROUNDS + 1):
        p = t - 1
        ctes.append(
            f"""e{t} AS (
  SELECT feature, thr, pol,
         {dsum_sql(f'CASE WHEN {_ADA_H} <> y THEN {_ADA_W} ELSE 0.0 END')} AS err,
         {dsum_sql(_ADA_W)} AS tot
  FROM d{p} CROSS JOIN cands
  GROUP BY feature, thr, pol)"""
        )
        ctes.append(
            f"""b{t} AS (
  SELECT feature, thr, pol, eps, {_ADA_ALPHA} AS alpha
  FROM (SELECT *, round(err / tot, 6) AS eps FROM e{t})
  ORDER BY eps, feature, thr, pol LIMIT 1)"""
        )
        ctes.append(
            f"""d{t} AS (
  SELECT y, q, dc, tx, {_ADA_UPD} AS margin
  FROM d{p} CROSS JOIN b{t})"""
        )
        ctes.append(
            f"""a{t} AS (
  SELECT round(CAST(SUM(CASE WHEN (CASE WHEN margin > 0 THEN 1 ELSE -1 END) <> y
                             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS train_err
  FROM d{t})"""
        )
        selects.append(
            f"SELECT CAST({t} AS BIGINT) AS t, feature,"
            f" CAST(thr AS DOUBLE) AS thr, pol, eps, alpha,"
            f" train_err FROM b{t} CROSS JOIN a{t}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
        + "\nORDER BY t"
    )


QUERIES["ml_adaboost_stumps"] = ml_adaboost_stumps
ORACLE["ml_adaboost_stumps"] = _ada_sql()


# ---------------------------------------------------------------------------
# feat_uplift_split
# ---------------------------------------------------------------------------

# Shared closed-form texts over exact BIGINT cells
# (nt, st, nc, sc): rates, uplift, and its unpooled 95% CI.
_UPLIFT_PT = "(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))"
_UPLIFT_PC = "(CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))"
_UPLIFT = f"({_UPLIFT_PT} - {_UPLIFT_PC})"
_UPLIFT_SE = (
    f"sqrt({_UPLIFT_PT} * (1.0 - {_UPLIFT_PT}) / CAST(nt AS DOUBLE)"
    f" + {_UPLIFT_PC} * (1.0 - {_UPLIFT_PC}) / CAST(nc AS DOUBLE))"
)


def feat_uplift_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment uplift estimate from a deterministic 50/50 hash
    split: 'treated' customers are those whose md5(custkey) bucket is
    even-half — a reproducible assignment pure in the key (the same
    discipline as sample_hash_pct), so the A/B split survives retries,
    repartitioning, and engine changes. The outcome is late-period
    conversion (any order from 1997 on); uplift is the treated-minus-
    control conversion-rate difference per market segment with the
    unpooled two-proportion 95% CI.

    In a real campaign the assignment column comes from the experiment
    system; the hash split makes the operator self-contained and the
    expected uplift ~0 (null experiment), which the CI should bracket
    — pinned in tests.

    Shape: one groupBy(o_custkey) collapses orders to a conversion
    flag, one broadcast-friendly left join keeps zero-order customers
    in the cohort, and the 5-segment cell frame feeds shared-text
    closed forms. All counts are BIGINT-exact, so only the final
    rate/CI floats exist, computed identically in both engines.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        (
            F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 100
            < 50
        ).cast("long").alias("treated"),
    )
    conv = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(F.lit(1).alias("converted"))
    )
    j = cust.join(conv, cust.c_custkey == conv.o_custkey, "left").select(
        "c_mktsegment",
        "treated",
        F.coalesce(F.col("converted"), F.lit(0)).cast("long").alias("conv"),
    )
    cells = j.groupBy("c_mktsegment").agg(
        F.sum("treated").cast("long").alias("nt"),
        F.sum(F.col("treated") * F.col("conv")).cast("long").alias("st"),
        F.sum(1 - F.col("treated")).cast("long").alias("nc"),
        F.sum((1 - F.col("treated")) * F.col("conv")).cast("long").alias("sc"),
    )
    return cells.select(
        "c_mktsegment",
        "nt",
        "st",
        "nc",
        "sc",
        F.round(F.expr(_UPLIFT_PT), 6).alias("rate_t"),
        F.round(F.expr(_UPLIFT_PC), 6).alias("rate_c"),
        F.round(F.expr(_UPLIFT), 6).alias("uplift"),
        F.round(F.expr(f"{_UPLIFT} - 1.96 * {_UPLIFT_SE}"), 6).alias("ci_lo"),
        F.round(F.expr(f"{_UPLIFT} + 1.96 * {_UPLIFT_SE}"), 6).alias("ci_hi"),
    ).orderBy("c_mktsegment")


_UPLIFT_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                   % 100 < 50 THEN 1 ELSE 0 END AS treated
  FROM customer),
conv AS (
  SELECT o_custkey, 1 AS converted
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY o_custkey),
j AS (
  SELECT c.c_mktsegment, c.treated,
         CAST(COALESCE(v.converted, 0) AS BIGINT) AS conv
  FROM cust c LEFT JOIN conv v ON c.c_custkey = v.o_custkey),
cells AS (
  SELECT c_mktsegment,
         CAST(SUM(treated) AS BIGINT) AS nt,
         CAST(SUM(treated * conv) AS BIGINT) AS st,
         CAST(SUM(1 - treated) AS BIGINT) AS nc,
         CAST(SUM((1 - treated) * conv) AS BIGINT) AS sc
  FROM j GROUP BY c_mktsegment)
SELECT c_mktsegment, nt, st, nc, sc,
       round({_UPLIFT_PT}, 6) AS rate_t,
       round({_UPLIFT_PC}, 6) AS rate_c,
       round({_UPLIFT}, 6) AS uplift,
       round({_UPLIFT} - 1.96 * {_UPLIFT_SE}, 6) AS ci_lo,
       round({_UPLIFT} + 1.96 * {_UPLIFT_SE}, 6) AS ci_hi
FROM cells
ORDER BY c_mktsegment
"""

QUERIES["feat_uplift_split"] = feat_uplift_split
ORACLE["feat_uplift_split"] = _UPLIFT_SQL


# ---------------------------------------------------------------------------
# ml_confusion_threshold_sweep
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = [round(0.01 * i, 2) for i in range(0, 11)]
# Shared closed-form texts over exact BIGINT confusion cells.
_SWEEP_PREC = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
_SWEEP_REC = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
_SWEEP_F1 = (
    f"(CASE WHEN tp = 0 THEN 0.0 ELSE"
    f" 2.0 * {_SWEEP_PREC} * {_SWEEP_REC} / ({_SWEEP_PREC} + {_SWEEP_REC}) END)"
)


def ml_confusion_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation sweep: confusion matrix, precision,
    recall, and F1 at every threshold of an 11-point grid, scoring
    lineitem returns (y = l_returnflag = 'R') by discount — the
    operating-point table a practitioner reads before picking a
    production threshold (the curve-summary counterpart of
    ml_auc_roc's single scalar).

    Shape: ONE pass over the fact table against the broadcast 11-row
    threshold frame with map-side partial aggregation — the shuffle
    carries 11 sufficient-stat rows per partition. All cells are
    BIGINT-exact; precision/recall/F1 are shared-text closed forms
    (tp = 0 guards the F1 zero-denominator). Guaranteed degenerate
    rows (threshold 0.0 predicts everything positive) keep the sweep
    self-validating: recall = 1 there, pinned in tests.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_discount").alias("s"),
    )
    thr = F.broadcast(
        spark.createDataFrame([(t,) for t in _SWEEP_THRESHOLDS], "thr double")
    )
    cells = (
        li.crossJoin(thr)
        .withColumn("pred", (F.col("s") >= F.col("thr")).cast("long"))
        .groupBy("thr")
        .agg(
            F.sum(F.col("y") * F.col("pred")).cast("long").alias("tp"),
            F.sum((1 - F.col("y")) * F.col("pred")).cast("long").alias("fp"),
            F.sum(F.col("y") * (1 - F.col("pred"))).cast("long").alias("fn"),
            F.sum((1 - F.col("y")) * (1 - F.col("pred"))).cast("long").alias("tn"),
        )
    )
    return cells.select(
        "thr",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.expr(_SWEEP_PREC), 6).alias("precision"),
        F.round(F.expr(_SWEEP_REC), 6).alias("recall"),
        F.round(F.expr(_SWEEP_F1), 6).alias("f1"),
    ).orderBy("thr")


def _sweep_sql() -> str:
    vals = ", ".join(f"({t})" for t in _SWEEP_THRESHOLDS)
    return f"""
WITH li AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         l_discount AS s
  FROM lineitem),
thr(thr) AS (VALUES {vals}),
cells AS (
  SELECT thr,
         CAST(SUM(y * pred) AS BIGINT) AS tp,
         CAST(SUM((1 - y) * pred) AS BIGINT) AS fp,
         CAST(SUM(y * (1 - pred)) AS BIGINT) AS fn,
         CAST(SUM((1 - y) * (1 - pred)) AS BIGINT) AS tn
  FROM (SELECT y, thr, CASE WHEN s >= thr THEN 1 ELSE 0 END AS pred
        FROM li CROSS JOIN thr)
  GROUP BY thr)
SELECT CAST(thr AS DOUBLE) AS thr, tp, fp, fn, tn,
       round({_SWEEP_PREC}, 6) AS precision,
       round({_SWEEP_REC}, 6) AS recall,
       round({_SWEEP_F1}, 6) AS f1
FROM cells
ORDER BY thr
"""


QUERIES["ml_confusion_threshold_sweep"] = ml_confusion_threshold_sweep
ORACLE["ml_confusion_threshold_sweep"] = _sweep_sql()


# ---------------------------------------------------------------------------
# stat_anova_oneway + stat_pairwise_bonferroni
# ---------------------------------------------------------------------------

# One-way ANOVA from per-group DECIMAL sums: SSB = sum nj*mj^2 - N*m^2
# = a - s^2/N with a = sum(sj^2/nj); SSW = sum(ssj) - a.
_ANOVA_F = (
    "(((a - ss * ss / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))"
    " / ((q - a) / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))))"
)


def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic one-way ANOVA: does mean order value differ across the
    five market segments? (stat_brown_forsythe tests the VARIANCES;
    this is the companion test on the MEANS.)

    One co-partitioned join + one groupBy(segment) reduce the fact
    table to per-segment DECIMAL-exact (n, S, SS); the F statistic is
    a single shared-text closed form over those five rows. k is
    counted, not assumed.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("x"))
    )
    per = obs.groupBy("seg").agg(
        bcount().alias("nj"),
        dsum("x").alias("sj"),
        dsum(F.col("x") * F.col("x")).alias("ssj"),
    )
    suff = per.agg(
        bcount().alias("k"),
        F.sum("nj").cast("long").alias("nn"),
        dsum("sj").alias("ss"),
        dsum(F.col("sj") * F.col("sj") / F.col("nj").cast("double")).alias("a"),
        dsum("ssj").alias("q"),
    )
    return suff.select(
        "k", "nn", F.round(F.expr(_ANOVA_F), 6).alias("f_stat")
    )


_ANOVA_SQL = f"""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
per AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS nj,
         {dsum_sql('x')} AS sj,
         {dsum_sql('x * x')} AS ssj
  FROM obs GROUP BY seg),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(nj) AS BIGINT) AS nn,
         {dsum_sql('sj')} AS ss,
         {dsum_sql('sj * sj / CAST(nj AS DOUBLE)')} AS a,
         {dsum_sql('ssj')} AS q
  FROM per)
SELECT k, nn, round({_ANOVA_F}, 6) AS f_stat
FROM suff
"""

QUERIES["stat_anova_oneway"] = stat_anova_oneway
ORACLE["stat_anova_oneway"] = _ANOVA_SQL


# Pairwise mean contrast with Bonferroni-corrected 95% CI: 10 segment
# pairs -> per-comparison quantile 1 - 0.025/10; the normal quantile is
# a fixed literal (z for 0.9975 = 2.807033768343811) shared by both
# engines, and the pooled SE uses the per-segment variances.
_BONF_Z = "2.807033768343811"
_BONF_SE = "sqrt(va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE))"
_BONF_DIFF = "(ma - mb)"


def stat_pairwise_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 10 pairwise segment mean-revenue contrasts with
    Bonferroni-corrected 95% CIs (z for alpha/2/10) — the post-hoc
    table after stat_anova_oneway rejects. A pair is 'significant'
    when its corrected CI excludes zero; the knife-edge comparison
    runs on 6 dp-rounded bounds so it can't diverge across engines.

    Shape: the same one-shuffle per-segment sufficient stats as the
    ANOVA, then a 5x5 broadcast self-join (10 canonical pairs) of the
    tiny segment frame — per-pair means/variances derive from DECIMAL
    sums, the contrast math is shared-text.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("x"))
    )
    per = obs.groupBy("seg").agg(
        bcount().alias("n"),
        dsum("x").alias("s"),
        dsum(F.col("x") * F.col("x")).alias("ss"),
    ).select(
        "seg",
        "n",
        (F.col("s") / F.col("n").cast("double")).alias("m"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n").cast("double"))
            / (F.col("n").cast("double") - 1.0)
        ).alias("v"),
    )
    a = per.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = per.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    return pairs.select(
        "seg_a",
        "seg_b",
        F.round(F.expr(_BONF_DIFF), 6).alias("mean_diff"),
        F.round(F.expr(f"{_BONF_DIFF} - {_BONF_Z} * {_BONF_SE}"), 6).alias("ci_lo"),
        F.round(F.expr(f"{_BONF_DIFF} + {_BONF_Z} * {_BONF_SE}"), 6).alias("ci_hi"),
    ).withColumn(
        "significant",
        ((F.col("ci_lo") > 0.0) | (F.col("ci_hi") < 0.0)).cast("int"),
    ).orderBy("seg_a", "seg_b")


_BONF_SQL = f"""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
per0 AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS s,
         {dsum_sql('x * x')} AS ss
  FROM obs GROUP BY seg),
per AS (
  SELECT seg, n, s / CAST(n AS DOUBLE) AS m,
         (ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
  FROM per0),
pairs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b,
         a.n AS na, a.m AS ma, a.v AS va,
         b.n AS nb, b.m AS mb, b.v AS vb
  FROM per a JOIN per b ON a.seg < b.seg)
SELECT seg_a, seg_b,
       round({_BONF_DIFF}, 6) AS mean_diff,
       round({_BONF_DIFF} - {_BONF_Z} * {_BONF_SE}, 6) AS ci_lo,
       round({_BONF_DIFF} + {_BONF_Z} * {_BONF_SE}, 6) AS ci_hi,
       CAST(CASE WHEN round({_BONF_DIFF} - {_BONF_Z} * {_BONF_SE}, 6) > 0.0
                   OR round({_BONF_DIFF} + {_BONF_Z} * {_BONF_SE}, 6) < 0.0
                 THEN 1 ELSE 0 END AS INT) AS significant
FROM pairs
ORDER BY seg_a, seg_b
"""

QUERIES["stat_pairwise_bonferroni"] = stat_pairwise_bonferroni
ORACLE["stat_pairwise_bonferroni"] = _BONF_SQL


# ---------------------------------------------------------------------------
# ml_tree_depth2
# ---------------------------------------------------------------------------

_TREE_CANDS = [
    ("quantity", 10.0), ("quantity", 25.0), ("quantity", 40.0),
    ("discount", 0.02), ("discount", 0.05), ("discount", 0.08),
    ("tax", 0.02), ("tax", 0.04), ("tax", 0.06),
]
_TREE_VAL = "(CASE feature WHEN 'quantity' THEN q WHEN 'discount' THEN dc ELSE tx END)"
_TREE_LEFT = f"(CASE WHEN {_TREE_VAL} <= thr THEN 1 ELSE 0 END)"
# Weighted post-split gini over exact BIGINT cells (nl, pl, nr, pr),
# rounded 6 dp BEFORE the argmin so the greedy choice is engine-stable.
_TREE_SIDE_L = (
    "(CASE WHEN nl = 0 THEN 0.0 ELSE CAST(nl AS DOUBLE) * (1.0"
    " - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))"
    " * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))"
    " - (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))"
    " * (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))) END)"
)
_TREE_SIDE_R = (
    "(CASE WHEN nr = 0 THEN 0.0 ELSE CAST(nr AS DOUBLE) * (1.0"
    " - (CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))"
    " * (CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))"
    " - (CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE))"
    " * (CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE))) END)"
)
_TREE_SCORE = (
    f"round(({_TREE_SIDE_L} + {_TREE_SIDE_R}) / CAST(nl + nr AS DOUBLE), 6)"
)


def _tree_best_split(df, cands):
    """argmin weighted-gini candidate over ``df``: one crossJoin
    against the broadcast 9-row grid, BIGINT cells, 6 dp-rounded score,
    (score, feature, thr) tiebreak; 1-row checkpointed result."""
    j = df.crossJoin(cands).withColumn("lf", F.expr(_TREE_LEFT))
    per = j.groupBy("feature", "thr").agg(
        F.sum("lf").cast("long").alias("nl"),
        F.sum(F.col("lf") * F.col("y")).cast("long").alias("pl"),
        F.sum(1 - F.col("lf")).cast("long").alias("nr"),
        F.sum((1 - F.col("lf")) * F.col("y")).cast("long").alias("pr"),
    )
    return (
        per.withColumn("score", F.expr(_TREE_SCORE))
        .orderBy("score", "feature", "thr")
        .limit(1)
        .localCheckpoint()
    )


def ml_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy depth-2 CART-style decision tree predicting lineitem
    returns from quantity/discount/tax over a fixed 9-candidate split
    grid: root split by minimum weighted gini, then the best split
    per child, then four majority-vote leaves. Emits the 3 internal
    nodes (path, split, n, pos, post-split gini) and 4 leaves (path,
    n, pos, majority pred; ties predict 0).

    Greedy split choice — the only data-dependent branching — compares
    6 dp-rounded ginis from BIGINT cells with a (score, feature, thr)
    tiebreak, so it's bit-identical across engines (the adaboost
    discipline). Shape: THREE lineitem passes — root split, both child
    splits fused into one groupBy(side) pass, all four leaf counts
    fused into another (map-side partial agg; shuffles carry
    sufficient-stat rows only); chosen splits are 1-row checkpointed
    broadcast frames.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("dc"),
        F.col("l_tax").alias("tx"),
    )
    cands = F.broadcast(
        spark.createDataFrame(_TREE_CANDS, "feature string, thr double")
    )
    root = _tree_best_split(li, cands)
    # Round-11 shape: the old form ran SEVEN lineitem passes (root
    # split, one _tree_best_split per child, one count per leaf). The
    # child filters partition li, so both child split searches fuse
    # into ONE grouped pass keyed by the root side, and the four leaf
    # counts into one more — 3 passes total. The BIGINT cells per
    # (side, feature, thr) group equal the per-child cells exactly
    # (each row lands in exactly one side), so the dp-rounded argmin
    # and every emitted value are unchanged.
    rsplit = F.broadcast(
        root.select(F.col("feature").alias("rf"), F.col("thr").alias("rthr"))
    )
    root_left = F.expr(
        "(CASE rf WHEN 'quantity' THEN q WHEN 'discount' THEN dc ELSE tx END)"
        " <= rthr"
    )
    cells = (
        li.crossJoin(rsplit)
        .withColumn("side", root_left)
        .crossJoin(cands)
        .withColumn("lf", F.expr(_TREE_LEFT))
        .groupBy("side", "feature", "thr")
        .agg(
            F.sum("lf").cast("long").alias("nl"),
            F.sum(F.col("lf") * F.col("y")).cast("long").alias("pl"),
            F.sum(1 - F.col("lf")).cast("long").alias("nr"),
            F.sum((1 - F.col("lf")) * F.col("y")).cast("long").alias("pr"),
        )
        .localCheckpoint()  # 18 rows; both child argmins read it
    )

    def _best(side_val: bool):
        # No checkpoint: every consumer re-derives the 1-row argmin
        # from the 18-row in-memory cells checkpoint inside its own
        # plan — cheaper than an extra eager-checkpoint job each.
        return (
            cells.where(F.col("side") == F.lit(side_val))
            .drop("side")
            .withColumn("score", F.expr(_TREE_SCORE))
            .orderBy("score", "feature", "thr")
            .limit(1)
        )

    bl, br = _best(True), _best(False)

    def split_row(node, best):
        return best.select(
            F.lit(node).alias("node"),
            "feature",
            "thr",
            (F.col("nl") + F.col("nr")).alias("n"),
            (F.col("pl") + F.col("pr")).alias("pos"),
            F.col("score").alias("gini_after"),
            F.lit(None).cast("int").alias("pred"),
        )

    # One fused leaf pass: attach the winning child split per side (2
    # broadcast rows), group by (side, child-left). A template left
    # join reinstates any empty leaf as n=0/pos=0 — exactly what the
    # old global aggregate over an empty subset emitted.
    bsel = F.broadcast(
        bl.select(
            F.lit(True).alias("cside"),
            F.col("feature").alias("cf"),
            F.col("thr").alias("cthr"),
        ).unionByName(
            br.select(
                F.lit(False).alias("cside"),
                F.col("feature").alias("cf"),
                F.col("thr").alias("cthr"),
            )
        )
    )
    child_left = F.expr(
        "(CASE cf WHEN 'quantity' THEN q WHEN 'discount' THEN dc ELSE tx END)"
        " <= cthr"
    )
    counts = (
        li.crossJoin(rsplit)
        .withColumn("side", root_left)
        .join(bsel, F.col("side") == F.col("cside"))
        .withColumn("cleft", child_left)
        .groupBy("side", "cleft")
        .agg(
            bcount().alias("n"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("pos"),
        )
    )
    tmpl = spark.createDataFrame(
        [("LL", True, True), ("LR", True, False),
         ("RL", False, True), ("RR", False, False)],
        "node string, side boolean, cleft boolean",
    )
    leaves = (
        tmpl.join(counts, ["side", "cleft"], "left")
        .select(
            "node",
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("double").alias("thr"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("pos", F.lit(0)).cast("long").alias("pos"),
            F.lit(None).cast("double").alias("gini_after"),
        )
        .withColumn("pred", (F.col("pos") * 2 > F.col("n")).cast("int"))
    )
    parts = [
        split_row("root", root),
        split_row("L", bl),
        split_row("R", br),
        leaves,
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.orderBy("node")


def _tree_sql() -> str:
    cands = ", ".join(f"('{f}', {t})" for f, t in _TREE_CANDS)
    cells = f"""SELECT feature, thr,
         CAST(SUM({_TREE_LEFT}) AS BIGINT) AS nl,
         CAST(SUM({_TREE_LEFT} * y) AS BIGINT) AS pl,
         CAST(SUM(1 - {_TREE_LEFT}) AS BIGINT) AS nr,
         CAST(SUM((1 - {_TREE_LEFT}) * y) AS BIGINT) AS pr"""
    best = f"""SELECT feature, thr, nl, pl, nr, pr, {_TREE_SCORE} AS score
  FROM {{src}}
  ORDER BY {_TREE_SCORE}, feature, thr LIMIT 1"""
    leaf = """SELECT '{node}' AS node, CAST(NULL AS VARCHAR) AS feature,
       CAST(NULL AS DOUBLE) AS thr,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(y), 0) AS BIGINT) AS pos,
       CAST(NULL AS DOUBLE) AS gini_after,
       CAST(CASE WHEN COALESCE(SUM(y), 0) * 2 > COUNT(*)
                 THEN 1 ELSE 0 END AS INT) AS pred
FROM {src}"""
    split = """SELECT '{node}' AS node, feature, thr, nl + nr AS n,
       pl + pr AS pos, score AS gini_after, CAST(NULL AS INT) AS pred
FROM {src}"""
    return f"""
WITH cands(feature, thr) AS (VALUES {cands}),
d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             l_quantity AS q, l_discount AS dc, l_tax AS tx
      FROM lineitem),
re AS ({cells} FROM d CROSS JOIN cands GROUP BY feature, thr),
rb AS ({best.format(src='re')}),
dl AS (SELECT d.* FROM d CROSS JOIN rb WHERE {_TREE_VAL} <= thr),
dr AS (SELECT d.* FROM d CROSS JOIN rb WHERE NOT ({_TREE_VAL} <= thr)),
le AS ({cells} FROM dl CROSS JOIN cands GROUP BY feature, thr),
lb AS ({best.format(src='le')}),
rre AS ({cells} FROM dr CROSS JOIN cands GROUP BY feature, thr),
rrb AS ({best.format(src='rre')}),
dll AS (SELECT dl.* FROM dl CROSS JOIN lb WHERE {_TREE_VAL} <= thr),
dlr AS (SELECT dl.* FROM dl CROSS JOIN lb WHERE NOT ({_TREE_VAL} <= thr)),
drl AS (SELECT dr.* FROM dr CROSS JOIN rrb WHERE {_TREE_VAL} <= thr),
drr AS (SELECT dr.* FROM dr CROSS JOIN rrb WHERE NOT ({_TREE_VAL} <= thr))
{split.format(node='root', src='rb')}
UNION ALL {split.format(node='L', src='lb')}
UNION ALL {split.format(node='R', src='rrb')}
UNION ALL {leaf.format(node='LL', src='dll')}
UNION ALL {leaf.format(node='LR', src='dlr')}
UNION ALL {leaf.format(node='RL', src='drl')}
UNION ALL {leaf.format(node='RR', src='drr')}
ORDER BY node
"""


QUERIES["ml_tree_depth2"] = ml_tree_depth2
ORACLE["ml_tree_depth2"] = _tree_sql()


# ---------------------------------------------------------------------------
# stat_power_curve
# ---------------------------------------------------------------------------

_POWER_EFFECTS = [2000.0, 4000.0, 6000.0, 8000.0, 10000.0]
_Z_ALPHA2 = "1.959963984540054"  # Phi^-1(0.975), fixed literal


def _phi(x: str) -> str:
    """Shared-text standard normal CDF via the A&S tail: Phi(x) =
    1 - tail/2 for x >= 0, tail/2 otherwise (tail = two-sided p of
    |x|)."""
    half = f"({_p_two_sided(f'abs({x})')} / 2.0)"
    return f"(CASE WHEN {x} >= 0.0 THEN 1.0 - {half} ELSE {half} END)"


def stat_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample power curve for the BUILDING-vs-MACHINERY order-value
    comparison: for a grid of absolute effect sizes, the probability a
    two-sided alpha = 0.05 z-test detects the shift at the CURRENT
    sample sizes and pooled spread — the experiment-planning readout
    ('how big a shift could this A/B even see?').

    power = Phi(es/SE - z_a/2) with SE = sd_pooled*sqrt(1/n1 + 1/n2);
    sd comes from DECIMAL-exact sums and is rounded 6 dp before use,
    the grid joins as a broadcast 5-row frame, and Phi is the shared
    A&S text — so the whole curve is closed-form engine-stable.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .where(F.col("c_mktsegment").isin(*_MW_SEGS))
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_totalprice").alias("x"),
            (F.col("c_mktsegment") == _MW_SEGS[0]).cast("long").alias("in1"),
        )
    )
    suff = obs.agg(
        F.sum("in1").cast("long").alias("n1"),
        bcount().alias("n"),
        dsum("x").alias("s"),
        dsum(F.col("x") * F.col("x")).alias("ss"),
    ).select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        "n",
        F.round(
            F.expr(
                "sqrt((ss - s * s / CAST(n AS DOUBLE))"
                " / (CAST(n AS DOUBLE) - 2.0))"
            ),
            6,
        ).alias("sd"),
    )
    es = F.broadcast(
        spark.createDataFrame([(e,) for e in _POWER_EFFECTS], "effect double")
    )
    curve = suff.crossJoin(es).withColumn(
        "se",
        F.round(
            F.expr(
                "sd * sqrt(1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))"
            ),
            6,
        ),
    )
    zb = f"(effect / se - {_Z_ALPHA2})"
    return curve.select(
        "effect",
        "n1",
        "n2",
        "se",
        F.round(F.expr(_phi(zb)), 6).alias("power"),
    ).orderBy("effect")


def _power_sql() -> str:
    vals = ", ".join(f"({e})" for e in _POWER_EFFECTS)
    zb = f"(effect / se - {_Z_ALPHA2})"
    return f"""
WITH obs AS (
  SELECT o.o_totalprice AS x,
         CASE WHEN c.c_mktsegment = '{_MW_SEGS[0]}' THEN 1 ELSE 0 END AS in1
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{_MW_SEGS[0]}', '{_MW_SEGS[1]}')),
suff AS (
  SELECT CAST(SUM(in1) AS BIGINT) AS n1,
         CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS s,
         {dsum_sql('x * x')} AS ss
  FROM obs),
sd AS (
  SELECT n1, n - n1 AS n2, n,
         round(sqrt((ss - s * s / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 2.0)), 6) AS sd
  FROM suff),
es(effect) AS (VALUES {vals}),
curve AS (
  SELECT effect, n1, n2,
         round(sd * sqrt(1.0 / CAST(n1 AS DOUBLE)
               + 1.0 / CAST(n2 AS DOUBLE)), 6) AS se
  FROM sd CROSS JOIN es)
SELECT CAST(effect AS DOUBLE) AS effect, n1, n2, se,
       round({_phi(zb)}, 6) AS power
FROM curve
ORDER BY effect
"""


QUERIES["stat_power_curve"] = stat_power_curve
ORACLE["stat_power_curve"] = _power_sql()


# ---------------------------------------------------------------------------
# ml_gmm_em_1d
# ---------------------------------------------------------------------------

_GMM_ITERS = 3


def _gmm_g(mu: str, var: str) -> str:
    """Unnormalized Gaussian density text (the 1/sqrt(2 pi) cancels in
    the responsibility ratio)."""
    return f"(exp(-((x - {mu}) * (x - {mu})) / (2.0 * {var})) / sqrt({var}))"


# Responsibility of component 1, quantized to 9 dp: r1 is the ONLY
# value whose low bits depend on libm exp(); rounding it pins every
# downstream product/sum to identical doubles in both engines (the
# per-term 1e10-magnitude M-step sums would otherwise sit exactly on
# the DECIMAL rounding grid).
_GMM_R1 = (
    f"round((w1 * {_gmm_g('mu1', 'v1')})"
    f" / (w1 * {_gmm_g('mu1', 'v1')}"
    f" + (1.0 - w1) * {_gmm_g('mu2', 'v2')}), 9)"
)
# M-step closed forms over the DECIMAL-exact E sums.
_GMM_STEP = {
    "w1": "round(sr1 / CAST(n AS DOUBLE), 6)",
    "mu1": "round(sx1 / sr1, 6)",
    "v1": "round(sxx1 / sr1 - (sx1 / sr1) * (sx1 / sr1), 6)",
    "mu2": "round(sx2 / sr2, 6)",
    "v2": "round(sxx2 / sr2 - (sx2 / sr2) * (sx2 / sr2), 6)",
}


def ml_gmm_em_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed EM for a 2-component 1-D Gaussian mixture over
    order values, 3 unrolled iterations — soft clustering where
    k-means' hard assignment misleads (overlapping price regimes).
    Emits the parameter trajectory: one row per iteration with
    (w1, mu1, v1, mu2, v2).

    Determinism ladder: (1) init is mean +- sd from DECIMAL-exact
    moments, 6 dp; (2) each E-step responsibility is quantized to 9 dp
    (the only libm-dependent value), so every M-step product and
    DECIMAL sum is bit-identical; (3) each M-step parameter rounds to
    6 dp before the next iteration. The E+M pair is ONE aggregation
    pass over the fact table against the broadcast 1-row parameter
    frame — 3 iterations = 3 linear scans, map-side combined.
    """
    # Work in PRICE-MILLIONS: DECIMAL(30,6) quantization of a double is
    # only unambiguous while |v| < ~4e9 (above that the double's ulp
    # exceeds the 1e-6 grid and the double->decimal cast becomes
    # representation-dependent across engines — caught live on the
    # r*x^2 sums). Scaling x to ~0.1-0.6 keeps every term far inside
    # the safe range; all emitted parameters are in scaled units.
    # Persist the single-column observation frame: the init stats plus
    # 3 EM iterations are 4 full passes, and re-reading + re-decoding
    # the orders parquet each pass is what pushed the 40x point toward
    # the local heap (SCALE_SMOKE r6). One double per row, so the
    # cached frame is ~100x smaller than the source table — the
    # canonical iterative-ML caching discipline (MEMORY_AND_DISK
    # spills gracefully on a cluster).
    from pyspark import StorageLevel

    obs = (
        load_table(spark, sf_dir, "orders")
        .select((F.col("o_totalprice") / F.lit(1000000.0)).alias("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = obs.agg(
        bcount().alias("n"), dsum("x").alias("s"), dsum(F.col("x") * F.col("x")).alias("ss")
    )
    p = stats.select(
        F.lit(0.5).alias("w1"),
        F.expr(
            "round(s / CAST(n AS DOUBLE)"
            " - sqrt((ss - s * s / CAST(n AS DOUBLE))"
            " / (CAST(n AS DOUBLE) - 1.0)), 6)"
        ).alias("mu1"),
        F.expr(
            "round((ss - s * s / CAST(n AS DOUBLE))"
            " / (CAST(n AS DOUBLE) - 1.0), 6)"
        ).alias("v1"),
        F.expr(
            "round(s / CAST(n AS DOUBLE)"
            " + sqrt((ss - s * s / CAST(n AS DOUBLE))"
            " / (CAST(n AS DOUBLE) - 1.0)), 6)"
        ).alias("mu2"),
        F.expr(
            "round((ss - s * s / CAST(n AS DOUBLE))"
            " / (CAST(n AS DOUBLE) - 1.0), 6)"
        ).alias("v2"),
    ).localCheckpoint()
    trajectory = []
    for it in range(1, _GMM_ITERS + 1):
        j = obs.crossJoin(F.broadcast(p)).withColumn("r1", F.expr(_GMM_R1))
        e = j.agg(
            bcount().alias("n"),
            dsum("r1").alias("sr1"),
            dsum(F.col("r1") * F.col("x")).alias("sx1"),
            dsum(F.col("r1") * F.col("x") * F.col("x")).alias("sxx1"),
            dsum(1.0 - F.col("r1")).alias("sr2"),
            dsum((1.0 - F.col("r1")) * F.col("x")).alias("sx2"),
            dsum((1.0 - F.col("r1")) * F.col("x") * F.col("x")).alias("sxx2"),
        )
        p = e.select(
            *[F.expr(expr).alias(name) for name, expr in _GMM_STEP.items()]
        ).localCheckpoint()
        trajectory.append(
            p.select(F.lit(it).cast("long").alias("iter"), "w1", "mu1", "v1", "mu2", "v2")
        )
    res = trajectory[0]
    for df in trajectory[1:]:
        res = res.unionByName(df)
    # Every trajectory row selects from a localCheckpointed parameter
    # frame, so obs is not in the result lineage — safe to release now.
    obs.unpersist()
    return res.orderBy("iter")


def _gmm_sql() -> str:
    init = """
obs AS (SELECT o_totalprice / 1000000.0 AS x FROM orders),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {s} AS s, {ss} AS ss
  FROM obs),
p0 AS (
  SELECT 0.5 AS w1,
         round(s / CAST(n AS DOUBLE)
           - sqrt((ss - s * s / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0)), 6) AS mu1,
         round((ss - s * s / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0), 6) AS v1,
         round(s / CAST(n AS DOUBLE)
           + sqrt((ss - s * s / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0)), 6) AS mu2,
         round((ss - s * s / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0), 6) AS v2
  FROM st)""".format(s=dsum_sql("x"), ss=dsum_sql("x * x"))
    ctes = [init]
    prev = "p0"
    for it in range(1, _GMM_ITERS + 1):
        ctes.append(
            f"""
e{it} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('r1')} AS sr1,
         {dsum_sql('r1 * x')} AS sx1,
         {dsum_sql('r1 * x * x')} AS sxx1,
         {dsum_sql('1.0 - r1')} AS sr2,
         {dsum_sql('(1.0 - r1) * x')} AS sx2,
         {dsum_sql('(1.0 - r1) * x * x')} AS sxx2
  FROM (SELECT x, {_GMM_R1} AS r1 FROM obs CROSS JOIN {prev})),
p{it} AS (
  SELECT {', '.join(f'{expr} AS {name}' for name, expr in _GMM_STEP.items())}
  FROM e{it})"""
        )
        prev = f"p{it}"
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({it} AS BIGINT) AS iter, w1, mu1, v1, mu2, v2 FROM p{it}"
        for it in range(1, _GMM_ITERS + 1)
    )
    return "WITH " + ",".join(ctes) + "\n" + rows + "\nORDER BY iter"


QUERIES["ml_gmm_em_1d"] = ml_gmm_em_1d
ORACLE["ml_gmm_em_1d"] = _gmm_sql()


# ---------------------------------------------------------------------------
# ml_als_user_step
# ---------------------------------------------------------------------------

_ALS_LAMBDA = "0.1"
# Deterministic 3-decimal item factors in [-0.5, 0.5): md5 buckets of
# "brand|dim" — anchored decimals, so every downstream product is an
# exact DECIMAL value.
_ALS_FACTOR = (
    "(CAST(('0x' || substr(md5(p_brand || '|{d}'), 1, 8))::BIGINT % 1000"
    " AS DOUBLE) / 1000.0 - 0.5)"
)
_ALS_FACTOR_SPARK = (
    "(CAST(conv(substring(md5(concat(p_brand, '|{d}')), 1, 8), 16, 10) % 1000"
    " AS DOUBLE) / 1000.0 - 0.5)"
)
# Closed-form 2x2 ridge solve over per-user sums
# (a11 = S f1^2 + lambda, a12 = S f1 f2, a22 = S f2^2 + lambda,
#  b1 = S f1 r, b2 = S f2 r).
_ALS_DET = (
    f"((s11 + {_ALS_LAMBDA}) * (s22 + {_ALS_LAMBDA}) - s12 * s12)"
)
_ALS_U1 = f"(((s22 + {_ALS_LAMBDA}) * b1 - s12 * b2) / {_ALS_DET})"
_ALS_U2 = f"(((s11 + {_ALS_LAMBDA}) * b2 - s12 * b1) / {_ALS_DET})"


def ml_als_user_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step for rank-2 matrix factorization of the
    customer x brand purchase matrix: item (brand) factors are fixed
    deterministic values, and every customer's factor pair solves its
    2x2 ridge normal equations in closed form — the distributed least
    squares update at the heart of ALS recommenders, expressed without
    any iteration or RNG.

    Determinism: item factors are md5-anchored 3-decimal values, and
    ratings are integer counts, so every per-user sum is an EXACT
    DECIMAL (no float discipline needed until the final closed-form
    solve, which is a shared-text expression). Shape: one orderkey
    join, one (custkey, brand) collapse, a broadcast 25-row factor
    join, then the per-customer solve rides the same custkey
    aggregation — two fact shuffles total.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "p_brand")
        .agg(bcount().alias("r"))
    )
    factors = (
        load_table(spark, sf_dir, "part")
        .select("p_brand")
        .distinct()
        .select(
            "p_brand",
            F.expr(_ALS_FACTOR_SPARK.format(d=1)).alias("f1"),
            F.expr(_ALS_FACTOR_SPARK.format(d=2)).alias("f2"),
        )
    )
    j = ratings.join(F.broadcast(factors), "p_brand")
    suff = j.groupBy("o_custkey").agg(
        bcount().alias("n_brands"),
        dsum(F.col("f1") * F.col("f1")).alias("s11"),
        dsum(F.col("f1") * F.col("f2")).alias("s12"),
        dsum(F.col("f2") * F.col("f2")).alias("s22"),
        dsum(F.col("f1") * F.col("r")).alias("b1"),
        dsum(F.col("f2") * F.col("r")).alias("b2"),
    )
    return suff.select(
        "o_custkey",
        "n_brands",
        F.round(F.expr(_ALS_U1), 6).alias("u1"),
        F.round(F.expr(_ALS_U2), 6).alias("u2"),
    ).orderBy("o_custkey")


_ALS_SQL = f"""
WITH ratings AS (
  SELECT o.o_custkey, p.p_brand, CAST(COUNT(*) AS BIGINT) AS r
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
factors AS (
  SELECT p_brand,
         {_ALS_FACTOR.format(d=1)} AS f1,
         {_ALS_FACTOR.format(d=2)} AS f2
  FROM (SELECT DISTINCT p_brand FROM part)),
suff AS (
  SELECT r.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_brands,
         {dsum_sql('f1 * f1')} AS s11,
         {dsum_sql('f1 * f2')} AS s12,
         {dsum_sql('f2 * f2')} AS s22,
         {dsum_sql('f1 * r')} AS b1,
         {dsum_sql('f2 * r')} AS b2
  FROM ratings r JOIN factors f ON r.p_brand = f.p_brand
  GROUP BY r.o_custkey)
SELECT o_custkey, n_brands,
       round({_ALS_U1}, 6) AS u1,
       round({_ALS_U2}, 6) AS u2
FROM suff
ORDER BY o_custkey
"""

QUERIES["ml_als_user_step"] = ml_als_user_step
ORACLE["ml_als_user_step"] = _ALS_SQL


# ---------------------------------------------------------------------------
# stat_spearman_corr
# ---------------------------------------------------------------------------


def _bucketed_midranks(df, col: str, width: float):
    """Value -> 2*midrank (exact BIGINT) over ``df[col]``, computed with
    the deterministic value-bucket prefix sum (floor(v/width) buckets, a
    pure function of the data): groupBy the value, per-bucket counts
    feed a tiny offset window, the data-sized window runs per bucket.
    2*midrank = 2*cum_before + tie_count + 1."""
    vals = df.groupBy(F.col(col).alias("v")).agg(bcount().alias("tv"))
    vals = vals.withColumn(
        "bkt", F.floor(F.col("v") / F.lit(width)).cast("long")
    )
    boff = (
        vals.groupBy("bkt")
        .agg(F.sum("tv").alias("btv"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btv").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "boff")
    )
    wloc = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        vals.join(F.broadcast(boff), "bkt")
        .withColumn("cumb", F.col("boff") + F.sum("tv").over(wloc) - F.col("tv"))
        .select(
            "v", (2 * F.col("cumb") + F.col("tv") + 1).cast("long").alias("mr2")
        )
    )


def _midrank_sql(src: str, col: str) -> str:
    """DuckDB twin of :func:`_bucketed_midranks` (plain global window —
    the oracle side has no distribution concern)."""
    return f"""
  SELECT v, 2 * (SUM(tv) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv)
           + tv + 1 AS mr2
  FROM (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS tv
        FROM {src} GROUP BY 1)"""


_SPEARMAN_RHO = (
    "((CAST(n AS DOUBLE) * sxy - sx * sy)"
    " / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
    " * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)))"
)


def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between order value and the
    customer's account balance — the monotone-association test that
    ignores the price distribution's heavy tail (Pearson's blind spot).

    Midranks (tie-aware) for BOTH variables come from the
    deterministic value-bucket prefix sum; doubled midranks are exact
    BIGINTs, so every sufficient sum is exact DECIMAL and rho is one
    shared-text closed form. Shape: two value collapses + two
    co-partitioned joins back onto the pair frame, then one aggregate.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pairs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("o_totalprice").alias("xv"), F.col("c_acctbal").alias("yv"))
    )
    rx = _bucketed_midranks(pairs, "xv", 256.0).select(
        F.col("v").alias("xv"), F.col("mr2").alias("mrx")
    )
    ry = _bucketed_midranks(pairs, "yv", 64.0).select(
        F.col("v").alias("yv"), F.col("mr2").alias("mry")
    )
    ranked = pairs.join(rx, "xv").join(ry, "yv").select(
        F.col("mrx").cast("double").alias("x"), F.col("mry").cast("double").alias("y")
    )
    suff = ranked.agg(
        bcount().alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    return suff.select("n", F.round(F.expr(_SPEARMAN_RHO), 6).alias("spearman_rho"))


_SPEARMAN_SQL = f"""
WITH pairs AS (
  SELECT o.o_totalprice AS xv, c.c_acctbal AS yv
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
rx AS ({_midrank_sql('pairs', 'xv')}),
ry AS ({_midrank_sql('pairs', 'yv')}),
ranked AS (
  SELECT CAST(rx.mr2 AS DOUBLE) AS x, CAST(ry.mr2 AS DOUBLE) AS y
  FROM pairs
  JOIN rx ON pairs.xv = rx.v
  JOIN ry ON pairs.yv = ry.v),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy,
         {dsum_sql('x * x')} AS sxx,
         {dsum_sql('y * y')} AS syy
  FROM ranked)
SELECT n, round({_SPEARMAN_RHO}, 6) AS spearman_rho
FROM suff
"""

QUERIES["stat_spearman_corr"] = stat_spearman_corr
ORACLE["stat_spearman_corr"] = _SPEARMAN_SQL


# ---------------------------------------------------------------------------
# agg_robust_means
# ---------------------------------------------------------------------------


def agg_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimates for order value: the 5%-winsorized
    mean (tails clamped to the exact 5th/95th order statistics) and the
    5% trimmed mean (tails dropped) next to the raw mean — the
    outlier-resistant KPIs a reporting layer wants when a few whale
    orders move the naive average.

    Order statistics are EXACT lower-kth elements (k = ceil(q*n),
    integer arithmetic) located on the distinct-value table via the
    deterministic value-bucket prefix sum — no sort of the fact table,
    no interpolation ambiguity. Winsorized/trimmed sums weight each
    distinct value by exact integer copy counts, so everything is
    anchored DECIMAL until the final divisions.
    """
    obs = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("xv")
    )
    vt = obs.groupBy(F.col("xv").alias("v")).agg(bcount().alias("tv"))
    vt = vt.withColumn("bkt", F.floor(F.col("v") / F.lit(256.0)).cast("long"))
    boff = (
        vt.groupBy("bkt")
        .agg(F.sum("tv").alias("btv"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btv").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "boff")
    )
    wloc = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    vt = vt.join(F.broadcast(boff), "bkt").withColumn(
        "cumb", F.col("boff") + F.sum("tv").over(wloc) - F.col("tv")
    )
    tot = vt.agg(F.sum("tv").cast("long").alias("n")).select(
        "n",
        F.expr("(5 * n + 99) DIV 100").alias("k05"),
        F.expr("(95 * n + 99) DIV 100").alias("k95"),
    )
    j = vt.crossJoin(F.broadcast(tot))
    thr = j.agg(
        F.max("n").cast("long").alias("n"),
        F.max("k05").alias("k05"),
        F.max("k95").alias("k95"),
        F.min(F.when(F.col("cumb") + F.col("tv") >= F.col("k05"), F.col("v"))).alias(
            "lo"
        ),
        F.min(F.when(F.col("cumb") + F.col("tv") >= F.col("k95"), F.col("v"))).alias(
            "hi"
        ),
    )
    k = vt.crossJoin(F.broadcast(thr))
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cumb") + F.col("tv"), F.col("k95"))
        - F.greatest(F.col("cumb"), F.col("k05")),
    )
    clamp = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    out = k.agg(
        F.max("n").cast("long").alias("n"),
        F.max("lo").alias("p05"),
        F.max("hi").alias("p95"),
        dsum(F.col("v") * F.col("tv").cast("double")).alias("sraw"),
        dsum(clamp * F.col("tv").cast("double")).alias("swin"),
        dsum(F.col("v") * kept.cast("double")).alias("strim"),
        F.sum(kept).cast("long").alias("ntrim"),
    )
    return out.select(
        "n",
        "p05",
        "p95",
        F.round(F.expr("sraw / CAST(n AS DOUBLE)"), 6).alias("raw_mean"),
        F.round(F.expr("swin / CAST(n AS DOUBLE)"), 6).alias("winsorized_mean"),
        F.round(F.expr("strim / CAST(ntrim AS DOUBLE)"), 6).alias("trimmed_mean"),
    )


_ROBUST_MEANS_SQL = f"""
WITH vt AS (
  SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS tv
  FROM orders GROUP BY 1),
cum AS (
  SELECT *, SUM(tv) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS cumb
  FROM vt),
tot AS (
  SELECT CAST(SUM(tv) AS BIGINT) AS n,
         (5 * CAST(SUM(tv) AS BIGINT) + 99) // 100 AS k05,
         (95 * CAST(SUM(tv) AS BIGINT) + 99) // 100 AS k95
  FROM vt),
thr AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(k05) AS k05, MAX(k95) AS k95,
         MIN(CASE WHEN cumb + tv >= k05 THEN v END) AS lo,
         MIN(CASE WHEN cumb + tv >= k95 THEN v END) AS hi
  FROM cum CROSS JOIN tot),
k AS (SELECT cum.*, thr.* FROM cum CROSS JOIN thr),
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(lo) AS p05, MAX(hi) AS p95,
         {dsum_sql('v * CAST(tv AS DOUBLE)')} AS sraw,
         {dsum_sql('LEAST(GREATEST(v, lo), hi) * CAST(tv AS DOUBLE)')} AS swin,
         {dsum_sql('v * CAST(GREATEST(CAST(0 AS BIGINT), LEAST(cumb + tv, k95) - GREATEST(cumb, k05)) AS DOUBLE)')} AS strim,
         CAST(SUM(GREATEST(CAST(0 AS BIGINT),
              LEAST(cumb + tv, k95) - GREATEST(cumb, k05))) AS BIGINT) AS ntrim
  FROM k)
SELECT n, p05, p95,
       round(sraw / CAST(n AS DOUBLE), 6) AS raw_mean,
       round(swin / CAST(n AS DOUBLE), 6) AS winsorized_mean,
       round(strim / CAST(ntrim AS DOUBLE), 6) AS trimmed_mean
FROM agg
"""

QUERIES["agg_robust_means"] = agg_robust_means
ORACLE["agg_robust_means"] = _ROBUST_MEANS_SQL


# ---------------------------------------------------------------------------
# feat_weibull_fit
# ---------------------------------------------------------------------------

# Weibull probability-plot regression: y = ln(-ln(1 - F)) on x = ln(g),
# median-rank plotting positions F = (i - 0.3)/(n + 0.4). x and y are
# quantized 6 dp before the OLS sums (ln libm discipline).
_WEIB_SHAPE = (
    "round((CAST(n AS DOUBLE) * sxy - sx * sy)"
    " / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)"
)
_WEIB_SCALE = "round(exp(-((sy - shape * sx) / CAST(n AS DOUBLE)) / shape), 6)"


def feat_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull reliability fit for inter-order gaps (days between a
    customer's consecutive orders): median-rank probability-plot
    regression — the classic closed-form Weibull estimator (shape < 1
    reads as 'churn hazard decreases with tenure', > 1 as wear-out).
    Complements feat_kaplan_meier's nonparametric curve with a
    2-parameter model.

    Ranks are tie-averaged midranks from the value-bucket prefix sum
    over the INTEGER gap domain (bounded, so the value table is tiny);
    plotting positions, ln transforms and the OLS solve are shared
    closed-form text over 6 dp-quantized coordinates.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    gaps = (
        o.withColumn("g", F.datediff(F.col("d"), F.lag("d", 1).over(w)))
        .where(F.col("g").isNotNull() & (F.col("g") >= 1))
        .select(F.col("g").cast("long").alias("g"))
    )
    vt = gaps.groupBy(F.col("g").alias("v")).agg(bcount().alias("tv"))
    # integer domain (days) is bounded: a plain ordered window over the
    # distinct-gap table is already metadata-scale
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vt = vt.withColumn("cumb", F.sum("tv").over(wv) - F.col("tv"))
    n_tot = vt.agg(F.sum("tv").cast("long").alias("n"))
    pts = vt.crossJoin(F.broadcast(n_tot)).select(
        "tv",
        F.round(F.log(F.col("v").cast("double")), 6).alias("x"),
        F.round(
            F.expr(
                "ln(-ln(1.0 - ((CAST(cumb AS DOUBLE)"
                " + (CAST(tv AS DOUBLE) + 1.0) / 2.0) - 0.3)"
                " / (CAST(n AS DOUBLE) + 0.4)))"
            ),
            6,
        ).alias("y"),
    )
    suff = pts.agg(
        F.sum("tv").cast("long").alias("n2"),
        dsum(F.col("x") * F.col("tv").cast("double")).alias("sx"),
        dsum(F.col("y") * F.col("tv").cast("double")).alias("sy"),
        dsum(F.col("x") * F.col("y") * F.col("tv").cast("double")).alias("sxy"),
        dsum(F.col("x") * F.col("x") * F.col("tv").cast("double")).alias("sxx"),
    ).withColumnRenamed("n2", "n")
    return (
        suff.withColumn("shape", F.expr(_WEIB_SHAPE))
        .select(
            "n",
            "shape",
            F.expr(_WEIB_SCALE).alias("scale_days"),
        )
    )


_WEIBULL_SQL = f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
gaps AS (
  SELECT CAST(date_diff('day',
           LAG(d) OVER (PARTITION BY o_custkey ORDER BY d), d) AS BIGINT) AS g
  FROM o),
gg AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g >= 1),
vt AS (
  SELECT g AS v, CAST(COUNT(*) AS BIGINT) AS tv FROM gg GROUP BY 1),
cum AS (
  SELECT *, SUM(tv) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS cumb
  FROM vt),
nt AS (SELECT CAST(SUM(tv) AS BIGINT) AS n FROM vt),
pts AS (
  SELECT tv,
         round(ln(CAST(v AS DOUBLE)), 6) AS x,
         round(ln(-ln(1.0 - ((CAST(cumb AS DOUBLE)
               + (CAST(tv AS DOUBLE) + 1.0) / 2.0) - 0.3)
               / (CAST(n AS DOUBLE) + 0.4))), 6) AS y
  FROM cum CROSS JOIN nt),
suff AS (
  SELECT CAST(SUM(tv) AS BIGINT) AS n,
         {dsum_sql('x * CAST(tv AS DOUBLE)')} AS sx,
         {dsum_sql('y * CAST(tv AS DOUBLE)')} AS sy,
         {dsum_sql('x * y * CAST(tv AS DOUBLE)')} AS sxy,
         {dsum_sql('x * x * CAST(tv AS DOUBLE)')} AS sxx
  FROM pts)
SELECT n, shape, {_WEIB_SCALE} AS scale_days
FROM (SELECT *, {_WEIB_SHAPE} AS shape FROM suff)
"""

QUERIES["feat_weibull_fit"] = feat_weibull_fit
ORACLE["feat_weibull_fit"] = _WEIBULL_SQL


# ---------------------------------------------------------------------------
# ml_pinball_quantile_eval
# ---------------------------------------------------------------------------

_PINBALL_TAU = "0.9"
_PINBALL_QS = (50, 75, 90)


def ml_pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-loss (pinball) evaluation at tau = 0.9: per market
    segment, score three constant predictors — the exact P50, P75 and
    P90 order statistics of order value — under the pinball loss.
    The P90 candidate must win (the tau-quantile minimizes pinball
    loss), pinned in tests; this is the evaluation harness quantile
    forecasts are graded with.

    Quantiles are exact lower-ceil(q*n)-th elements per segment from
    the (segment, value-bucket) prefix sum — no fact sort, no
    interpolation; losses are anchored-decimal sums (prices in
    MILLIONS per the 4e9 rule) with a shared-text mean.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice") / F.lit(1000000.0)).alias("y"),
        )
    )
    vt = obs.groupBy("seg", F.col("y").alias("v")).agg(bcount().alias("tv"))
    vt = vt.withColumn("bkt", F.floor(F.col("v") * F.lit(4096.0)).cast("long"))
    boff = (
        vt.groupBy("seg", "bkt")
        .agg(F.sum("tv").alias("btv"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btv").over(
                    Window.partitionBy("seg")
                    .orderBy("bkt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("seg", "bkt", "boff")
    )
    wloc = Window.partitionBy("seg", "bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vt.join(F.broadcast(boff), ["seg", "bkt"]).withColumn(
        "cumb", F.col("boff") + F.sum("tv").over(wloc) - F.col("tv")
    )
    nseg = cum.groupBy("seg").agg(F.sum("tv").cast("long").alias("n"))
    j = cum.join(F.broadcast(nseg), "seg")
    qs = j.groupBy("seg").agg(
        F.max("n").cast("long").alias("n"),
        *[
            F.min(
                F.when(
                    F.col("cumb") + F.col("tv")
                    >= F.expr(f"({q} * n + 99) DIV 100"),
                    F.col("v"),
                )
            ).alias(f"p{q}")
            for q in _PINBALL_QS
        ],
    )
    scored = obs.join(F.broadcast(qs), "seg")
    losses = scored.groupBy("seg").agg(
        F.max("n").cast("long").alias("n"),
        *[
            dsum(
                F.expr(
                    f"CASE WHEN y >= p{q}"
                    f" THEN {_PINBALL_TAU} * (y - p{q})"
                    f" ELSE (1.0 - {_PINBALL_TAU}) * (p{q} - y) END"
                )
            ).alias(f"sl{q}")
            for q in _PINBALL_QS
        ],
    )
    out = losses.select(
        "seg",
        "n",
        *[
            F.round(F.expr(f"sl{q} / CAST(n AS DOUBLE)"), 6).alias(f"loss_p{q}")
            for q in _PINBALL_QS
        ],
    )
    return out.orderBy("seg")


def _pinball_sql() -> str:
    kths = ",\n         ".join(
        f"MIN(CASE WHEN cumb + tv >= ({q} * n + 99) // 100 THEN v END) AS p{q}"
        for q in _PINBALL_QS
    )
    sls = ",\n         ".join(
        dsum_sql(
            f"CASE WHEN y >= p{q} THEN {_PINBALL_TAU} * (y - p{q})"
            f" ELSE (1.0 - {_PINBALL_TAU}) * (p{q} - y) END"
        )
        + f" AS sl{q}"
        for q in _PINBALL_QS
    )
    outs = ",\n       ".join(
        f"round(sl{q} / CAST(n AS DOUBLE), 6) AS loss_p{q}" for q in _PINBALL_QS
    )
    return f"""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice / 1000000.0 AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
vt AS (
  SELECT seg, y AS v, CAST(COUNT(*) AS BIGINT) AS tv
  FROM obs GROUP BY 1, 2),
cum AS (
  SELECT *, SUM(tv) OVER (PARTITION BY seg ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS cumb
  FROM vt),
nseg AS (SELECT seg, CAST(SUM(tv) AS BIGINT) AS n FROM vt GROUP BY seg),
qs AS (
  SELECT cum.seg, CAST(MAX(n) AS BIGINT) AS n,
         {kths}
  FROM cum JOIN nseg ON cum.seg = nseg.seg
  GROUP BY cum.seg),
scored AS (
  SELECT obs.seg, obs.y, qs.n,
         {', '.join(f'qs.p{q}' for q in _PINBALL_QS)}
  FROM obs JOIN qs ON obs.seg = qs.seg),
losses AS (
  SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
         {sls}
  FROM scored GROUP BY seg)
SELECT seg, n,
       {outs}
FROM losses
ORDER BY seg
"""


QUERIES["ml_pinball_quantile_eval"] = ml_pinball_quantile_eval
ORACLE["ml_pinball_quantile_eval"] = _pinball_sql()


# ---------------------------------------------------------------------------
# ml_grid_search_cv
# ---------------------------------------------------------------------------

_CV_FOLDS = 3


def ml_grid_search_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validated grid search over the 9-stump candidate grid
    (quantity/discount/tax thresholds predicting returns): rows get
    deterministic md5 folds; for every fold the candidate with the
    lowest TRAIN error (other folds) is selected and scored on the
    held-out fold — the honest CV estimate of the selection procedure,
    not of any fixed model. One row per fold: chosen stump, train
    error, test error.

    Shape: ONE aggregation pass computes the full (candidate x fold)
    error matrix as conditional BIGINT cells (27 numerators /
    denominators in a single codegen scan); selection and scoring run
    on that tiny matrix. Errors are exact integer ratios rounded 6 dp
    before the argmin (engine-stable greedy, the adaboost discipline).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("dc"),
        F.col("l_tax").alias("tx"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CV_FOLDS
        ).alias("fold"),
    )
    feat_col = {"quantity": "q", "discount": "dc", "tax": "tx"}
    aggs = []
    for i, (f, thr) in enumerate(_TREE_CANDS):
        pred = f"(CASE WHEN {feat_col[f]} <= {thr} THEN 1 ELSE 0 END)"
        for k in range(_CV_FOLDS):
            aggs.append(
                F.expr(
                    f"CAST(SUM(CASE WHEN fold = {k} AND {pred} <> y"
                    f" THEN 1 ELSE 0 END) AS BIGINT)"
                ).alias(f"e{i}_{k}")
            )
    for k in range(_CV_FOLDS):
        aggs.append(
            F.expr(f"CAST(SUM(CASE WHEN fold = {k} THEN 1 ELSE 0 END) AS BIGINT)").alias(
                f"n{k}"
            )
        )
    cells = li.agg(*aggs).localCheckpoint()
    # per fold: train err over OTHER folds, test err on the fold —
    # expand the 1-row matrix to (candidate, fold) rows
    rows = []
    for i, (f, thr) in enumerate(_TREE_CANDS):
        for k in range(_CV_FOLDS):
            other = [j for j in range(_CV_FOLDS) if j != k]
            tr_num = " + ".join(f"e{i}_{j}" for j in other)
            tr_den = " + ".join(f"n{j}" for j in other)
            rows.append(
                F.struct(
                    F.lit(k).cast("long").alias("fold"),
                    F.lit(f).alias("feature"),
                    F.lit(thr).alias("thr"),
                    F.expr(
                        f"round(CAST({tr_num} AS DOUBLE)"
                        f" / CAST({tr_den} AS DOUBLE), 6)"
                    ).alias("train_err"),
                    F.expr(
                        f"round(CAST(e{i}_{k} AS DOUBLE)"
                        f" / CAST(n{k} AS DOUBLE), 6)"
                    ).alias("test_err"),
                )
            )
    mat = cells.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
    wsel = Window.partitionBy("fold").orderBy(
        F.col("train_err").asc(), F.col("feature").asc(), F.col("thr").asc()
    )
    return (
        mat.withColumn("rk", F.row_number().over(wsel))
        .where(F.col("rk") == 1)
        .select("fold", "feature", "thr", "train_err", "test_err")
        .orderBy("fold")
    )


def _grid_cv_sql() -> str:
    feat_col = {"quantity": "q", "discount": "dc", "tax": "tx"}
    cell_exprs = []
    for i, (f, thr) in enumerate(_TREE_CANDS):
        pred = f"(CASE WHEN {feat_col[f]} <= {thr} THEN 1 ELSE 0 END)"
        for k in range(_CV_FOLDS):
            cell_exprs.append(
                f"CAST(SUM(CASE WHEN fold = {k} AND {pred} <> y"
                f" THEN 1 ELSE 0 END) AS BIGINT) AS e{i}_{k}"
            )
    for k in range(_CV_FOLDS):
        cell_exprs.append(
            f"CAST(SUM(CASE WHEN fold = {k} THEN 1 ELSE 0 END) AS BIGINT) AS n{k}"
        )
    unions = []
    for i, (f, thr) in enumerate(_TREE_CANDS):
        for k in range(_CV_FOLDS):
            other = [j for j in range(_CV_FOLDS) if j != k]
            tr_num = " + ".join(f"e{i}_{j}" for j in other)
            tr_den = " + ".join(f"n{j}" for j in other)
            unions.append(
                f"SELECT CAST({k} AS BIGINT) AS fold, '{f}' AS feature,"
                f" {thr} AS thr,"
                f" round(CAST({tr_num} AS DOUBLE) / CAST({tr_den} AS DOUBLE), 6)"
                f" AS train_err,"
                f" round(CAST(e{i}_{k} AS DOUBLE) / CAST(n{k} AS DOUBLE), 6)"
                f" AS test_err FROM cells"
            )
    return f"""
WITH li AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         l_quantity AS q, l_discount AS dc, l_tax AS tx,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_'
             || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
             % {_CV_FOLDS} AS fold
  FROM lineitem),
cells AS (
  SELECT {', '.join(cell_exprs)}
  FROM li),
mat AS ({' UNION ALL '.join(unions)}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fold
        ORDER BY train_err ASC, feature ASC, thr ASC) AS rk
  FROM mat)
SELECT fold, feature, CAST(thr AS DOUBLE) AS thr, train_err, test_err
FROM ranked WHERE rk = 1
ORDER BY fold
"""


QUERIES["ml_grid_search_cv"] = ml_grid_search_cv
ORACLE["ml_grid_search_cv"] = _grid_cv_sql()


# ---------------------------------------------------------------------------
# ml_conformal_interval
# ---------------------------------------------------------------------------

_CONF_ALPHA_PCT = 90


def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for order value: customers
    split 3 ways by md5 (train/calibration/test); the predictor is the
    TRAIN segment mean; the 90% interval half-width is the
    ceil((n_cal+1)*0.9)-th smallest calibration residual (the split
    conformal quantile, distribution-free); empirical coverage is then
    measured on TEST — the finite-sample-guaranteed uncertainty
    machinery modern ML pipelines bolt onto any point predictor.

    Residual order statistics come from the value-bucket prefix sum
    (residuals in price-millions, 4e9 rule); every split and threshold
    decision is md5/integer-exact, so the whole procedure oracles.
    Tests pin coverage near the nominal 90%.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        (
            F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 3
        ).alias("part"),
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            "part",
            (F.col("o_totalprice") / F.lit(1000000.0)).alias("y"),
        )
    )
    mean_train = (
        obs.where(F.col("part") == 0)
        .groupBy("seg")
        .agg((dsum("y") / bcount().cast("double")).alias("mu"))
    )
    resid = obs.where(F.col("part") != 0).join(
        F.broadcast(mean_train), "seg"
    ).select(
        "part", F.abs(F.col("y") - F.col("mu")).alias("r")
    )
    cal = resid.where(F.col("part") == 1)
    vt = cal.groupBy(F.col("r").alias("v")).agg(bcount().alias("tv"))
    vt = vt.withColumn("bkt", F.floor(F.col("v") * F.lit(4096.0)).cast("long"))
    boff = (
        vt.groupBy("bkt")
        .agg(F.sum("tv").alias("btv"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btv").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "boff")
    )
    wloc = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vt.join(F.broadcast(boff), "bkt").withColumn(
        "cumb", F.col("boff") + F.sum("tv").over(wloc) - F.col("tv")
    )
    ncal = cum.agg(F.sum("tv").cast("long").alias("n_cal")).select(
        "n_cal",
        F.expr(
            f"({_CONF_ALPHA_PCT} * (n_cal + 1) + 99) DIV 100"
        ).alias("k"),
    )
    qhat = (
        cum.crossJoin(F.broadcast(ncal))
        .agg(
            F.max("n_cal").cast("long").alias("n_cal"),
            F.min(
                F.when(F.col("cumb") + F.col("tv") >= F.col("k"), F.col("v"))
            ).alias("q"),
        )
    )
    test = resid.where(F.col("part") == 2)
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.max("n_cal").cast("long").alias("n_cal"),
        bcount().alias("n_test"),
        F.max("q").alias("q"),
        F.sum((F.col("r") <= F.col("q")).cast("long")).cast("long").alias("n_in"),
    )
    return cov.select(
        "n_cal",
        "n_test",
        F.round(F.col("q"), 6).alias("interval_halfwidth"),
        F.round(
            F.expr("CAST(n_in AS DOUBLE) / CAST(n_test AS DOUBLE)"), 6
        ).alias("coverage"),
    )


_CONFORMAL_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 3
           AS part
  FROM customer),
obs AS (
  SELECT c.c_mktsegment AS seg, c.part, o.o_totalprice / 1000000.0 AS y
  FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey),
mean_train AS (
  SELECT seg, {dsum_sql('y')} / CAST(COUNT(*) AS DOUBLE) AS mu
  FROM obs WHERE part = 0 GROUP BY seg),
resid AS (
  SELECT o.part, abs(o.y - m.mu) AS r
  FROM obs o JOIN mean_train m ON o.seg = m.seg
  WHERE o.part <> 0),
vt AS (
  SELECT r AS v, CAST(COUNT(*) AS BIGINT) AS tv
  FROM resid WHERE part = 1 GROUP BY 1),
cum AS (
  SELECT *, SUM(tv) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS cumb
  FROM vt),
ncal AS (
  SELECT CAST(SUM(tv) AS BIGINT) AS n_cal,
         ({_CONF_ALPHA_PCT} * (CAST(SUM(tv) AS BIGINT) + 1) + 99) // 100 AS k
  FROM vt),
qhat AS (
  SELECT CAST(MAX(n_cal) AS BIGINT) AS n_cal,
         MIN(CASE WHEN cumb + tv >= k THEN v END) AS q
  FROM cum CROSS JOIN ncal)
SELECT q.n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       round(MAX(q.q), 6) AS interval_halfwidth,
       round(CAST(SUM(CASE WHEN t.r <= q.q THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
FROM resid t CROSS JOIN qhat q
WHERE t.part = 2
GROUP BY q.n_cal
"""

QUERIES["ml_conformal_interval"] = ml_conformal_interval
ORACLE["ml_conformal_interval"] = _CONFORMAL_SQL


# ---------------------------------------------------------------------------
# agg_abc_classification
# ---------------------------------------------------------------------------

from .attribution import _global_ranked_cumsum  # noqa: E402


def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue
    contribution; class A = parts covering the first 80% of cumulative
    revenue, B = next 15%, C = the tail — the standard ops-analytics
    split driving stocking and audit policy. One row per class with
    part count and exact revenue share.

    The revenue-descending rank + running DECIMAL share use the
    distributed ranking helper (range partition + pinned offsets —
    no partitionless window); class boundaries compare exact DECIMAL
    cumulative shares so the cut is engine-stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("rev_dec")
    )
    tot = per_part.agg(F.sum("rev_dec").alias("tot_dec"))
    ranked = _global_ranked_cumsum(
        per_part, "rev_dec", [F.col("rev_dec").desc(), "l_partkey"]
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "rev_dec",
        F.when(
            (F.col("cum_dec") - F.col("rev_dec")) * 100 < F.col("tot_dec") * 80, "A"
        )
        .when(
            (F.col("cum_dec") - F.col("rev_dec")) * 100 < F.col("tot_dec") * 95, "B"
        )
        .otherwise("C")
        .alias("abc"),
        "tot_dec",
    )
    return (
        classed.groupBy("abc")
        .agg(
            bcount().alias("n_parts"),
            F.round(
                (F.sum("rev_dec") / F.max("tot_dec")).cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


_ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS rev_dec
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(rev_dec) AS tot_dec FROM per_part),
ranked AS (
  SELECT rev_dec,
         SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec
  FROM per_part),
classed AS (
  SELECT rev_dec,
         CASE WHEN (cum_dec - rev_dec) * 100 < tot_dec * 80 THEN 'A'
              WHEN (cum_dec - rev_dec) * 100 < tot_dec * 95 THEN 'B'
              ELSE 'C' END AS abc,
         tot_dec
  FROM ranked CROSS JOIN tot)
SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(CAST(SUM(rev_dec) / MAX(tot_dec) AS DOUBLE), 6) AS revenue_share
FROM classed
GROUP BY abc
ORDER BY abc
"""

QUERIES["agg_abc_classification"] = agg_abc_classification
ORACLE["agg_abc_classification"] = _ABC_SQL


# ---------------------------------------------------------------------------
# ml_youden_threshold + ml_slice_error_analysis
# ---------------------------------------------------------------------------


def ml_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection by Youden's J = recall + specificity
    - 1 over the 11-threshold sweep (composition on top of
    ml_confusion_threshold_sweep's cells): the single threshold a
    binary alert should ship with when costs are symmetric. Emits the
    winning row with its J.

    J is computed from exact BIGINT cells, rounded 6 dp before the
    argmax (tiebreak: smaller threshold), so the pick is engine-stable.
    """
    sweep = QUERIES["ml_confusion_threshold_sweep"](spark, sf_dir)
    j = sweep.withColumn(
        "youden_j",
        F.round(
            F.expr(
                "CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)"
                " + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE) - 1.0"
            ),
            6,
        ),
    )
    w = Window.orderBy(F.col("youden_j").desc(), F.col("thr").asc())
    return (
        j.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("thr", "tp", "fp", "fn", "tn", "youden_j")
    )


def _youden_sql() -> str:
    return f"""
WITH sweep AS ({_sweep_sql()}),
j AS (
  SELECT thr, tp, fp, fn, tn,
         round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
               + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE) - 1.0, 6)
           AS youden_j
  FROM sweep)
SELECT thr, tp, fp, fn, tn, youden_j
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY youden_j DESC, thr ASC) AS rk
      FROM j)
WHERE rk = 1
"""


QUERIES["ml_youden_threshold"] = ml_youden_threshold
ORACLE["ml_youden_threshold"] = _youden_sql()


def ml_slice_error_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice-based model debugging: the globally best stump (gini
    argmin over the 9-candidate grid, the ml_tree_depth2 root) is
    scored PER MARKET SEGMENT — error rate, positive rate, and the
    error lift vs the global error — surfacing the slices where one
    global model quietly underserves (the fairness/robustness readout
    run before shipping any single model).

    Two passes: the global cell pass (one conditional-aggregate scan)
    and the per-slice scoring pass against the broadcast 1-row stump;
    all rates from BIGINT cells with shared-text ratios.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            (F.col("l_returnflag") == "R").cast("long").alias("y"),
            F.col("l_quantity").alias("q"),
            F.col("l_discount").alias("dc"),
            F.col("l_tax").alias("tx"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    data = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("y", "q", "dc", "tx", F.col("c_mktsegment").alias("seg"))
    )
    cands = F.broadcast(
        spark.createDataFrame(_TREE_CANDS, "feature string, thr double")
    )
    best = _tree_best_split(data.select("y", "q", "dc", "tx"), cands)
    scored = data.crossJoin(F.broadcast(best)).select(
        "seg",
        "y",
        F.expr(_TREE_LEFT).alias("pred"),  # left branch predicts positive?
    )
    # predict the MAJORITY side: use pred = left-indicator directly as
    # the decision and measure disagreement both ways, reporting the
    # better orientation globally (deterministic: computed from cells)
    cells = scored.groupBy("seg").agg(
        bcount().alias("n"),
        F.sum(F.col("y")).cast("long").alias("pos"),
        F.sum(F.expr("CASE WHEN pred <> y THEN 1 ELSE 0 END")).cast("long").alias(
            "err_as_is"
        ),
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("err_as_is").cast("long").alias("ee"),
    )
    flip = tot.select(
        (F.col("ee") * 2 > F.col("nn")).cast("long").alias("flip"),
        F.round(
            F.expr(
                "CASE WHEN ee * 2 > nn"
                " THEN CAST(nn - ee AS DOUBLE) / CAST(nn AS DOUBLE)"
                " ELSE CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE) END"
            ),
            6,
        ).alias("global_err"),
    )
    return (
        cells.crossJoin(F.broadcast(flip))
        .select(
            "seg",
            "n",
            F.round(F.expr("CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)"), 6).alias(
                "pos_rate"
            ),
            F.round(
                F.expr(
                    "CASE WHEN flip = 1"
                    " THEN CAST(n - err_as_is AS DOUBLE) / CAST(n AS DOUBLE)"
                    " ELSE CAST(err_as_is AS DOUBLE) / CAST(n AS DOUBLE) END"
                ),
                6,
            ).alias("slice_err"),
            "global_err",
        )
        .withColumn(
            "err_lift",
            F.round(F.expr("slice_err / global_err"), 6),
        )
        .orderBy("seg")
    )


def _slice_sql() -> str:
    feat_col = {"quantity": "q", "discount": "dc", "tax": "tx"}
    cells = f"""SELECT feature, thr,
         CAST(SUM({_TREE_LEFT}) AS BIGINT) AS nl,
         CAST(SUM({_TREE_LEFT} * y) AS BIGINT) AS pl,
         CAST(SUM(1 - {_TREE_LEFT}) AS BIGINT) AS nr,
         CAST(SUM((1 - {_TREE_LEFT}) * y) AS BIGINT) AS pr"""
    return f"""
WITH cands(feature, thr) AS (VALUES {', '.join(f"('{f}', {t})" for f, t in _TREE_CANDS)}),
data AS (
  SELECT CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         l.l_quantity AS q, l.l_discount AS dc, l.l_tax AS tx,
         c.c_mktsegment AS seg
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey),
re AS ({cells} FROM data CROSS JOIN cands GROUP BY feature, thr),
rb AS (SELECT feature, thr, {_TREE_SCORE} AS score FROM re
       ORDER BY {_TREE_SCORE}, feature, thr LIMIT 1),
scored AS (
  SELECT d.seg, d.y, {_TREE_LEFT} AS pred
  FROM data d CROSS JOIN rb),
cells2 AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN pred <> y THEN 1 ELSE 0 END) AS BIGINT)
           AS err_as_is
  FROM scored GROUP BY seg),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(err_as_is) AS BIGINT) AS ee
  FROM cells2),
flip AS (
  SELECT CAST(CASE WHEN ee * 2 > nn THEN 1 ELSE 0 END AS BIGINT) AS flip,
         round(CASE WHEN ee * 2 > nn
                    THEN CAST(nn - ee AS DOUBLE) / CAST(nn AS DOUBLE)
                    ELSE CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE) END, 6)
           AS global_err
  FROM tot)
SELECT seg, n,
       round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
       round(CASE WHEN flip = 1
                  THEN CAST(n - err_as_is AS DOUBLE) / CAST(n AS DOUBLE)
                  ELSE CAST(err_as_is AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
         AS slice_err,
       global_err,
       round(round(CASE WHEN flip = 1
                  THEN CAST(n - err_as_is AS DOUBLE) / CAST(n AS DOUBLE)
                  ELSE CAST(err_as_is AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
             / global_err, 6) AS err_lift
FROM cells2 CROSS JOIN flip
ORDER BY seg
"""


QUERIES["ml_slice_error_analysis"] = ml_slice_error_analysis
ORACLE["ml_slice_error_analysis"] = _slice_sql()


# ---------------------------------------------------------------------------
# ml_als_rmse_eval
# ---------------------------------------------------------------------------


def ml_als_rmse_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction quality of the ALS half-step: RMSE of the rank-2
    predictions u . f against the actual customer x brand counts,
    next to the global-mean baseline RMSE — 'did two latent factors
    buy anything?' (improvement ratio < 1 means yes). Composes the
    registered ml_als_user_step factors with the same deterministic
    brand factors.

    Shape: rebuild ratings (two fact shuffles), broadcast the brand
    factors, join the customer factors on the custkey partitioning,
    then one DECIMAL-sum pass for both error totals. Predictions are
    6 dp-rounded before squaring (shared-text discipline), errors
    bounded (counts ~ tens), so everything quantizes safely.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "p_brand")
        .agg(bcount().alias("r"))
    )
    factors = (
        load_table(spark, sf_dir, "part")
        .select("p_brand")
        .distinct()
        .select(
            "p_brand",
            F.expr(_ALS_FACTOR_SPARK.format(d=1)).alias("f1"),
            F.expr(_ALS_FACTOR_SPARK.format(d=2)).alias("f2"),
        )
    )
    users = QUERIES["ml_als_user_step"](spark, sf_dir).select(
        "o_custkey", "u1", "u2"
    )
    joined = (
        ratings.join(F.broadcast(factors), "p_brand")
        .join(users, "o_custkey")
        .select(
            "r",
            F.round(
                F.expr("u1 * f1 + u2 * f2"), 6
            ).alias("pred"),
        )
    )
    mean_r = joined.agg(
        (dsum(F.col("r").cast("double")) / F.count("*")).alias("mu")
    ).select(F.round("mu", 6).alias("mu"))
    suff = joined.crossJoin(F.broadcast(mean_r)).agg(
        bcount().alias("n"),
        dsum(
            (F.col("r").cast("double") - F.col("pred"))
            * (F.col("r").cast("double") - F.col("pred"))
        ).alias("se_model"),
        dsum(
            (F.col("r").cast("double") - F.col("mu"))
            * (F.col("r").cast("double") - F.col("mu"))
        ).alias("se_base"),
    )
    return suff.select(
        "n",
        F.round(F.expr("sqrt(se_model / CAST(n AS DOUBLE))"), 6).alias("rmse_model"),
        F.round(F.expr("sqrt(se_base / CAST(n AS DOUBLE))"), 6).alias("rmse_baseline"),
        F.round(
            F.expr(
                "sqrt(se_model / CAST(n AS DOUBLE))"
                " / sqrt(se_base / CAST(n AS DOUBLE))"
            ),
            6,
        ).alias("improvement_ratio"),
    )


_ALS_RMSE_SQL = f"""
WITH ratings AS (
  SELECT o.o_custkey, p.p_brand, CAST(COUNT(*) AS BIGINT) AS r
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
factors AS (
  SELECT p_brand,
         {_ALS_FACTOR.format(d=1)} AS f1,
         {_ALS_FACTOR.format(d=2)} AS f2
  FROM (SELECT DISTINCT p_brand FROM part)),
users AS ({_ALS_SQL.replace('ORDER BY o_custkey', '')}),
joined AS (
  SELECT r.r, round(u.u1 * f.f1 + u.u2 * f.f2, 6) AS pred
  FROM ratings r
  JOIN factors f ON r.p_brand = f.p_brand
  JOIN users u ON r.o_custkey = u.o_custkey),
mu AS (
  SELECT round({dsum_sql('CAST(r AS DOUBLE)')} / COUNT(*), 6) AS mu
  FROM joined),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('(CAST(r AS DOUBLE) - pred) * (CAST(r AS DOUBLE) - pred)')}
           AS se_model,
         {dsum_sql('(CAST(r AS DOUBLE) - mu) * (CAST(r AS DOUBLE) - mu)')}
           AS se_base
  FROM joined CROSS JOIN mu)
SELECT n,
       round(sqrt(se_model / CAST(n AS DOUBLE)), 6) AS rmse_model,
       round(sqrt(se_base / CAST(n AS DOUBLE)), 6) AS rmse_baseline,
       round(sqrt(se_model / CAST(n AS DOUBLE))
             / sqrt(se_base / CAST(n AS DOUBLE)), 6) AS improvement_ratio
FROM suff
"""

QUERIES["ml_als_rmse_eval"] = ml_als_rmse_eval
ORACLE["ml_als_rmse_eval"] = _ALS_RMSE_SQL


# ---------------------------------------------------------------------------
# stat_runs_test + stat_sign_test + agg_expected_shortfall
# ---------------------------------------------------------------------------

_RUNS_Z = (
    "((CAST(r AS DOUBLE) - (2.0 * CAST(np AS DOUBLE) * CAST(nm AS DOUBLE)"
    " / CAST(np + nm AS DOUBLE) + 1.0))"
    " / sqrt((2.0 * CAST(np AS DOUBLE) * CAST(nm AS DOUBLE)"
    " * (2.0 * CAST(np AS DOUBLE) * CAST(nm AS DOUBLE)"
    " - CAST(np AS DOUBLE) - CAST(nm AS DOUBLE)))"
    " / (CAST(np + nm AS DOUBLE) * CAST(np + nm AS DOUBLE)"
    " * (CAST(np + nm AS DOUBLE) - 1.0))))"
)


def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the SIGN of day-over-day revenue
    changes: too few runs means momentum, too many means oscillation,
    z ~ 0 means the up/down sequence is random — the nonparametric
    randomness check behind 'is this trend real?'.

    Signs are exact integer-cents comparisons (zero-change days are
    dropped); the run count is a sign-change sum over the bounded
    daily frame; z is one shared closed form over the exact counts.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    diffs = (
        daily.withColumn("prev", F.lag("cents").over(w))
        .where(F.col("prev").isNotNull() & (F.col("cents") != F.col("prev")))
        .select(
            "day",
            F.when(F.col("cents") > F.col("prev"), 1).otherwise(-1).alias("s"),
        )
    )
    w2 = Window.orderBy("day")
    runs = diffs.withColumn("ps", F.lag("s").over(w2)).select(
        "s",
        F.when(
            F.col("ps").isNull() | (F.col("s") != F.col("ps")), 1
        ).otherwise(0).alias("new_run"),
    )
    suff = runs.agg(
        F.sum((F.col("s") == 1).cast("long")).cast("long").alias("np"),
        F.sum((F.col("s") == -1).cast("long")).cast("long").alias("nm"),
        F.sum("new_run").cast("long").alias("r"),
    )
    return suff.select(
        "np",
        "nm",
        "r",
        F.round(F.expr(_RUNS_Z), 6).alias("z"),
        F.round(F.expr(_p_two_sided(f"abs({_RUNS_Z})")), 6).alias("p_approx"),
    )


_RUNS_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
diffs AS (
  SELECT day, CASE WHEN cents > prev THEN 1 ELSE -1 END AS s
  FROM (SELECT day, cents, LAG(cents) OVER (ORDER BY day) AS prev FROM daily)
  WHERE prev IS NOT NULL AND cents <> prev),
runs AS (
  SELECT s,
         CASE WHEN ps IS NULL OR s <> ps THEN 1 ELSE 0 END AS new_run
  FROM (SELECT day, s, LAG(s) OVER (ORDER BY day) AS ps FROM diffs)),
suff AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nm,
         CAST(SUM(new_run) AS BIGINT) AS r
  FROM runs)
SELECT np, nm, r,
       round({_RUNS_Z}, 6) AS z,
       round({_p_two_sided(f'abs({_RUNS_Z})')}, 6) AS p_approx
FROM suff
"""

QUERIES["stat_runs_test"] = stat_runs_test
ORACLE["stat_runs_test"] = _RUNS_SQL


_SIGN_Z = "((CAST(npos AS DOUBLE) - CAST(nn AS DOUBLE) / 2.0) / sqrt(CAST(nn AS DOUBLE) / 4.0))"


def stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: did per-customer spend move between 1996 and
    1997? Customers active in BOTH years contribute sign(spend_97 -
    spend_96); under no change, positives ~ Binomial(n, 1/2) and
    z = (n+ - n/2)/sqrt(n/4) — the assumption-free paired test
    (no symmetry, no normality — just signs).

    Spend per (customer, year) are exact integer cents; ties are
    dropped per the classic definition. One custkey shuffle, one
    5-row-free closed form.
    """
    o = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1996, 1997)
    )
    per = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    paired = (
        per.groupBy("o_custkey")
        .pivot("yr", [1996, 1997])
        .agg(F.max("cents"))
        .where(F.col("1996").isNotNull() & F.col("1997").isNotNull())
        .where(F.col("1996") != F.col("1997"))
        .select(
            (F.col("1997") > F.col("1996")).cast("long").alias("pos")
        )
    )
    suff = paired.agg(
        bcount().alias("nn"),
        F.sum("pos").cast("long").alias("npos"),
    )
    return suff.select(
        "nn",
        "npos",
        F.round(F.expr(_SIGN_Z), 6).alias("z"),
        F.round(F.expr(_p_two_sided(f"abs({_SIGN_Z})")), 6).alias("p_approx"),
    )


_SIGN_SQL = f"""
WITH per AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2),
paired AS (
  SELECT CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END AS pos
  FROM per a JOIN per b
    ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
  WHERE a.cents <> b.cents),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
         CAST(SUM(pos) AS BIGINT) AS npos
  FROM paired)
SELECT nn, npos,
       round({_SIGN_Z}, 6) AS z,
       round({_p_two_sided(f'abs({_SIGN_Z})')}, 6) AS p_approx
FROM suff
"""

QUERIES["stat_sign_test"] = stat_sign_test
ORACLE["stat_sign_test"] = _SIGN_SQL


def agg_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and expected shortfall (CVaR) of DAILY revenue at
    the 5% lower tail: VaR = the exact ceil(0.05*n)-th WORST day,
    ES = the mean of days at or below it — the risk-desk pair, here
    over the revenue distribution (a demand-shock readout). Exact
    order statistics via the cumulative count on the sorted daily
    frame; tail mean from integer-cents sums.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("cents", "day").rowsBetween(Window.unboundedPreceding, 0)
    ranked = daily.withColumn("rn", F.count("*").over(w))
    n = daily.agg(bcount().alias("n")).select(
        "n", F.expr("(5 * n + 99) DIV 100").alias("k")
    )
    tail = ranked.crossJoin(F.broadcast(n)).where(F.col("rn") <= F.col("k"))
    out = tail.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("k").cast("long").alias("k"),
        F.max("cents").alias("var_cents"),
        F.sum("cents").cast("long").alias("tail_cents"),
    )
    return out.select(
        "n_days",
        "k",
        (F.col("var_cents") / F.lit(100.0)).alias("var_95"),
        F.round(
            F.expr("CAST(tail_cents AS DOUBLE) / CAST(k AS DOUBLE) / 100.0"), 6
        ).alias("expected_shortfall_95"),
    )


_ES_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
ranked AS (
  SELECT cents, COUNT(*) OVER (ORDER BY cents, day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
  FROM daily),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             (5 * CAST(COUNT(*) AS BIGINT) + 99) // 100 AS k
      FROM daily),
tail AS (SELECT * FROM ranked CROSS JOIN n WHERE rn <= k)
SELECT CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(MAX(k) AS BIGINT) AS k,
       CAST(MAX(cents) AS DOUBLE) / 100.0 AS var_95,
       round(CAST(SUM(cents) AS DOUBLE) / CAST(MAX(k) AS DOUBLE) / 100.0, 6)
         AS expected_shortfall_95
FROM tail
"""

QUERIES["agg_expected_shortfall"] = agg_expected_shortfall
ORACLE["agg_expected_shortfall"] = _ES_SQL


# ---------------------------------------------------------------------------
# agg_inequality_indexes + stat_hill_tail_index + ml_cost_threshold
# ---------------------------------------------------------------------------


def agg_inequality_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and Atkinson(0.5) inequality indexes over per-customer
    revenue — the decomposable complements of agg_gini_revenue (Theil
    is additively decomposable across subgroups; Atkinson has an
    explicit inequality-aversion parameter).

    T = mean((x/mu) ln(x/mu)), A = 1 - mean(sqrt x)^2 / mu, both from
    DECIMAL-exact sums with ln/sqrt terms quantized 6 dp (libm
    discipline); revenue in millions (4e9 rule). One custkey shuffle.
    """
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice") / F.lit(1000000.0)).alias("x"))
    )
    mu = per.agg(
        F.round((dsum("x") / F.count("*")).cast("double"), 6).alias("mu")
    )
    terms = per.crossJoin(F.broadcast(mu)).select(
        "x",
        "mu",
        F.round(F.expr("(x / mu) * ln(x / mu)"), 6).alias("t_term"),
        F.round(F.expr("sqrt(x)"), 6).alias("sx"),
    )
    suff = terms.agg(
        bcount().alias("n"),
        F.max("mu").alias("mu"),
        dsum("t_term").alias("st"),
        dsum("sx").alias("ssx"),
    )
    return suff.select(
        "n",
        F.round(F.expr("st / CAST(n AS DOUBLE)"), 6).alias("theil_t"),
        F.round(
            F.expr(
                "1.0 - (ssx / CAST(n AS DOUBLE)) * (ssx / CAST(n AS DOUBLE)) / mu"
            ),
            6,
        ).alias("atkinson_05"),
    )


_INEQ_SQL = f"""
WITH per AS (
  SELECT o_custkey, {dsum_sql('o_totalprice / 1000000.0')} AS x
  FROM orders GROUP BY 1),
mu AS (
  SELECT round({dsum_sql('x')} / COUNT(*), 6) AS mu FROM per),
terms AS (
  SELECT x, mu,
         round((x / mu) * ln(x / mu), 6) AS t_term,
         round(sqrt(x), 6) AS sx
  FROM per CROSS JOIN mu),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(mu) AS mu,
         {dsum_sql('t_term')} AS st,
         {dsum_sql('sx')} AS ssx
  FROM terms)
SELECT n,
       round(st / CAST(n AS DOUBLE), 6) AS theil_t,
       round(1.0 - (ssx / CAST(n AS DOUBLE)) * (ssx / CAST(n AS DOUBLE)) / mu, 6)
         AS atkinson_05
FROM suff
"""

QUERIES["agg_inequality_indexes"] = agg_inequality_indexes
ORACLE["agg_inequality_indexes"] = _INEQ_SQL


_HILL_K = 100


def stat_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the upper-tail index of order values over the
    top-100 order statistics: alpha = k / sum ln(x_(i)/x_(k+1)) —
    'how heavy is the whale tail?' (alpha <= 2 means infinite
    variance). The top-(k+1) frame comes from TakeOrderedAndProject
    (never a global sort); ln ratios are 6 dp-quantized before the
    DECIMAL sum.
    """
    top = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), F.col("o_orderkey").asc())
        .limit(_HILL_K + 1)
    )
    thr = top.agg(F.min("x").alias("xk"))
    terms = (
        top.crossJoin(F.broadcast(thr))
        .where(F.col("x") > F.col("xk"))
        .select(F.round(F.expr("ln(x / xk)"), 6).alias("t"))
    )
    suff = terms.agg(bcount().alias("k"), dsum("t").alias("s"))
    return suff.select(
        "k",
        F.round(F.expr("CAST(k AS DOUBLE) / s"), 6).alias("hill_alpha"),
    )


_HILL_SQL = f"""
WITH top AS (
  SELECT o_totalprice AS x FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT {_HILL_K + 1}),
thr AS (SELECT MIN(x) AS xk FROM top),
terms AS (
  SELECT round(ln(x / xk), 6) AS t
  FROM top CROSS JOIN thr WHERE x > xk),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, {dsum_sql('t')} AS s FROM terms)
SELECT k, round(CAST(k AS DOUBLE) / s, 6) AS hill_alpha
FROM suff
"""

QUERIES["stat_hill_tail_index"] = stat_hill_tail_index
ORACLE["stat_hill_tail_index"] = _HILL_SQL


_COST_FP = "1.0"
_COST_FN = "5.0"


def ml_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating point: with asymmetric error costs
    (FN = 5x FP), pick the sweep threshold minimizing expected cost
    per example — the decision-theoretic upgrade over Youden's J
    (which implicitly prices errors equally). Emits the winner with
    its normalized cost.

    Costs come from exact BIGINT cells, rounded 6 dp before the
    argmin (smaller-threshold tiebreak) — engine-stable.
    """
    sweep = QUERIES["ml_confusion_threshold_sweep"](spark, sf_dir)
    cost = sweep.withColumn(
        "exp_cost",
        F.round(
            F.expr(
                f"({_COST_FP} * CAST(fp AS DOUBLE)"
                f" + {_COST_FN} * CAST(fn AS DOUBLE))"
                f" / CAST(tp + fp + fn + tn AS DOUBLE)"
            ),
            6,
        ),
    )
    w = Window.orderBy(F.col("exp_cost").asc(), F.col("thr").asc())
    return (
        cost.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("thr", "tp", "fp", "fn", "tn", "exp_cost")
    )


def _cost_threshold_sql() -> str:
    return f"""
WITH sweep AS ({_sweep_sql()}),
cost AS (
  SELECT thr, tp, fp, fn, tn,
         round(({_COST_FP} * CAST(fp AS DOUBLE)
               + {_COST_FN} * CAST(fn AS DOUBLE))
               / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS exp_cost
  FROM sweep)
SELECT thr, tp, fp, fn, tn, exp_cost
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY exp_cost ASC, thr ASC) AS rk
      FROM cost)
WHERE rk = 1
"""


QUERIES["ml_cost_threshold"] = ml_cost_threshold
ORACLE["ml_cost_threshold"] = _cost_threshold_sql()


# ---------------------------------------------------------------------------
# stat_kruskal_wallis + stat_lognormal_fit + ml_feature_ablation
# ---------------------------------------------------------------------------

_KW_H = (
    "(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * hsum"
    " - 3.0 * (CAST(n AS DOUBLE) + 1.0))"
)


def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA: do order values differ across ALL
    five market segments? (the K-group extension of stat_mann_whitney
    — same midrank machinery, one H statistic.)

    Midranks come from the value-bucket prefix sum; per-group rank
    sums are exact in 0.5 units (doubled midranks are BIGINTs), and
    H = 12/(N(N+1)) * sum R_j^2/n_j - 3(N+1) is one shared closed
    form with a Wilson-Hilferty chi-square_4 p-value. Tie correction
    is applied (divide by 1 - sum(t^3-t)/(N^3-N)).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("xv"))
    )
    mr = _bucketed_midranks(obs, "xv", 256.0)
    ranked = obs.join(mr, obs.xv == mr.v).select("seg", "mr2")
    per = ranked.groupBy("seg").agg(
        bcount().alias("nj"), F.sum("mr2").cast("long").alias("r2j")
    )
    ties = (
        obs.groupBy("xv")
        .agg(bcount().alias("tv"))
        .agg(
            F.sum(
                F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv")
            ).cast("long").alias("tsum")
        )
    )
    suff = per.agg(
        F.sum("nj").cast("long").alias("n"),
        bcount().alias("k"),
        # R_j = r2j/2; sum R_j^2/n_j = sum r2j^2/(4 n_j)
        dsum(
            F.col("r2j").cast("double")
            * F.col("r2j").cast("double")
            / (4.0 * F.col("nj").cast("double"))
            / F.lit(1000000.0)  # keep DECIMAL terms < 4e9 (sums ~1e12)
        ).alias("hsum_m"),
    ).crossJoin(ties)
    h_raw = _KW_H.replace("hsum", "(hsum_m * 1000000.0)")
    h_corr = (
        f"({h_raw} / (1.0 - CAST(tsum AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        " - CAST(n AS DOUBLE))))"
    )
    return suff.select(
        "n",
        "k",
        F.round(F.expr(h_corr), 6).alias("h_stat"),
        # 4 dp: the A&S tail's own exp() wiggle flipped a 5th-decimal
        # rounding at sf0.001 even with the quantized WH z
        F.round(F.expr(_p_two_sided_chi4(h_corr)), 4).alias("p_approx"),
    )


def _p_two_sided_chi4(x: str) -> str:
    """Wilson-Hilferty chi-square_4 upper tail (shared text; z
    quantized 6 dp before the A&S polynomial, the ts_ljung_box
    lesson)."""
    c = "(2.0 / 36.0)"
    z = f"round((pow({x} / 4.0, 1.0 / 3.0) - (1.0 - {c})) / sqrt({c}), 6)"
    half = f"({_p_two_sided(f'abs({z})')} / 2.0)"
    return f"(CASE WHEN {z} >= 0.0 THEN {half} ELSE 1.0 - {half} END)"


def _kw_sql() -> str:
    h_raw = _KW_H.replace("hsum", "(hsum_m * 1000000.0)")
    h_corr = (
        f"({h_raw} / (1.0 - CAST(tsum AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        " - CAST(n AS DOUBLE))))"
    )
    return f"""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS xv
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
mr AS ({_midrank_sql('obs', 'xv')}),
ranked AS (
  SELECT obs.seg, mr.mr2 FROM obs JOIN mr ON obs.xv = mr.v),
per AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS nj,
         CAST(SUM(mr2) AS BIGINT) AS r2j
  FROM ranked GROUP BY seg),
ties AS (
  SELECT CAST(SUM(tv * tv * tv - tv) AS BIGINT) AS tsum
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tv FROM obs GROUP BY xv)),
suff AS (
  SELECT CAST(SUM(nj) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         {dsum_sql('CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)'
                   ' / (4.0 * CAST(nj AS DOUBLE)) / 1000000.0')} AS hsum_m
  FROM per)
SELECT n, k,
       round({h_corr}, 6) AS h_stat,
       round({_p_two_sided_chi4(h_corr)}, 4) AS p_approx
FROM suff CROSS JOIN ties
"""


QUERIES["stat_kruskal_wallis"] = stat_kruskal_wallis
ORACLE["stat_kruskal_wallis"] = _kw_sql()


def stat_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-normal fit of order values by moments of ln(x): mu and
    sigma of the log, the implied distribution median exp(mu) and mean
    exp(mu + sigma^2/2), and the observed mean — gap between implied
    and observed mean reads as lognormality violation. ln terms 6 dp
    (libm), DECIMAL sums, one scan.
    """
    obs = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") / F.lit(1000000.0)).alias("x")
    )
    terms = obs.select(
        "x", F.round(F.log("x"), 6).alias("lx")
    )
    suff = terms.agg(
        bcount().alias("n"),
        dsum("lx").alias("s"),
        dsum(F.col("lx") * F.col("lx")).alias("ss"),
        dsum("x").alias("sx"),
    )
    mu = "(s / CAST(n AS DOUBLE))"
    sig2 = f"(ss / CAST(n AS DOUBLE) - {mu} * {mu})"
    return suff.select(
        "n",
        F.round(F.expr(mu), 6).alias("log_mu"),
        F.round(F.expr(f"sqrt({sig2})"), 6).alias("log_sigma"),
        F.round(F.expr(f"exp({mu})"), 6).alias("implied_median"),
        F.round(F.expr(f"exp({mu} + {sig2} / 2.0)"), 6).alias("implied_mean"),
        F.round(F.expr("sx / CAST(n AS DOUBLE)"), 6).alias("observed_mean"),
    )


def _lognormal_sql() -> str:
    mu = "(s / CAST(n AS DOUBLE))"
    sig2 = f"(ss / CAST(n AS DOUBLE) - {mu} * {mu})"
    return f"""
WITH obs AS (SELECT o_totalprice / 1000000.0 AS x FROM orders),
terms AS (SELECT x, round(ln(x), 6) AS lx FROM obs),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('lx')} AS s, {dsum_sql('lx * lx')} AS ss,
         {dsum_sql('x')} AS sx
  FROM terms)
SELECT n,
       round({mu}, 6) AS log_mu,
       round(sqrt({sig2}), 6) AS log_sigma,
       round(exp({mu}), 6) AS implied_median,
       round(exp({mu} + {sig2} / 2.0), 6) AS implied_mean,
       round(sx / CAST(n AS DOUBLE), 6) AS observed_mean
FROM suff
"""


QUERIES["stat_lognormal_fit"] = stat_lognormal_fit
ORACLE["stat_lognormal_fit"] = _lognormal_sql()


def ml_feature_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-feature-out ablation over the stump grid: the best
    achievable 0/1 error using the FULL grid vs the grid with each
    feature's candidates removed — a feature whose removal doesn't
    move the floor is redundant. One conditional-aggregate scan
    produces every candidate's error; the ablation math runs on the
    9-cell frame.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("dc"),
        F.col("l_tax").alias("tx"),
    )
    feat_col = {"quantity": "q", "discount": "dc", "tax": "tx"}
    aggs = [bcount().alias("n")]
    for i, (f, thr) in enumerate(_TREE_CANDS):
        pred = f"(CASE WHEN {feat_col[f]} <= {thr} THEN 1 ELSE 0 END)"
        # error of the better polarity: min(mismatch, n - mismatch)
        aggs.append(
            F.expr(
                f"CAST(SUM(CASE WHEN {pred} <> y THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias(f"m{i}")
        )
    cells = li.agg(*aggs).localCheckpoint()
    rows = []
    feats = ["quantity", "discount", "tax"]
    for drop in ["none"] + feats:
        kept = [
            i
            for i, (f, _) in enumerate(_TREE_CANDS)
            if f != drop
        ]
        best = "LEAST(" + ", ".join(
            f"LEAST(m{i}, n - m{i})" for i in kept
        ) + ")"
        rows.append(
            F.struct(
                F.lit(drop).alias("dropped_feature"),
                F.expr(
                    f"round(CAST({best} AS DOUBLE) / CAST(n AS DOUBLE), 6)"
                ).alias("best_err"),
            )
        )
    return (
        cells.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("dropped_feature")
    )


def _ablation_sql() -> str:
    feat_col = {"quantity": "q", "discount": "dc", "tax": "tx"}
    cell_exprs = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i, (f, thr) in enumerate(_TREE_CANDS):
        pred = f"(CASE WHEN {feat_col[f]} <= {thr} THEN 1 ELSE 0 END)"
        cell_exprs.append(
            f"CAST(SUM(CASE WHEN {pred} <> y THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS m{i}"
        )
    unions = []
    for drop in ["none", "quantity", "discount", "tax"]:
        kept = [i for i, (f, _) in enumerate(_TREE_CANDS) if f != drop]
        best = "LEAST(" + ", ".join(
            f"LEAST(m{i}, n - m{i})" for i in kept
        ) + ")"
        unions.append(
            f"SELECT '{drop}' AS dropped_feature,"
            f" round(CAST({best} AS DOUBLE) / CAST(n AS DOUBLE), 6)"
            f" AS best_err FROM cells"
        )
    return f"""
WITH li AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         l_quantity AS q, l_discount AS dc, l_tax AS tx
  FROM lineitem),
cells AS (SELECT {', '.join(cell_exprs)} FROM li)
{' UNION ALL '.join(unions)}
ORDER BY dropped_feature
"""


QUERIES["ml_feature_ablation"] = ml_feature_ablation
ORACLE["ml_feature_ablation"] = _ablation_sql()


# ---------------------------------------------------------------------------
# stat_mcnemar_test + ml_brier_decomposition
# ---------------------------------------------------------------------------

_MCNEMAR_CHI2 = (
    "((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
    " * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
    " / CAST(b + c AS DOUBLE))"
)


def stat_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test comparing two stump classifiers on the
    SAME rows (discount <= 0.05 vs quantity <= 25 predicting returns):
    only the disagreement cells matter — b = A right & B wrong, c = A
    wrong & B right; chi2_1 = (b-c)^2/(b+c). THE test for 'is model A
    actually better than model B on this dataset' (accuracy deltas
    alone ignore pairing).

    One conditional-aggregate scan produces the 2x2 disagreement
    cells; chi-square p via Wilson-Hilferty (df=1), 4 dp.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        (F.col("l_discount") <= 0.05).cast("long").alias("pa"),
        (F.col("l_quantity") <= 25.0).cast("long").alias("pb"),
    )
    cells = li.agg(
        bcount().alias("n"),
        F.sum(
            F.expr("CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END")
        ).cast("long").alias("b"),
        F.sum(
            F.expr("CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END")
        ).cast("long").alias("c"),
    )
    return cells.select(
        "n",
        "b",
        "c",
        F.round(F.expr(_MCNEMAR_CHI2), 6).alias("chi2"),
        F.round(F.expr(_wh_chi2_tail_df1(_MCNEMAR_CHI2)), 4).alias("p_approx"),
    )


def _wh_chi2_tail_df1(x: str) -> str:
    """chi-square_1 upper tail: exactly 2*(1 - Phi(sqrt(x))) — the A&S
    two-sided tail of sqrt(x), 6 dp-quantized first."""
    z = f"round(sqrt({x}), 6)"
    return _p_two_sided(z)


def _mcnemar_sql() -> str:
    return f"""
WITH li AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END AS pa,
         CASE WHEN l_quantity <= 25.0 THEN 1 ELSE 0 END AS pb
  FROM lineitem),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT)
           AS b,
         CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT)
           AS c
  FROM li)
SELECT n, b, c,
       round({_MCNEMAR_CHI2}, 6) AS chi2,
       round({_wh_chi2_tail_df1(_MCNEMAR_CHI2)}, 4) AS p_approx
FROM cells
"""


QUERIES["stat_mcnemar_test"] = stat_mcnemar_test
ORACLE["stat_mcnemar_test"] = _mcnemar_sql()


def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the discount-as-
    probability forecast of returns: REL (calibration error) - RES
    (discrimination) + UNC (irreducible base-rate variance), over the
    11 distinct discount bins. The decomposition says WHERE a
    probabilistic score is losing: miscalibration or lack of
    resolution.

    Bins are the exact distinct discount values (11 of them); all
    terms come from BIGINT cell counts with quantized per-bin means —
    engine-stable closed forms; the identity REL - RES + UNC =
    binned Brier is pinned in tests.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_discount").alias("s"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    bins = li.groupBy("s").agg(
        bcount().alias("nb"), F.sum("y").cast("long").alias("pos")
    )
    tot = bins.agg(
        F.sum("nb").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("npos"),
    )
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "nb",
        F.round(F.expr("CAST(pos AS DOUBLE) / CAST(nb AS DOUBLE)"), 6).alias(
            "ob"
        ),
        F.round(F.expr("CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)"), 6).alias(
            "obar"
        ),
        F.col("s").cast("double").alias("sb"),
        "n",
    )
    suff = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.max("obar").alias("obar"),
        dsum(
            F.col("nb").cast("double")
            * (F.col("sb") - F.col("ob"))
            * (F.col("sb") - F.col("ob"))
        ).alias("rel_n"),
        dsum(
            F.col("nb").cast("double")
            * (F.col("ob") - F.col("obar"))
            * (F.col("ob") - F.col("obar"))
        ).alias("res_n"),
    )
    return suff.select(
        "n",
        F.round(F.expr("rel_n / CAST(n AS DOUBLE)"), 6).alias("reliability"),
        F.round(F.expr("res_n / CAST(n AS DOUBLE)"), 6).alias("resolution"),
        F.round(F.expr("obar * (1.0 - obar)"), 6).alias("uncertainty"),
        F.round(
            F.expr(
                "rel_n / CAST(n AS DOUBLE) - res_n / CAST(n AS DOUBLE)"
                " + obar * (1.0 - obar)"
            ),
            6,
        ).alias("brier_binned"),
    )


_BRIER_SQL = f"""
WITH li AS (
  SELECT l_discount AS s,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
bins AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(y) AS BIGINT) AS pos
  FROM li GROUP BY s),
tot AS (
  SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS npos
  FROM bins),
terms AS (
  SELECT nb,
         round(CAST(pos AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS ob,
         round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obar,
         CAST(s AS DOUBLE) AS sb, n
  FROM bins CROSS JOIN tot),
suff AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(obar) AS obar,
         {dsum_sql('CAST(nb AS DOUBLE) * (sb - ob) * (sb - ob)')} AS rel_n,
         {dsum_sql('CAST(nb AS DOUBLE) * (ob - obar) * (ob - obar)')} AS res_n
  FROM terms)
SELECT n,
       round(rel_n / CAST(n AS DOUBLE), 6) AS reliability,
       round(res_n / CAST(n AS DOUBLE), 6) AS resolution,
       round(obar * (1.0 - obar), 6) AS uncertainty,
       round(rel_n / CAST(n AS DOUBLE) - res_n / CAST(n AS DOUBLE)
             + obar * (1.0 - obar), 6) AS brier_binned
FROM suff
"""

QUERIES["ml_brier_decomposition"] = ml_brier_decomposition
ORACLE["ml_brier_decomposition"] = _BRIER_SQL
