"""Customer-value analytics: heuristic lifetime value and a fully
relational Newton-iterated logistic regression.

Reference parity: the upstream Customer-360 solution's stated outputs
are customer value scores and propensity models (SURVEY.md §1.1;
reference checkout empty, §0). Both operators here carry full DuckDB
oracles — including the logistic regression, whose three Newton steps
are term-rounded + DECIMAL-summed so every coefficient is
bit-reproducible cross-engine (the same libm discipline as
text_unigram_logprob).

Scale posture (100 TB): LTV is one orders aggregate keyed by custkey.
The regression aggregates the ORDER DATA ONCE into a per-customer
feature frame (localCheckpoint'd), then each Newton step is a single
5-term aggregate over that frame with the 2-vector coefficient state
on the driver — O(1) driver state, never O(data), exactly the
pagerank-style iterate-with-checkpoint shape.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount
from ..sources.tables import load_table

_LTV_HORIZON_M = 24  # projection horizon, months

# Observation/label split for the conversion regression: orders span
# 1995-01..2001-08, so 2000-01-01 gives a 60-month observation window
# and a 20-month label window.
_LR_SPLIT = "2000-01-01 00:00:00"
_LR_ITERS = 3


def feat_ltv_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic customer lifetime value: average order value x
    monthly purchase frequency x retention share x a fixed horizon —
    the standard marketer's CLV first cut (no survival model; see
    feat_survival_hazard for the hazard-based view).

    Month arithmetic uses integer year*12+month (months_between is
    fractional and engine-divergent). One aggregate keyed by custkey;
    every emitted double derives from exact integer sums through a
    fixed multiply order."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    per = (
        o.select("o_custkey", cents.alias("cents"), ym.alias("ym"))
        .groupBy("o_custkey")
        .agg(
            bcount().alias("n_orders"),
            F.sum("cents").cast("long").alias("tot_cents"),
            F.min("ym").alias("first_m"),
            F.max("ym").alias("last_m"),
            F.countDistinct("ym").cast("long").alias("active_months"),
        )
    )
    span = (F.col("last_m") - F.col("first_m") + 1).cast("double")
    aov = F.col("tot_cents") / F.lit(100.0) / F.col("n_orders")
    freq = F.col("n_orders") / span
    retention = F.col("active_months") / span
    return per.select(
        "o_custkey",
        "n_orders",
        (F.col("last_m") - F.col("first_m") + 1).alias("span_months"),
        "active_months",
        F.round(aov, 6).alias("aov"),
        F.round(freq, 6).alias("orders_per_month"),
        F.round(retention, 6).alias("retention"),
        F.round(
            aov * freq * retention * F.lit(float(_LTV_HORIZON_M)), 6
        ).alias("ltv_24m"),
    )


_LTV_SQL = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS tot_cents,
         CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT)
           AS first_m,
         CAST(MAX(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT)
           AS last_m,
         CAST(COUNT(DISTINCT year(o_orderdate) * 12 + month(o_orderdate))
              AS BIGINT) AS active_months
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, n_orders,
       last_m - first_m + 1 AS span_months,
       active_months,
       round(tot_cents / CAST(100 AS DOUBLE) / n_orders, 6) AS aov,
       round(n_orders / CAST(last_m - first_m + 1 AS DOUBLE), 6)
         AS orders_per_month,
       round(active_months / CAST(last_m - first_m + 1 AS DOUBLE), 6)
         AS retention,
       round(tot_cents / CAST(100 AS DOUBLE) / n_orders
             * (n_orders / CAST(last_m - first_m + 1 AS DOUBLE))
             * (active_months / CAST(last_m - first_m + 1 AS DOUBLE))
             * CAST({_LTV_HORIZON_M} AS DOUBLE), 6) AS ltv_24m
FROM per
"""


def _r6(v: float) -> float:
    """round(double, 6) with Spark/DuckDB semantics: HALF_UP on the
    EXACT binary value of the double (Python's round() is
    banker's-rounding on the shortest repr — wrong on ties)."""
    return float(Decimal(v).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


_LR_XCAP = 30  # integer feature cap (outlier guard + exact arithmetic)


def _lr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, x, y): x = obs-window order count capped at 30
    (INTEGER — see ml_logreg_newton's exactness note), y = 1 if the
    customer ordered in the label window."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = load_table(spark, sf_dir, "orders")
    split = F.lit(_LR_SPLIT).cast("timestamp")
    obs = (
        o.where(F.col("o_orderdate") < split)
        .groupBy("o_custkey")
        .agg(bcount().alias("n_obs"))
    )
    lab = (
        o.where(F.col("o_orderdate") >= split)
        .select("o_custkey")
        .distinct()
        .withColumn("y", F.lit(1))
    )
    return (
        cust.join(obs, cust.custkey == obs.o_custkey, "left")
        .drop("o_custkey")
        .join(lab, cust.custkey == lab.o_custkey, "left")
        .drop("o_custkey")
        .select(
            "custkey",
            F.least(F.coalesce("n_obs", F.lit(0)), F.lit(_LR_XCAP))
            .cast("long")
            .alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )


def ml_logreg_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression P(convert | order history) via three
    exact-arithmetic Newton-Raphson steps — iterative ML as pure
    relational aggregates with a FULL cross-engine oracle (contrast
    ml_train_score, whose RF is R-tier by nature).

    Exactness scheme: the only float per row is the sigmoid, pinned
    to an INTEGER P = round(1e6 * sigmoid(b0 + b1 x)). With x also an
    integer, all five sufficient statistics (gradient + 2x2 Hessian)
    are EXACT integer sums — no per-term decimal rounding, and
    therefore none of the 6-dp half-tie hazards that products of
    rounded doubles create (the trap NOTES.md documents). The
    closed-form 2x2 solve runs on the driver (O(1) state) on doubles
    derived from those exact integers, in the same operation order
    the oracle uses, and coefficients round to 6 dp per step. Returns
    one row per iteration (iter, b0, b1)."""
    feats = _lr_features(spark, sf_dir).localCheckpoint()
    dec38 = "decimal(38,0)"
    b0, b1 = 0.0, 0.0
    out = []
    for it in range(1, _LR_ITERS + 1):
        z = F.lit(b0) + F.lit(b1) * F.col("x")
        p_i = F.round(
            F.lit(1_000_000.0) / (F.lit(1.0) + F.exp(-z))
        ).cast("long")
        tmp = feats.select(
            "x", "y", p_i.alias("p")
        ).select(
            (F.col("y") * 1_000_000 - F.col("p")).alias("t_g0"),
            ((F.col("y") * 1_000_000 - F.col("p")) * F.col("x")).alias(
                "t_g1"
            ),
            (F.col("p") * (1_000_000 - F.col("p"))).alias("t_h00"),
            (F.col("p") * (1_000_000 - F.col("p")) * F.col("x")).alias(
                "t_h01"
            ),
            (
                F.col("p")
                * (1_000_000 - F.col("p"))
                * F.col("x")
                * F.col("x")
            ).alias("t_h11"),
        )
        row = tmp.select(
            *[
                F.sum(F.col(c).cast(dec38)).alias(c[2:])
                for c in ["t_g0", "t_g1", "t_h00", "t_h01", "t_h11"]
            ]
        ).first()
        g0 = float(row.g0) / 1e6
        g1 = float(row.g1) / 1e6
        h00 = float(row.h00) / 1e12
        h01 = float(row.h01) / 1e12
        h11 = float(row.h11) / 1e12
        det = h00 * h11 - h01 * h01
        b0 = _r6(b0 + (h11 * g0 - h01 * g1) / det)
        b1 = _r6(b1 + (h00 * g1 - h01 * g0) / det)
        out.append((it, b0, b1))
    return spark.createDataFrame(out, "iter int, b0 double, b1 double")


def _logreg_iter_sql(prev: str, it: int) -> str:
    """One unrolled Newton step reading coefficients from CTE *prev*.

    Sufficient statistics are exact DECIMAL(38,0) integer sums scaled
    to doubles only at the 2x2 solve — mirroring the Spark/driver
    arithmetic operation-for-operation."""
    return f"""
a{it} AS (
  SELECT
    CAST(SUM(CAST(y * 1000000 - p AS DECIMAL(38,0))) AS DOUBLE)
      / 1e6 AS g0,
    CAST(SUM(CAST((y * 1000000 - p) * x AS DECIMAL(38,0))) AS DOUBLE)
      / 1e6 AS g1,
    CAST(SUM(CAST(p * (1000000 - p) AS DECIMAL(38,0))) AS DOUBLE)
      / 1e12 AS h00,
    CAST(SUM(CAST(p * (1000000 - p) * x AS DECIMAL(38,0))) AS DOUBLE)
      / 1e12 AS h01,
    CAST(SUM(CAST(p * (1000000 - p) * x * x AS DECIMAL(38,0))) AS DOUBLE)
      / 1e12 AS h11
  FROM (SELECT y, x,
               CAST(round(CAST(1000000 AS DOUBLE)
                          / (1.0 + exp(-(b.b0 + b.b1 * x)))) AS BIGINT)
                 AS p
        FROM feats CROSS JOIN {prev} b)),
it{it} AS (
  SELECT {it} AS iter,
         round(b.b0 + (a.h11 * a.g0 - a.h01 * a.g1)
               / (a.h00 * a.h11 - a.h01 * a.h01), 6) AS b0,
         round(b.b1 + (a.h00 * a.g1 - a.h01 * a.g0)
               / (a.h00 * a.h11 - a.h01 * a.h01), 6) AS b1
  FROM a{it} a CROSS JOIN {prev} b)"""


def _logreg_sql() -> str:
    steps = ",".join(
        _logreg_iter_sql("it0" if i == 1 else f"it{i - 1}", i)
        for i in range(1, _LR_ITERS + 1)
    )
    selects = " UNION ALL ".join(
        f"SELECT CAST(iter AS INT) AS iter, b0, b1 FROM it{i}"
        for i in range(1, _LR_ITERS + 1)
    )
    return f"""
WITH feats AS (
  SELECT c.c_custkey,
         CAST(LEAST(COALESCE(o.n_obs, 0), {_LR_XCAP}) AS BIGINT) AS x,
         CAST(CASE WHEN l.o_custkey IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_obs
             FROM orders WHERE o_orderdate < TIMESTAMP '{_LR_SPLIT}'
             GROUP BY o_custkey) o ON c.c_custkey = o.o_custkey
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '{_LR_SPLIT}') l
    ON c.c_custkey = l.o_custkey),
it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1),
{steps}
{selects}
"""


def feat_category_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-concentration profile per customer: the Herfindahl–
    Hirschman index over part-type revenue shares (1 = all spend in
    one category, 1/k = evenly spread over k) plus the dominant
    category — the diversification feature cross-sell targeting keys
    on.

    Exactness: HHI = Σ cents_t² / (Σ cents_t)² is computed as ONE
    double division of two exact DECIMAL(38,0) integers (squares of
    per-category cent sums), sidestepping per-share rounding
    entirely. Dominant category ties break lexicographically.

    Scale posture: lineitem joins the part dim (broadcast-eligible)
    and collapses to (custkey, p_type) in the first aggregate —
    map-side combined; everything after runs on ≤ |types| rows per
    customer, keyed by custkey throughout."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_type = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "p_type", cents.alias("cents"))
        .groupBy("o_custkey", "p_type")
        .agg(F.sum("cents").cast("long").alias("c_t"))
    )
    # Dominant type via a rank-1 window on the SAME custkey
    # partitioning the final aggregate uses — per_type is computed
    # once and lineitem is scanned once (a join-back arg-max would
    # re-derive the 3-table join per reference).
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("c_t").desc(), F.col("p_type").asc()
    )
    ranked = per_type.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy("o_custkey").agg(
        bcount().alias("n_categories"),
        F.sum(F.col("c_t").cast("decimal(38,0)")).alias("tot"),
        F.sum(
            (F.col("c_t").cast("decimal(38,0)") * F.col("c_t")).cast(
                "decimal(38,0)"
            )
        ).alias("ssq"),
        F.max(F.when(F.col("rk") == 1, F.col("p_type"))).alias(
            "dominant_type"
        ),
    )
    return agg.select(
        "o_custkey",
        "n_categories",
        F.round(
            F.col("ssq").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("hhi"),
        "dominant_type",
    )


_HHI_SQL = """
WITH per_type AS (
  SELECT o.o_custkey, p.p_type,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS c_t
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY c_t DESC, p_type ASC) AS rk
  FROM per_type)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_categories,
       round(CAST(SUM(CAST(c_t AS DECIMAL(38,0)) * c_t) AS DOUBLE)
             / (CAST(SUM(CAST(c_t AS DECIMAL(38,0))) AS DOUBLE)
                * CAST(SUM(CAST(c_t AS DECIMAL(38,0))) AS DOUBLE)), 6)
         AS hhi,
       MAX(CASE WHEN rk = 1 THEN p_type END) AS dominant_type
FROM ranked GROUP BY o_custkey
"""


_KM_K = 4
_KM_ITERS = 2


def _km_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, x1, x2): integer features — account balance in cents
    and order count (0 for never-ordered customers)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x1"),
    )
    n_ord = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(bcount().alias("n"))
    )
    return (
        cust.join(n_ord, cust.c_custkey == n_ord.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            "x1",
            F.coalesce("n", F.lit(0)).cast("long").alias("x2"),
        )
    )


def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 2 iterations) with a FULL cross-engine
    oracle — iterative clustering as relational aggregates, the
    companion piece to ml_logreg_newton.

    Determinism: integer features; init = the k points ranked first
    by md5(custkey); assignment is a MAP-ONLY nested-CASE argmin over
    k inlined centroid literals with <=-comparisons so distance ties
    go to the lowest cluster id; centroid updates are exact DECIMAL
    sums / counts rounded to 6 dp; empty clusters keep their previous
    centroid. (x - c) is exact in a double (41 bits needed, 53
    available), so dist² is the identically-rounded IEEE product in
    both engines.

    Scale posture: each iteration is ONE aggregate over the
    checkpointed point frame (assignment never shuffles — no points x
    centroids join); driver state is k 2-vectors."""
    pts = _km_points(spark, sf_dir).localCheckpoint()
    # Init selection via orderBy().limit(k): TakeOrderedAndProject
    # (per-partition heap + driver merge) — never a partitionless
    # row_number window dragging every point into one task.
    init = (
        pts.select(
            "x1", "x2", F.md5(F.col("custkey").cast("string")).alias("h"),
            "custkey",
        )
        .orderBy("h", "custkey")
        .limit(_KM_K)
        .collect()
    )
    cents = {
        i + 1: (float(r.x1), float(r.x2)) for i, r in enumerate(init)
    }  # cid -> (c1, c2)
    out = []
    for it in range(1, _KM_ITERS + 1):
        d = {
            cid: (F.col("x1") - F.lit(c1)) * (F.col("x1") - F.lit(c1))
            + (F.col("x2") - F.lit(c2)) * (F.col("x2") - F.lit(c2))
            for cid, (c1, c2) in sorted(cents.items())
        }
        assigned = F.lit(_KM_K)
        for cid in range(_KM_K - 1, 0, -1):
            cond = None
            for other in range(cid + 1, _KM_K + 1):
                c = d[cid] <= d[other]
                cond = c if cond is None else (cond & c)
            assigned = F.when(cond, F.lit(cid)).otherwise(assigned)
        stats = (
            pts.select(assigned.alias("cid"), "x1", "x2")
            .groupBy("cid")
            .agg(
                bcount().alias("n_points"),
                F.round(
                    F.sum(F.col("x1").cast(_DEC)).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("c1"),
                F.round(
                    F.sum(F.col("x2").cast(_DEC)).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("c2"),
            )
            .collect()
        )
        got = {r.cid: r for r in stats}
        for cid in range(1, _KM_K + 1):
            if cid in got:
                cents[cid] = (got[cid].c1, got[cid].c2)
                n = got[cid].n_points
            else:
                n = 0  # empty cluster: centroid unchanged
            out.append((it, cid, n, cents[cid][0], cents[cid][1]))
    return spark.createDataFrame(
        out, "iter int, cluster_id int, n_points long, c1 double, c2 double"
    )


def _km_assign_sql(prev: str) -> str:
    """Nested-CASE argmin matching the Spark when-chain (lowest cid
    wins ties via <=)."""
    dists = {
        cid: (
            f"((p.x1 - c.c1_{cid}) * (p.x1 - c.c1_{cid})"
            f" + (p.x2 - c.c2_{cid}) * (p.x2 - c.c2_{cid}))"
        )
        for cid in range(1, _KM_K + 1)
    }
    cases = []
    for cid in range(1, _KM_K):
        conds = " AND ".join(
            f"{dists[cid]} <= {dists[o]}" for o in range(cid + 1, _KM_K + 1)
        )
        cases.append(f"WHEN {conds} THEN {cid}")
    case = "CASE " + " ".join(cases) + f" ELSE {_KM_K} END"
    return f"SELECT {case} AS cid, p.x1, p.x2 FROM pts p CROSS JOIN {prev} c"


def _km_iter_sql(prev: str, it: int) -> str:
    # prev is referenced ONCE per CTE (a 1-row CROSS JOIN) — a scalar
    # subquery per centroid column would re-execute the whole previous
    # iteration per reference (measured: 20 s -> ~1 s on DuckDB).
    prev_cols = ", ".join(
        f"p.c1_{cid}, p.c2_{cid}" for cid in range(1, _KM_K + 1)
    )
    stats = f"""
st{it} AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points,
         round(CAST(SUM(CAST(x1 AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*), 6) AS c1,
         round(CAST(SUM(CAST(x2 AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*), 6) AS c2
  FROM ({_km_assign_sql(prev)}) GROUP BY cid)"""
    wide = ", ".join(
        f"COALESCE(MAX(CASE WHEN cid = {cid} THEN c1 END), p.c1_{cid})"
        f" AS c1_{cid},"
        f" COALESCE(MAX(CASE WHEN cid = {cid} THEN c2 END), p.c2_{cid})"
        f" AS c2_{cid},"
        f" COALESCE(MAX(CASE WHEN cid = {cid} THEN n_points END), 0)"
        f" AS n_{cid}"
        for cid in range(1, _KM_K + 1)
    )
    return (
        f"{stats},\nit{it} AS (SELECT {wide} FROM st{it}"
        f" CROSS JOIN {prev} p GROUP BY {prev_cols})"
    )


def _kmeans_sql() -> str:
    steps = ",".join(
        _km_iter_sql("it0" if i == 1 else f"it{i - 1}", i)
        for i in range(1, _KM_ITERS + 1)
    )
    emits = []
    for it in range(1, _KM_ITERS + 1):
        picks = " ".join(
            f"WHEN {cid} THEN w.{{col}}_{cid}" for cid in range(1, _KM_K + 1)
        )
        c1_case = "CASE v.cluster_id " + picks.format(col="c1") + " END"
        c2_case = "CASE v.cluster_id " + picks.format(col="c2") + " END"
        n_case = "CASE v.cluster_id " + picks.format(col="n") + " END"
        emits.append(
            f"SELECT {it} AS iter, v.cluster_id,"
            f" CAST({n_case} AS BIGINT) AS n_points,"
            f" {c1_case} AS c1, {c2_case} AS c2"
            f" FROM (VALUES {', '.join(f'({c})' for c in range(1, _KM_K + 1))})"
            f" v(cluster_id) CROSS JOIN it{it} w"
        )
    init_cols = ", ".join(
        f"MAX(CASE WHEN rn = {cid} THEN CAST(x1 AS DOUBLE) END) AS c1_{cid},"
        f" MAX(CASE WHEN rn = {cid} THEN CAST(x2 AS DOUBLE) END) AS c2_{cid}"
        for cid in range(1, _KM_K + 1)
    )
    return f"""
WITH pts AS (
  SELECT c.c_custkey AS custkey,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS x1,
         CAST(COALESCE(o.n, 0) AS BIGINT) AS x2
  FROM customer c
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders
             GROUP BY o_custkey) o ON c.c_custkey = o.o_custkey),
ranked AS (
  SELECT x1, x2, row_number() OVER (
    ORDER BY md5(CAST(custkey AS VARCHAR)), custkey) AS rn
  FROM pts),
it0 AS (SELECT {init_cols} FROM ranked WHERE rn <= {_KM_K}),
{steps}
{" UNION ALL ".join(emits)}
"""


_BRIDGE_Y0, _BRIDGE_Y1 = 1997, 1998


def agg_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue bridge per market segment: the
    Δrevenue between two years decomposed into a VOLUME effect
    ((n1−n0)·aov0) and a PRICE/MIX effect (n1·(aov1−aov0)) — the
    waterfall every revenue review starts from; the two effects sum
    exactly to the delta by construction.

    Counts and cent sums are exact integers; the two effects are
    mirrored-order double products rounded at emission. One fact
    aggregate keyed by (segment, year); the bridge arithmetic runs on
    the |segments|-row result."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = (
        o.where(yr.isin(_BRIDGE_Y0, _BRIDGE_Y1))
        .join(cust, o.o_custkey == cust.c_custkey)
        .select("c_mktsegment", yr.alias("y"), cents.alias("cents"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("y") == _BRIDGE_Y0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(F.col("y") == _BRIDGE_Y1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(
                F.when(F.col("y") == _BRIDGE_Y0, F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("rev0_c"),
            F.sum(
                F.when(F.col("y") == _BRIDGE_Y1, F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("rev1_c"),
        )
    )
    aov0 = F.col("rev0_c").cast("double") / F.col("n0")
    aov1 = F.col("rev1_c").cast("double") / F.col("n1")
    return per.select(
        "c_mktsegment",
        "n0",
        "n1",
        "rev0_c",
        "rev1_c",
        (F.col("rev1_c") - F.col("rev0_c")).alias("delta_c"),
        F.round((F.col("n1") - F.col("n0")) * aov0 / 100.0, 6).alias(
            "volume_effect"
        ),
        F.round(F.col("n1") * (aov1 - aov0) / 100.0, 6).alias(
            "price_effect"
        ),
    )


_BRIDGE_SQL = f"""
WITH per AS (
  SELECT c.c_mktsegment,
         CAST(SUM(CASE WHEN year(o.o_orderdate) = {_BRIDGE_Y0}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN year(o.o_orderdate) = {_BRIDGE_Y1}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN year(o.o_orderdate) = {_BRIDGE_Y0}
                       THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev0_c,
         CAST(SUM(CASE WHEN year(o.o_orderdate) = {_BRIDGE_Y1}
                       THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev1_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE year(o.o_orderdate) IN ({_BRIDGE_Y0}, {_BRIDGE_Y1})
  GROUP BY 1)
SELECT c_mktsegment, n0, n1, rev0_c, rev1_c,
       rev1_c - rev0_c AS delta_c,
       round((n1 - n0) * (CAST(rev0_c AS DOUBLE) / n0)
             / CAST(100 AS DOUBLE), 6) AS volume_effect,
       round(n1 * (CAST(rev1_c AS DOUBLE) / n1
                   - CAST(rev0_c AS DOUBLE) / n0)
             / CAST(100 AS DOUBLE), 6) AS price_effect
FROM per
"""



def feat_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into NEW (first-ever purchase that month)
    vs RETURNING customers — the acquisition-vs-retention lens every
    growth review opens with. A customer's first month comes from one
    min-aggregate; the month rollup is exact integer cents with a
    derived new-revenue share."""
    o = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select("o_custkey", ym.alias("ym"), cents.alias("cents"))
    first = base.groupBy("o_custkey").agg(F.min("ym").alias("first_ym"))
    j = base.join(first, "o_custkey")
    is_new = F.col("ym") == F.col("first_ym")
    per = j.groupBy("ym").agg(
        F.countDistinct(F.when(is_new, F.col("o_custkey"))).cast("long").alias(
            "new_customers"
        ),
        F.countDistinct(F.when(~is_new, F.col("o_custkey")))
        .cast("long")
        .alias("returning_customers"),
        F.sum(F.when(is_new, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("new_rev_c"),
        F.sum(F.when(~is_new, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("ret_rev_c"),
    )
    total = F.col("new_rev_c") + F.col("ret_rev_c")
    return per.select(
        "ym",
        "new_customers",
        "returning_customers",
        "new_rev_c",
        "ret_rev_c",
        F.round(
            F.col("new_rev_c").cast("double") / total.cast("double"), 6
        ).alias("new_rev_share"),
    )


_NVR_SQL = """
WITH base AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS ym,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
first AS (SELECT o_custkey, MIN(ym) AS first_ym FROM base GROUP BY 1),
j AS (SELECT b.*, f.first_ym FROM base b JOIN first f USING (o_custkey))
SELECT ym,
       CAST(COUNT(DISTINCT CASE WHEN ym = first_ym THEN o_custkey END)
            AS BIGINT) AS new_customers,
       CAST(COUNT(DISTINCT CASE WHEN ym <> first_ym THEN o_custkey END)
            AS BIGINT) AS returning_customers,
       CAST(SUM(CASE WHEN ym = first_ym THEN cents ELSE 0 END) AS BIGINT)
         AS new_rev_c,
       CAST(SUM(CASE WHEN ym <> first_ym THEN cents ELSE 0 END) AS BIGINT)
         AS ret_rev_c,
       round(CAST(SUM(CASE WHEN ym = first_ym THEN cents ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE), 6) AS new_rev_share
FROM j GROUP BY ym
"""



def ml_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part-type log-log price elasticity: OLS slope of
    ln(quantity) on ln(unit price) over lineitems — the demand-curve
    first cut pricing teams ask for. Same determinism scheme as
    text_zipf_fit: transcendental terms rounded to 6 dp, DECIMAL
    sufficient sums, closed-form slope; one fact aggregate keyed by
    type (part dim broadcast)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).where(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    x = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    y = F.log(F.col("l_quantity"))

    def d6(c):
        # Exact-equivalent fast form of sum(round(c,6)::DECIMAL(30,6)):
        # wide-decimal (precision > 18) hash aggregation runs outside
        # codegen on boxed Int128 values and cost ~2.8 s of this op's
        # 3.6 s isolated floor (round-11 decomposition). The summand is
        # a 6-dp-quantized ln-scale value (|x| <= ln(maxprice) < 16,
        # x*x < 256), so its exact integer micros fit a LONG with
        # >3.6e10 rows/group of headroom at 100 TB — sum the micros as
        # LONG (codegen hash agg), then reconstruct the exact decimal
        # quotient before the double cast. round(round(c,6)*1e6, 0)
        # recovers the integer micros exactly (the product sits within
        # 1 ulp ~ 1e-8 of the integer); the final cast is the same
        # correctly-rounded decimal->double conversion as before, so
        # every emitted double is bit-identical (verified at all three
        # test SFs and against the unchanged DuckDB oracle).
        m = F.round(F.round(c, 6) * F.lit(1000000.0), 0).cast("long")
        return (F.sum(m).cast("decimal(30,0)") / F.lit(1000000)).cast(
            "double"
        )

    agg = j.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        d6(x).alias("sx"),
        d6(y).alias("sy"),
        d6(x * y).alias("sxy"),
        d6(x * x).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "p_type",
        F.col("n").cast("long").alias("n_lines"),
        F.round(slope, 6).alias("elasticity"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


_ELASTICITY_SQL = """
WITH j AS (
  SELECT p.p_type,
         ln(l.l_extendedprice / l.l_quantity) AS x,
         ln(l.l_quantity) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
agg AS (
  SELECT p_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(round(x, 6) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(y, 6) AS DECIMAL(30,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(30,6))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(30,6))) AS DOUBLE)
           AS sxx
  FROM j GROUP BY p_type)
SELECT p_type,
       CAST(n AS BIGINT) AS n_lines,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS intercept
FROM agg
"""


_SEG_BOUNDS = [(0, "none"), (1, "light"), (3, "mid"), (6, "heavy")]


def feat_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-segment migration matrix across the 2000-01-01 split:
    each customer's order count in the before/after periods maps to a
    deterministic tier (none / light 1-2 / mid 3-5 / heavy 6+), and
    the matrix counts every (from, to) flow — the churn/upgrade
    waterfall a lifecycle team watches. Pure integer thresholds; two
    count aggregates + one outer join on custkey."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck")
    )
    split = F.lit(_LR_SPLIT).cast("timestamp")

    def tier(n):
        return (
            F.when(n >= 6, "heavy")
            .when(n >= 3, "mid")
            .when(n >= 1, "light")
            .otherwise("none")
        )

    def period(cond, name):
        return (
            o.where(cond)
            .groupBy("o_custkey")
            .agg(bcount().alias(name))
        )

    p0 = period(F.col("o_orderdate") < split, "n0")
    p1 = period(F.col("o_orderdate") >= split, "n1")
    j = (
        cust.join(p0, cust.ck == p0.o_custkey, "left")
        .drop("o_custkey")
        .join(p1, cust.ck == p1.o_custkey, "left")
        .drop("o_custkey")
        .select(
            tier(F.coalesce("n0", F.lit(0))).alias("seg_before"),
            tier(F.coalesce("n1", F.lit(0))).alias("seg_after"),
        )
    )
    out = j.groupBy("seg_before", "seg_after").agg(
        bcount().alias("n_customers")
    )
    w = Window.partitionBy("seg_before")
    return out.select(
        "seg_before",
        "seg_after",
        "n_customers",
        F.round(
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(w).cast("double"),
            6,
        ).alias("row_share"),
    )


_MIGRATION_SQL = f"""
WITH p0 AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n0 FROM orders
  WHERE o_orderdate < TIMESTAMP '{_LR_SPLIT}' GROUP BY 1),
p1 AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n1 FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_LR_SPLIT}' GROUP BY 1),
t AS (
  SELECT CASE WHEN COALESCE(p0.n0, 0) >= 6 THEN 'heavy'
              WHEN COALESCE(p0.n0, 0) >= 3 THEN 'mid'
              WHEN COALESCE(p0.n0, 0) >= 1 THEN 'light'
              ELSE 'none' END AS seg_before,
         CASE WHEN COALESCE(p1.n1, 0) >= 6 THEN 'heavy'
              WHEN COALESCE(p1.n1, 0) >= 3 THEN 'mid'
              WHEN COALESCE(p1.n1, 0) >= 1 THEN 'light'
              ELSE 'none' END AS seg_after
  FROM customer c
  LEFT JOIN p0 ON c.c_custkey = p0.o_custkey
  LEFT JOIN p1 ON c.c_custkey = p1.o_custkey),
m AS (
  SELECT seg_before, seg_after, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM t GROUP BY 1, 2)
SELECT seg_before, seg_after, n_customers,
       round(CAST(n_customers AS DOUBLE)
             / CAST(SUM(n_customers) OVER (PARTITION BY seg_before)
                    AS DOUBLE), 6) AS row_share
FROM m
"""


QUERIES = {
    "ml_price_elasticity": ml_price_elasticity,
    "feat_segment_migration": feat_segment_migration,
    "feat_new_vs_returning": feat_new_vs_returning,
    "feat_ltv_heuristic": feat_ltv_heuristic,
    "feat_category_hhi": feat_category_hhi,
    "agg_revenue_bridge": agg_revenue_bridge,
    "ml_logreg_newton": ml_logreg_newton,
    "ml_kmeans_lloyd": ml_kmeans_lloyd,
}
ORACLE = {
    "ml_price_elasticity": _ELASTICITY_SQL,
    "feat_segment_migration": _MIGRATION_SQL,
    "feat_new_vs_returning": _NVR_SQL,
    "feat_ltv_heuristic": _LTV_SQL,
    "feat_category_hhi": _HHI_SQL,
    "agg_revenue_bridge": _BRIDGE_SQL,
    "ml_logreg_newton": _logreg_sql(),
    "ml_kmeans_lloyd": _kmeans_sql(),
}


# ---------------------------------------------------------------------------
# Decile lift / cumulative-gains table (round 4): the standard model-
# evaluation table a Customer-360 scoring pipeline emits.


def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift and cumulative-gains by score decile: customers ranked by
    account balance (the stand-in propensity score), label = placed an
    order on/after 2000-01-01. Per decile: size, positives, cumulative
    capture rate, and lift vs the base rate.

    Determinism: ntile ties are impossible because the ordering key is
    (score DESC, custkey ASC) — total order. All rates divide exact
    BIGINTs in identically-written single IEEE expressions. Scale: one
    orders aggregate (semi-join-sized), one customer scan; the global
    ntile is the one expensive step — a range-partitioned sort over
    the customer table (ntile needs a total order by definition; at
    100 TB you'd swap it for a percentile-threshold bucketing if the
    exact equal-count property can be relaxed). Everything after the
    decile assignment aggregates to 10 rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
        .withColumn("pos", F.lit(1).cast("long"))
    )
    labeled = cust.join(recent, cust.c_custkey == recent.o_custkey, "left").select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("pos", F.lit(0).cast("long")).alias("pos"),
    )
    w = Window.partitionBy().orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    deciles = labeled.withColumn("decile", F.ntile(10).over(w).cast("long"))
    agg = deciles.groupBy("decile").agg(
        bcount().alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    cum = Window.partitionBy().orderBy("decile")
    tot = Window.partitionBy()
    return agg.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(cum).alias("cum_n"),
        F.sum("n_pos").over(cum).alias("cum_pos"),
        F.round(
            (F.sum("n_pos").over(cum).cast("double") / F.sum("n_pos").over(tot).cast("double")),
            6,
        ).alias("capture_rate"),
        F.round(
            (F.sum("n_pos").over(cum).cast("double") / F.sum("n").over(cum).cast("double"))
            / (F.sum("n_pos").over(tot).cast("double") / F.sum("n").over(tot).cast("double")),
            6,
        ).alias("cum_lift"),
    )


_DECILE_LIFT_SQL = """
WITH recent AS (
  SELECT DISTINCT o_custkey, CAST(1 AS BIGINT) AS pos
  FROM orders WHERE o_orderdate >= '2000-01-01'),
labeled AS (
  SELECT c.c_custkey, c.c_acctbal, COALESCE(r.pos, 0) AS pos
  FROM customer c LEFT JOIN recent r ON c.c_custkey = r.o_custkey),
deciles AS (
  SELECT *, CAST(ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
                 AS BIGINT) AS decile
  FROM labeled),
agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM deciles GROUP BY decile)
SELECT decile, n, n_pos,
       CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
       CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
       round(CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(n_pos) OVER () AS DOUBLE), 6) AS capture_rate,
       round((CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE)
              / CAST(SUM(n) OVER (ORDER BY decile) AS DOUBLE))
             / (CAST(SUM(n_pos) OVER () AS DOUBLE)
                / CAST(SUM(n) OVER () AS DOUBLE)), 6) AS cum_lift
FROM agg
"""

QUERIES["agg_decile_lift"] = agg_decile_lift
ORACLE["agg_decile_lift"] = _DECILE_LIFT_SQL


_POIS_ITERS = 6


def _poisson_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, x, y) for ml_poisson_irls: x = acctbal band 0..9
    ($1K-wide, clipped), y = lifetime order count — both exact
    integers (the ml_logreg_newton exactness scheme)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.greatest(
            F.lit(0),
            F.least(F.lit(9), F.floor(F.col("c_acctbal") / 1000.0)),
        )
        .cast("long")
        .alias("x"),
    )
    n_ord = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(bcount().alias("y"))
    )
    return (
        cust.join(n_ord, cust.custkey == n_ord.o_custkey, "left")
        .select(
            "custkey", "x", F.coalesce("y", F.lit(0)).cast("long").alias("y")
        )
    )


def ml_poisson_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson regression (log link) of order count on the acctbal
    band via Newton/IRLS — the GLM for count targets, companion to
    ml_logreg_newton (binary) and ml_linreg_closed_form (gaussian).

    Same exactness scheme as ml_logreg_newton (features/value.py:155):
    the per-row mean is pinned to the INTEGER M = round(1e6·exp(b0 +
    b1·x)); gradient Σ(y−μ)·[1,x] and Fisher info Σμ·[1,x][1,x]ᵀ are
    then exact DECIMAL(38,0) integer sums, the 2×2 solve runs on the
    driver in the oracle's operation order, and coefficients round to
    6 dp per step. b0 starts at ln(ȳ) (rounded; computed from the
    exact integer totals) so Newton never overshoots the exp link;
    b1 starts at 0. One aggregate job per iteration — at 100 TB each
    is a map-side-combined pass over the feature frame; the sequential
    depth is the fixed iteration count, exactly like any distributed
    GLM solver."""
    import math

    feats = _poisson_features(spark, sf_dir).localCheckpoint()
    dec38 = "decimal(38,0)"
    tot = feats.agg(
        F.sum("y").cast("long").alias("sy"), bcount().alias("n")
    ).first()
    b0 = _r6(math.log(float(tot.sy) / float(tot.n)))
    b1 = 0.0
    out = []
    for it in range(1, _POIS_ITERS + 1):
        m_i = F.round(
            F.lit(1_000_000.0) * F.exp(F.lit(b0) + F.lit(b1) * F.col("x"))
        ).cast("long")
        tmp = feats.select("x", "y", m_i.alias("m")).select(
            (F.col("y") * 1_000_000 - F.col("m")).alias("t_g0"),
            ((F.col("y") * 1_000_000 - F.col("m")) * F.col("x")).alias(
                "t_g1"
            ),
            F.col("m").alias("t_h00"),
            (F.col("m") * F.col("x")).alias("t_h01"),
            (F.col("m") * F.col("x") * F.col("x")).alias("t_h11"),
        )
        row = tmp.select(
            *[
                F.sum(F.col(c).cast(dec38)).alias(c[2:])
                for c in ["t_g0", "t_g1", "t_h00", "t_h01", "t_h11"]
            ]
        ).first()
        g0 = float(row.g0) / 1e6
        g1 = float(row.g1) / 1e6
        h00 = float(row.h00) / 1e6
        h01 = float(row.h01) / 1e6
        h11 = float(row.h11) / 1e6
        det = h00 * h11 - h01 * h01
        # Tie-free premise (ADVICE r8): the Newton update is a quotient
        # of exact-integer-derived doubles with no 6-dp-image guarantee,
        # so _r6 parity with the oracle's round(x, 6) rests on the update
        # never landing ON a 6-dp half-tie. Unlike ts_ses_grid's 1-dp x
        # 6-dp products (systematic exact ties), a double here sits on a
        # tie only if the division yields an exactly-representable
        # N.xxxxxx5 binary value — none exists at any shipped SF (the
        # sf0.001 parity suite would flag the first one as a 6th-dp
        # hash split). If that ever fires, pin the update to an integer
        # grid as ml_logreg_newton does with its M-scaling (line ~210).
        b0 = _r6(b0 + (h11 * g0 - h01 * g1) / det)
        b1 = _r6(b1 + (h00 * g1 - h01 * g0) / det)
        out.append((it, b0, b1))
    return spark.createDataFrame(out, "iter int, b0 double, b1 double")


def _poisson_iter_sql(prev: str, it: int) -> str:
    """One unrolled IRLS step reading coefficients from CTE *prev* —
    textually mirrors the Spark/driver arithmetic."""
    return f"""
p{it} AS (
  SELECT
    CAST(SUM(CAST(y * 1000000 - m AS DECIMAL(38,0))) AS DOUBLE)
      / 1e6 AS g0,
    CAST(SUM(CAST((y * 1000000 - m) * x AS DECIMAL(38,0))) AS DOUBLE)
      / 1e6 AS g1,
    CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS h00,
    CAST(SUM(CAST(m * x AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS h01,
    CAST(SUM(CAST(m * x * x AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS h11
  FROM (SELECT y, x,
               CAST(round(1000000.0 * exp(b.b0 + b.b1 * x)) AS BIGINT) AS m
        FROM pfeats CROSS JOIN {prev} b)),
pit{it} AS (
  SELECT {it} AS iter,
         round(b.b0 + (a.h11 * a.g0 - a.h01 * a.g1)
               / (a.h00 * a.h11 - a.h01 * a.h01), 6) AS b0,
         round(b.b1 + (a.h00 * a.g1 - a.h01 * a.g0)
               / (a.h00 * a.h11 - a.h01 * a.h01), 6) AS b1
  FROM p{it} a CROSS JOIN {prev} b)"""


def _poisson_sql() -> str:
    steps = ",".join(
        _poisson_iter_sql("pit0" if i == 1 else f"pit{i - 1}", i)
        for i in range(1, _POIS_ITERS + 1)
    )
    selects = " UNION ALL ".join(
        f"SELECT CAST(iter AS INT) AS iter, b0, b1 FROM pit{i}"
        for i in range(1, _POIS_ITERS + 1)
    )
    return f"""
WITH pfeats AS (
  SELECT c.c_custkey,
         CAST(GREATEST(0, LEAST(9, floor(c.c_acctbal / 1000.0)))
           AS BIGINT) AS x,
         CAST(COALESCE(o.y, 0) AS BIGINT) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS y
             FROM orders GROUP BY o_custkey) o
    ON c.c_custkey = o.o_custkey),
pit0 AS (
  SELECT round(ln(CAST((SELECT SUM(y) FROM pfeats) AS DOUBLE)
               / (SELECT COUNT(*) FROM pfeats)), 6) AS b0,
         CAST(0.0 AS DOUBLE) AS b1),
{steps}
{selects}
"""


QUERIES["ml_poisson_irls"] = ml_poisson_irls
ORACLE["ml_poisson_irls"] = _poisson_sql()


_UCB_ARMS = ["click", "error", "purchase", "signup", "view"]  # sorted
_UCB_THRESH = 50.0

_UCB_OUT = (
    "user_id long, n_rounds long, policy_reward long, best_arm string, "
    "best_reward long, regret long"
)


def _ucb1_user(pdf):
    """UCB1 replay over one user's event sequence. Rounds are the
    user's events in time order; arms are the five event types; the
    policy earns the event's reward flag only when it chose the arm
    the event actually belongs to. Scores round to 6 dp before the
    argmax (first-max-wins tie-break) so the arm choices — and
    therefore the whole trajectory — are bit-reproducible in the
    oracle's recursion."""
    import math

    import pandas as pd

    pdf = pdf.sort_values(["ts_us", "event_id"])
    types = [int(t) for t in pdf["tidx"]]  # 1-based arm index
    flags = [int(f) for f in pdf["flag"]]
    k = len(_UCB_ARMS)
    counts = [0] * k
    sums = [0] * k
    total = 0
    for t in range(1, len(types) + 1):
        if t <= k:
            chosen = t - 1
        else:
            scores = [
                round(
                    sums[i] / counts[i]
                    + math.sqrt(2.0 * math.log(float(t)) / counts[i]),
                    6,
                )
                for i in range(k)
            ]
            chosen = scores.index(max(scores))
        r = 1 if (types[t - 1] - 1 == chosen and flags[t - 1]) else 0
        counts[chosen] += 1
        sums[chosen] += r
        total += r
    # hindsight-best single arm: the most rewarding arm if always played
    per_arm = [0] * k
    for ty, fl in zip(types, flags):
        per_arm[ty - 1] += fl
    best_i = per_arm.index(max(per_arm))
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_rounds": [len(types)],
            "policy_reward": [total],
            "best_arm": [_UCB_ARMS[best_i]],
            "best_reward": [per_arm[best_i]],
            "regret": [per_arm[best_i] - total],
        }
    )


def ml_ucb1_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline bandit-policy evaluation: replay every user's event
    stream as UCB1 rounds (arms = event types, reward = high-value
    event of the chosen type) and report the policy's realized reward
    against the hindsight-best single arm — the regret readout a
    next-best-offer engine uses to compare targeting policies before
    deploying one.

    The per-user trajectory is inherently sequential, so it runs as
    applyInPandas over users (the ts_dtw_profiles custom-operator
    shape: thousands of independent O(rounds·k) tasks); everything
    upstream is one sort-free projection. The oracle replays the
    identical rounded trajectory per user in a DuckDB recursive CTE
    carrying (counts, sums) as list state. Cross-engine float parity:
    ln/sqrt appear only inside a 6-dp round on O(1) magnitudes (the
    ml_logreg_newton boundary argument)."""
    ev = load_table(spark, sf_dir, "events")
    tidx = F.array_position(
        F.array(*[F.lit(a) for a in _UCB_ARMS]), F.col("event_type")
    ).cast("int")
    seq = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        tidx.alias("tidx"),
        (F.col("value") > _UCB_THRESH).cast("int").alias("flag"),
    )
    return seq.groupBy("user_id").applyInPandas(_ucb1_user, _UCB_OUT)


def _ucb1_sql() -> str:
    k = len(_UCB_ARMS)
    arms_sql = "[" + ", ".join(f"'{a}'" for a in _UCB_ARMS) + "]"
    # UCB scores over the carried state; embedded repeatedly (the
    # expression is pure, DuckDB CSE handles the duplication).
    scores = (
        "list_transform(range(1, {k1}), i -> "
        "round(CAST(w.sums[i] AS DOUBLE) / w.counts[i]"
        " + sqrt(2.0 * ln(CAST(w.t + 1 AS DOUBLE)) / w.counts[i]), 6))"
    ).format(k1=k + 1)
    chosen = (
        f"CASE WHEN w.t + 1 <= {k} THEN w.t + 1 "
        f"ELSE list_position({scores}, list_aggregate({scores}, 'max')) END"
    )
    return f"""
WITH RECURSIVE seq AS (
  SELECT user_id,
         list(list_position({arms_sql}, event_type)
              ORDER BY ts, event_id) AS tl,
         list(CASE WHEN value > {_UCB_THRESH} THEN 1 ELSE 0 END
              ORDER BY ts, event_id) AS fl,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id),
walk(user_id, t, counts, sums, total) AS (
  SELECT user_id, CAST(0 AS BIGINT),
         list_transform(range({k}), i -> CAST(0 AS BIGINT)),
         list_transform(range({k}), i -> CAST(0 AS BIGINT)),
         CAST(0 AS BIGINT)
  FROM seq
  UNION ALL
  SELECT w.user_id, w.t + 1,
         list_transform(range(1, {k + 1}), i ->
           w.counts[i] + CASE WHEN i = ({chosen}) THEN 1 ELSE 0 END),
         list_transform(range(1, {k + 1}), i ->
           w.sums[i] + CASE WHEN i = ({chosen})
                        AND s.tl[w.t + 1] = ({chosen})
                        AND s.fl[w.t + 1] = 1 THEN 1 ELSE 0 END),
         w.total + CASE WHEN s.tl[w.t + 1] = ({chosen})
                         AND s.fl[w.t + 1] = 1 THEN 1 ELSE 0 END
  FROM walk w JOIN seq s USING (user_id)
  WHERE w.t < s.n),
fin AS (
  SELECT w.user_id, s.n AS n_rounds, w.total AS policy_reward
  FROM walk w JOIN seq s USING (user_id) WHERE w.t = s.n),
hindsight AS (
  SELECT user_id, event_type,
         CAST(SUM(CASE WHEN value > {_UCB_THRESH} THEN 1 ELSE 0 END)
           AS BIGINT) AS arm_reward
  FROM events GROUP BY 1, 2),
best AS (
  SELECT user_id, event_type AS best_arm, arm_reward AS best_reward
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY arm_reward DESC, event_type) AS rn
        FROM hindsight) WHERE rn = 1)
SELECT f.user_id, f.n_rounds, f.policy_reward,
       b.best_arm, b.best_reward,
       b.best_reward - f.policy_reward AS regret
FROM fin f JOIN best b USING (user_id)
"""


QUERIES["ml_ucb1_replay"] = ml_ucb1_replay
ORACLE["ml_ucb1_replay"] = _ucb1_sql()


def ml_ips_offpolicy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-scored off-policy evaluation, the estimator
    used to vet a targeting policy offline before an A/B test (and the
    closed-form companion to ml_ucb1_replay's sequential simulation):
    the candidate policy π(user) = the user's most-frequent event type
    in the FIRST half of their history; it is evaluated on the SECOND
    half, where each matching round contributes reward/p(a) with p(a)
    the global empirical arm frequency over the eval half.

    Every quantity is a ratio of exact integers (match counts, reward
    counts, arm counts), so the IPS and direct-method estimates are
    single deterministic float expressions rounded at 6 dp — full
    O-tier with zero recursion. Two windowed passes over events, both
    sharing the user_id partitioning; the arm-frequency table is 5
    rows, broadcast."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.col("value") > 50.0).cast("long").alias("r"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).localCheckpoint()
    first = seq.where(F.col("rn") * 2 <= F.col("n"))
    pol = (
        first.groupBy("user_id", "event_type")
        .agg(bcount().alias("c"))
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("c").desc(), F.col("event_type")
                )
            ),
        )
        .where("prn = 1")
        .select("user_id", F.col("event_type").alias("policy_arm"))
    )
    ev_half = seq.where(F.col("rn") * 2 > F.col("n"))
    prop = ev_half.groupBy("event_type").agg(bcount().alias("n_arm"))
    n_eval_total = ev_half.agg(bcount().alias("n_tot"))
    scored = (
        ev_half.join(pol, "user_id")
        .join(F.broadcast(prop), "event_type")
        .crossJoin(F.broadcast(n_eval_total))
    )
    return (
        scored.groupBy("user_id", "policy_arm")
        .agg(
            bcount().alias("n_eval"),
            F.sum(
                F.when(
                    F.col("event_type") == F.col("policy_arm"),
                    F.col("r")
                    * F.col("n_tot").cast("double")
                    / F.col("n_arm").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("ips_sum"),
            F.sum(
                F.when(F.col("event_type") == F.col("policy_arm"), F.col("r"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("matched_reward"),
            F.sum(
                (F.col("event_type") == F.col("policy_arm")).cast("long")
            )
            .cast("long")
            .alias("n_matched"),
        )
        .select(
            "user_id",
            "policy_arm",
            "n_eval",
            F.round(F.col("ips_sum") / F.col("n_eval"), 6).alias("ips_value"),
            "n_matched",
            "matched_reward",
        )
    )


_IPS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         CAST(CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS BIGINT) AS r,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events),
pol AS (
  SELECT user_id, event_type AS policy_arm
  FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS prn
    FROM seq WHERE rn * 2 <= n GROUP BY user_id, event_type)
  WHERE prn = 1),
ev_half AS (SELECT * FROM seq WHERE rn * 2 > n),
prop AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_arm
  FROM ev_half GROUP BY event_type),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM ev_half)
SELECT e.user_id, p.policy_arm,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       round(SUM(CASE WHEN e.event_type = p.policy_arm
                      THEN e.r * CAST(t.n_tot AS DOUBLE)
                           / CAST(pr.n_arm AS DOUBLE)
                      ELSE 0.0 END) / COUNT(*), 6) AS ips_value,
       CAST(SUM(CASE WHEN e.event_type = p.policy_arm THEN 1 ELSE 0 END)
         AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN e.event_type = p.policy_arm THEN e.r ELSE 0 END)
         AS BIGINT) AS matched_reward
FROM ev_half e
JOIN pol p USING (user_id)
JOIN prop pr ON pr.event_type = e.event_type
CROSS JOIN tot t
GROUP BY e.user_id, p.policy_arm
"""

QUERIES["ml_ips_offpolicy_eval"] = ml_ips_offpolicy_eval
ORACLE["ml_ips_offpolicy_eval"] = _IPS_SQL


def ml_doubly_robust_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy evaluation: the DM+IPS combination
    that stays consistent if EITHER the reward model or the logging
    propensities are right — DR(u) = mean over eval rounds of
    [ DM(π_u) + 1(a=π_u)·(r − DM(π_u)) / p(a) ]. The direct model
    DM(arm) is the arm's mean reward on the TRAINING half (the same
    first/second-half split as ml_ips_offpolicy_eval, whose estimator
    this strictly dominates in variance when DM is decent); p(a) is
    the eval-half empirical arm frequency.

    Every input is a ratio of exact integers and the per-round terms
    combine in one fixed expression, so the estimate is a single
    deterministic float rounded at 6 dp — full O-tier. Same two
    window passes as IPS plus one 5-row broadcast DM table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.col("value") > 50.0).cast("long").alias("r"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).localCheckpoint()
    first = seq.where(F.col("rn") * 2 <= F.col("n"))
    pol = (
        first.groupBy("user_id", "event_type")
        .agg(bcount().alias("c"))
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("c").desc(), F.col("event_type")
                )
            ),
        )
        .where("prn = 1")
        .select("user_id", F.col("event_type").alias("policy_arm"))
    )
    dm = first.groupBy("event_type").agg(
        F.sum("r").cast("long").alias("dm_r"), bcount().alias("dm_n")
    )
    ev_half = seq.where(F.col("rn") * 2 > F.col("n"))
    prop = ev_half.groupBy("event_type").agg(bcount().alias("n_arm"))
    n_tot = ev_half.agg(bcount().alias("n_tot"))
    dm_pol = dm.select(
        F.col("event_type").alias("policy_arm"),
        (F.col("dm_r").cast("double") / F.col("dm_n").cast("double")).alias(
            "dm_hat"
        ),
    )
    scored = (
        ev_half.join(pol, "user_id")
        .join(F.broadcast(dm_pol), "policy_arm")
        .join(F.broadcast(prop), "event_type")
        .crossJoin(F.broadcast(n_tot))
    )
    term = F.col("dm_hat") + F.when(
        F.col("event_type") == F.col("policy_arm"),
        (F.col("r").cast("double") - F.col("dm_hat"))
        * F.col("n_tot").cast("double")
        / F.col("n_arm").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        scored.groupBy("user_id", "policy_arm")
        .agg(
            bcount().alias("n_eval"),
            F.sum(term).alias("dr_sum"),
            F.max("dm_hat").alias("dm_hat"),
        )
        .select(
            "user_id",
            "policy_arm",
            "n_eval",
            F.round(F.col("dm_hat"), 6).alias("dm_value"),
            F.round(F.col("dr_sum") / F.col("n_eval"), 6).alias("dr_value"),
        )
    )


_DR_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         CAST(CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS BIGINT) AS r,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events),
firsth AS (SELECT * FROM seq WHERE rn * 2 <= n),
pol AS (
  SELECT user_id, event_type AS policy_arm
  FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS prn
    FROM firsth GROUP BY user_id, event_type)
  WHERE prn = 1),
dm AS (
  SELECT event_type AS policy_arm,
         CAST(SUM(r) AS DOUBLE) / COUNT(*) AS dm_hat
  FROM firsth GROUP BY event_type),
ev_half AS (SELECT * FROM seq WHERE rn * 2 > n),
prop AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_arm
  FROM ev_half GROUP BY event_type),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM ev_half)
SELECT e.user_id, p.policy_arm,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       round(MAX(d.dm_hat), 6) AS dm_value,
       round(SUM(d.dm_hat + CASE WHEN e.event_type = p.policy_arm
                 THEN (CAST(e.r AS DOUBLE) - d.dm_hat)
                      * CAST(t.n_tot AS DOUBLE) / CAST(pr.n_arm AS DOUBLE)
                 ELSE 0.0 END) / COUNT(*), 6) AS dr_value
FROM ev_half e
JOIN pol p USING (user_id)
JOIN dm d ON d.policy_arm = p.policy_arm
JOIN prop pr ON pr.event_type = e.event_type
CROSS JOIN tot t
GROUP BY e.user_id, p.policy_arm
"""

QUERIES["ml_doubly_robust_eval"] = ml_doubly_robust_eval
ORACLE["ml_doubly_robust_eval"] = _DR_SQL
