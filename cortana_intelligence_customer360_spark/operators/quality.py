"""Data-quality validation operators: the expectation checks a
production pipeline runs before promoting a batch (uniqueness, foreign
key integrity, null rates, value domains).

Each check is one declarative aggregate - at 100 TB the whole suite is
a handful of scans with map-side partial aggregation, and FK checks are
anti-joins (never row-by-row lookups). Results come back as one row per
check so a scheduler can gate on ``n_violations = 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount, davg, davg_sql
from ..sources.tables import EVENT_TYPES, load_table


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the expectation suite over the star schema; one row per
    check: (check, n_violations, n_rows)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    checks = []

    # uniqueness: o_orderkey
    dup = orders.groupBy("o_orderkey").agg(bcount().alias("n")).where(F.col("n") > 1)
    checks.append(
        dup.agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n_violations"))
        .select(F.lit("orders_pk_unique").alias("check"), "n_violations")
    )
    # FK: orders.o_custkey -> customer (anti-join count)
    orphan_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    )
    checks.append(
        orphan_orders.agg(bcount().alias("n_violations")).select(
            F.lit("orders_custkey_fk").alias("check"), "n_violations"
        )
    )
    # FK: lineitem.l_orderkey -> orders
    orphan_li = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    checks.append(
        orphan_li.agg(bcount().alias("n_violations")).select(
            F.lit("lineitem_orderkey_fk").alias("check"), "n_violations"
        )
    )
    # null rate: customer.c_acctbal must be non-null
    checks.append(
        cust.agg(
            F.count(F.when(F.col("c_acctbal").isNull(), 1)).cast("long").alias("n_violations")
        ).select(F.lit("customer_acctbal_not_null").alias("check"), "n_violations")
    )
    # domain: event_type within the fixed vocabulary
    checks.append(
        ev.agg(
            F.count(F.when(~F.col("event_type").isin(EVENT_TYPES), 1))
            .cast("long")
            .alias("n_violations")
        ).select(F.lit("events_type_domain").alias("check"), "n_violations")
    )
    # range: l_discount in [0, 0.1]
    checks.append(
        li.agg(
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            )
            .cast("long")
            .alias("n_violations")
        ).select(F.lit("lineitem_discount_range").alias("check"), "n_violations")
    )

    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


_TYPES = ", ".join(f"'{t}'" for t in EVENT_TYPES)

_DQ_SQL = f"""
SELECT 'orders_pk_unique' AS check,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
UNION ALL
SELECT 'orders_custkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem_orderkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'customer_acctbal_not_null',
       CAST(COUNT(*) FILTER (WHERE c_acctbal IS NULL) AS BIGINT)
FROM customer
UNION ALL
SELECT 'events_type_domain',
       CAST(COUNT(*) FILTER (WHERE event_type NOT IN ({_TYPES})) AS BIGINT)
FROM events
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
FROM lineitem
"""


def dq_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly screen: events whose value is > 3 sigma from
    their event_type's mean. Mean and stddev are computed ONCE per type
    (5 rows, broadcast back), so the whole op is two scans + a broadcast
    join at any scale. Mean/std are rounded to 6 dp on BOTH engines
    before the z-score (compat rule 3), and the z-score itself is
    rounded before thresholding so float noise can't flip membership."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(davg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sigma"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z_score"))
        .where(F.abs(F.col("z_score")) > 3.0)
    )


_DQ_ANOMALY_SQL = f"""
WITH stats AS (
  SELECT event_type, round({davg_sql('value')}, 6) AS mu,
         round(stddev_pop(value), 6) AS sigma
  FROM events GROUP BY 1)
SELECT event_id, e.event_type, value,
       round((value - mu) / sigma, 6) AS z_score
FROM events e JOIN stats USING (event_type)
WHERE abs(round((value - mu) / sigma, 6)) > 3.0
"""


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit across the star schema: per relation, how many
    child rows reference a missing parent. The real tables are
    FK-consistent, so each parent set is thinned deterministically
    (keys ≡ 0 mod 50 dropped) to plant orphans — the check itself is
    the production operator: one LEFT ANTI join per relation on the FK
    (anti joins broadcast the thinned dim where small, and never
    amplify output: at 100 TB the result is one row per relation)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 50 != 0
    )
    thin_orders = orders.where(F.col("o_orderkey") % 50 != 0)
    rels = [
        (
            "orders->customer",
            orders.join(
                cust, orders.o_custkey == cust.c_custkey, "left_anti"
            ),
            orders,
        ),
        (
            "lineitem->orders",
            li.join(
                thin_orders,
                li.l_orderkey == thin_orders.o_orderkey,
                "left_anti",
            ),
            li,
        ),
    ]
    parts = [
        orphans.agg(
            F.lit(name).alias("relation"),
            bcount().alias("n_orphans"),
        ).crossJoin(child.agg(bcount().alias("n_children")))
        for name, orphans, child in rels
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "relation",
        "n_orphans",
        "n_children",
        F.round(F.col("n_orphans") / F.col("n_children"), 6).alias("orphan_rate"),
    )


_DQ_RI_SQL = """
WITH a AS (
  SELECT 'orders->customer' AS relation,
         CAST(COUNT(*) FILTER (WHERE o_custkey NOT IN
             (SELECT c_custkey FROM customer WHERE c_custkey % 50 <> 0))
           AS BIGINT) AS n_orphans,
         CAST(COUNT(*) AS BIGINT) AS n_children
  FROM orders),
b AS (
  SELECT 'lineitem->orders' AS relation,
         CAST(COUNT(*) FILTER (WHERE l_orderkey NOT IN
             (SELECT o_orderkey FROM orders WHERE o_orderkey % 50 <> 0))
           AS BIGINT) AS n_orphans,
         CAST(COUNT(*) AS BIGINT) AS n_children
  FROM lineitem)
SELECT relation, n_orphans, n_children,
       round(CAST(n_orphans AS DOUBLE) / n_children, 6) AS orphan_rate
FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
"""


_PSI_SPLIT = "1998-01-01"
_PSI_BAND = 50_000.0  # price-band width for the 10-bucket histogram


def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution
    between the pre/post-{split} periods — the standard "did my
    feature drift?" monitor a model-serving pipeline runs per release.
    Values bucket into fixed 50k bands (capped at band 9); counts are
    Laplace-smoothed (+1) so empty bands contribute finite terms;
    per-band terms round at 6 dp before the exact DECIMAL total. One
    conditional-aggregate scan — both periods come from one pass, not
    two filtered scans."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(_PSI_SPLIT).cast("date")
    bucket = F.least(F.floor(F.col("o_totalprice") / _PSI_BAND), F.lit(9)).cast(
        "long"
    )
    in_a = F.col("o_orderdate").cast("date") < split
    per_bucket = orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.when(in_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(~in_a, 1)).cast("long").alias("n_b"),
    )
    tot = per_bucket.agg(
        F.sum("n_a").cast("long").alias("tot_a"),
        F.sum("n_b").cast("long").alias("tot_b"),
        bcount().alias("n_buckets"),
    )
    j = per_bucket.crossJoin(F.broadcast(tot))
    p = (F.col("n_a") + 1).cast("double") / (
        F.col("tot_a") + F.col("n_buckets")
    ).cast("double")
    q = (F.col("n_b") + 1).cast("double") / (
        F.col("tot_b") + F.col("n_buckets")
    ).cast("double")
    term = F.round((p - q) * F.log(p / q), 6)
    return j.agg(
        F.round(F.sum(term.cast("decimal(30,6)")).cast("double"), 6).alias("psi"),
        F.max("tot_a").alias("n_a"),
        F.max("tot_b").alias("n_b"),
        F.max("n_buckets").alias("n_buckets"),
    )


_DRIFT_SQL = f"""
WITH per_bucket AS (
  SELECT CAST(least(floor(o_totalprice / {_PSI_BAND}), 9) AS BIGINT) AS bucket,
         CAST(COUNT(*) FILTER (WHERE CAST(o_orderdate AS DATE)
                               < DATE '{_PSI_SPLIT}') AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE CAST(o_orderdate AS DATE)
                               >= DATE '{_PSI_SPLIT}') AS BIGINT) AS n_b
  FROM orders GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a, CAST(SUM(n_b) AS BIGINT) AS tot_b,
         CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM per_bucket),
terms AS (
  SELECT ROUND((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_buckets AS DOUBLE)
                - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_buckets AS DOUBLE))
               * ln((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_buckets AS DOUBLE))
                    / (CAST(n_b + 1 AS DOUBLE)
                       / CAST(tot_b + n_buckets AS DOUBLE))), 6) AS term,
         tot_a, tot_b, n_buckets
  FROM per_bucket CROSS JOIN tot)
SELECT ROUND(CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE), 6) AS psi,
       MAX(tot_a) AS n_a, MAX(tot_b) AS n_b, MAX(n_buckets) AS n_buckets
FROM terms
"""


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


def dq_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over orders (the df.summary()/
    dbt-style profile a pipeline publishes per batch): per numeric
    column — row count, nulls, distinct count, 6-dp mean, min, max —
    computed as ONE aggregate (all stats in a single scan, Catalyst
    plans the count-distincts through one Expand), then unpivoted to
    a row per column. Never N scans for N columns."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.round(davg(F.col(c).cast("double")), 6).alias(f"{c}__mean"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def _profile_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS column,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       ROUND({davg_sql(f'CAST({c} AS DOUBLE)')}, 6) AS mean,
       MIN(CAST({c} AS DOUBLE)) AS min_val,
       MAX(CAST({c} AS DOUBLE)) AS max_val
FROM orders""")
    return "\nUNION ALL\n".join(parts)


# Benford first-digit expected frequencies log10(1 + 1/d), pinned as
# 9-dp literals so both engines use the IDENTICAL constant (no reliance
# on cross-library log10 ulp agreement).
_BENFORD_EXP = {d: round(__import__("math").log10(1.0 + 1.0 / d), 9) for d in range(1, 10)}


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on ``o_totalprice``: observed first-digit
    frequencies vs the Benford expectation, with the per-digit
    chi-square contribution — the classic synthetic-data / fraud /
    data-entry-quality detector.

    The first digit comes from the STRING form of the integer part
    (floor -> bigint -> substr), never from log10 — float boundaries
    like 1000.0 would mis-bucket under log10 in either engine. One
    9-row aggregate; the global total via a window over those 9 rows
    (driver-size, not data-size)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        bcount().alias("n_obs")
    )
    exp_map = F.create_map(
        *[F.lit(v) for kv in _BENFORD_EXP.items() for v in kv]
    )
    w = Window.partitionBy()
    res = counts.withColumn("total", F.sum("n_obs").over(w)).withColumn(
        "exp_freq", exp_map[F.col("digit")]
    )
    obs = F.col("n_obs") / F.col("total")
    dev = obs - F.col("exp_freq")
    return res.select(
        "digit",
        "n_obs",
        F.round(obs, 6).alias("obs_freq"),
        "exp_freq",
        F.round(
            F.col("total") * dev * dev / F.col("exp_freq"), 6
        ).alias("chi2_contrib"),
    )


def _benford_sql() -> str:
    # CAST the literal: a bare decimal literal is DECIMAL in DuckDB,
    # DOUBLE in Spark's F.lit — schema/arith must agree.
    pairs = ", ".join(
        f"({d}, CAST({v} AS DOUBLE))" for d, v in _BENFORD_EXP.items()
    )
    return f"""
WITH exp(digit, exp_freq) AS (VALUES {pairs}),
c AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1),
t AS (SELECT digit, n_obs, SUM(n_obs) OVER () AS total FROM c)
SELECT t.digit, t.n_obs,
       round(t.n_obs / t.total, 6) AS obs_freq,
       exp.exp_freq,
       round(t.total * (t.n_obs / t.total - exp.exp_freq)
             * (t.n_obs / t.total - exp.exp_freq) / exp.exp_freq,
             6) AS chi2_contrib
FROM t JOIN exp USING (digit)
"""


def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen per event_type: quartiles (continuous
    interpolation, the engine-shared definition win_median_sliding
    already pins), IQR fences at 1.5x, and the count/share of values
    outside them — the complement of the MAD screen in dq_anomaly.
    The quartiles are rounded to 6 dp BEFORE the fence arithmetic, so
    the fence doubles are identical cross-engine and every comparison
    agrees bit-for-bit. One aggregate to the |types|-row quartile
    table (broadcast back), one counting pass."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("q3"),
    )
    fenced = q.select(
        "event_type",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    joined = ev.join(F.broadcast(fenced), "event_type")
    out = F.when(
        (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
    ).otherwise(0)
    return (
        joined.select("event_type", "q1", "q3", "lo", "hi", out.alias("o"))
        .groupBy("event_type", "q1", "q3", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o").cast("long").alias("n_outliers"),
        )
        .select(
            "event_type",
            "q1",
            "q3",
            F.round("lo", 6).alias("lo_fence"),
            F.round("hi", 6).alias("hi_fence"),
            "n",
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("outlier_share"),
        )
    )


_IQR_SQL = """
WITH q AS (
  SELECT event_type,
         round(quantile_cont(value, 0.25), 6) AS q1,
         round(quantile_cont(value, 0.75), 6) AS q3
  FROM events GROUP BY event_type),
f AS (
  SELECT event_type, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo,
         q3 + 1.5 * (q3 - q1) AS hi
  FROM q)
SELECT e.event_type, f.q1, f.q3,
       round(f.lo, 6) AS lo_fence,
       round(f.hi, 6) AS hi_fence,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS outlier_share
FROM events e JOIN f USING (event_type)
GROUP BY e.event_type, f.q1, f.q3, f.lo, f.hi
"""



def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest freshness per event_type: each type's latest event vs
    the dataset watermark (global max ts), as a minutes-behind lag —
    the "is feed X stalled" check every streaming ingest dashboard
    leads with. Exact integer µs arithmetic; one tiny aggregate plus
    a broadcast of the 1-row watermark."""
    from ..compat import epoch_us

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    per = ev.groupBy("event_type").agg(
        F.max(epoch_us("ts")).alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wm = per.agg(F.max("last_us").alias("wm_us"))
    return per.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "n_events",
        "last_us",
        F.round(
            (F.col("wm_us") - F.col("last_us")).cast("double") / 60000000.0,
            6,
        ).alias("lag_minutes"),
    )


def _freshness_sql() -> str:
    from ..compat import epoch_us_sql

    return f"""
WITH per AS (
  SELECT event_type,
         CAST(MAX({epoch_us_sql('ts')}) AS BIGINT) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type),
wm AS (SELECT MAX(last_us) AS wm_us FROM per)
SELECT event_type, n_events, last_us,
       round(CAST(wm.wm_us - per.last_us AS DOUBLE)
             / CAST(60000000 AS DOUBLE), 6) AS lag_minutes
FROM per CROSS JOIN wm
"""


def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight data-quality metrics via DataFrame.observe: the
    production pattern where a pipeline's MAIN pass also emits its
    quality counters (row count, null count, negative-balance count,
    decimal balance sum) with zero extra scans — the observation
    piggybacks on the action instead of re-reading the table the way a
    separate dq_checks pass would. The observed values (a driver-side
    handful of scalars by construction) are re-emitted as a one-row
    DataFrame; the oracle recomputes the same aggregates directly,
    pinning that observe() sees every row exactly once."""
    from pyspark.sql import Observation

    cust = load_table(spark, sf_dir, "customer")
    obs = Observation("dq")
    observed = cust.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_nationkey").isNull().cast("long")).alias(
            "n_null_nation"
        ),
        F.sum((F.col("c_acctbal") < 0).cast("long")).alias("n_negative_bal"),
        F.sum(F.col("c_acctbal").cast("decimal(30,6)")).alias("bal_dec"),
    )
    # The main pass: any action materializes the metrics alongside.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_null_nation"] or 0),
                int(m["n_negative_bal"] or 0),
                float(m["bal_dec"]),
            )
        ],
        "n_rows bigint, n_null_nation bigint, n_negative_bal bigint, "
        "bal_sum double",
    )


_OBSERVE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_nation,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS bal_sum
FROM customer
"""


QUERIES = {
    "dq_observe_metrics": dq_observe_metrics,
    "dq_freshness_lag": dq_freshness_lag,
    "dq_outlier_iqr": dq_outlier_iqr,
    "dq_benford": dq_benford,
    "dq_distribution_drift": dq_distribution_drift,
    "dq_profile_summary": dq_profile_summary,
    "dq_checks": dq_checks,
    "dq_anomaly": dq_anomaly,
    "dq_referential_integrity": dq_referential_integrity,
}
ORACLE = {
    "dq_observe_metrics": _OBSERVE_SQL,
    "dq_freshness_lag": _freshness_sql(),
    "dq_outlier_iqr": _IQR_SQL,
    "dq_benford": _benford_sql(),
    "dq_distribution_drift": _DRIFT_SQL,
    "dq_profile_summary": _profile_sql(),
    "dq_checks": _DQ_SQL,
    "dq_anomaly": _DQ_ANOMALY_SQL,
    "dq_referential_integrity": _DQ_RI_SQL,
}


# Candidate functional dependencies to audit: (rule id, table,
# LHS cols, RHS col). A rule HOLDS when no LHS group sees >1 distinct
# RHS value — the profiling step that discovers real keys/hierarchies
# before schema normalization or dedup keying.
_FD_RULES = [
    ("orders: o_orderkey -> o_custkey",
     "orders", ("o_orderkey",), "o_custkey"),
    ("lineitem: l_orderkey -> l_suppkey", "lineitem", ("l_orderkey",), "l_suppkey"),
    ("lineitem: l_partkey -> l_suppkey", "lineitem", ("l_partkey",), "l_suppkey"),
    ("orders: o_custkey -> o_orderpriority",
     "orders", ("o_custkey",), "o_orderpriority"),
]


def dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate rule LHS -> RHS,
    count the LHS groups and the groups violating the dependency
    (> 1 distinct RHS), emitting a holds flag. One row per rule.

    Shape: one groupBy per rule with map-side partial aggregation
    (count_distinct carries a per-group RHS hash set bounded by the
    real RHS fanout); the union of the four 1-row results is
    driver-trivial. Exactly the profiling pass a 100 TB normalization
    job runs before picking dedup or merge keys.
    """
    out = None
    for name, table, lhs, rhs in _FD_RULES:
        t = load_table(spark, sf_dir, table)
        g = (
            t.groupBy(*[F.col(c) for c in lhs])
            .agg(F.countDistinct(rhs).alias("ndv"))
            .agg(
                F.lit(name).alias("rule"),
                bcount().alias("n_groups"),
                F.sum((F.col("ndv") > 1).cast("long")).cast("long").alias(
                    "n_violating"
                ),
            )
            .withColumn("holds", (F.col("n_violating") == 0).cast("int"))
        )
        out = g if out is None else out.unionByName(g)
    return out.orderBy("rule")


def _fd_sql() -> str:
    selects = []
    for name, table, lhs, rhs in _FD_RULES:
        keys = ", ".join(lhs)
        selects.append(
            f"""SELECT '{name}' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(CASE WHEN SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS INT) AS holds
FROM (SELECT {keys}, COUNT(DISTINCT {rhs}) AS ndv
      FROM {table} GROUP BY {keys})"""
        )
    return "\nUNION ALL ".join(selects) + "\nORDER BY rule"


QUERIES["dq_functional_deps"] = dq_functional_deps
ORACLE["dq_functional_deps"] = _fd_sql()


_DUPKEY_TOPK = 10


def dq_duplicate_keys_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface the WORST offenders behind a failed uniqueness
    expectation: the 10 most-duplicated (l_orderkey, l_linenumber)
    pairs with their multiplicities — counts alone (dq_checks) tell an
    operator THAT the key is broken; this tells them WHERE to look.
    (The synthetic lineitem really does violate this classic TPC-H
    key — discovered by dq_functional_deps.)

    One map-side-combined groupBy + TakeOrderedAndProject; ties break
    on the key so the cut is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(bcount().alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .orderBy(
            F.col("n_copies").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(_DUPKEY_TOPK)
    )


_DUPKEY_SQL = f"""
SELECT l_orderkey, l_linenumber, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM lineitem
GROUP BY 1, 2
HAVING COUNT(*) > 1
ORDER BY n_copies DESC, l_orderkey ASC, l_linenumber ASC
LIMIT {_DUPKEY_TOPK}
"""

QUERIES["dq_duplicate_keys_sample"] = dq_duplicate_keys_sample
ORACLE["dq_duplicate_keys_sample"] = _DUPKEY_SQL


_PSI_BANDS = 10
_PSI_LO, _PSI_HI = 900.0, 600000.0  # fixed price-band domain


def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the 1996 and 1997 order-value
    distributions over 10 FIXED price bands — the model-monitoring
    drift score (rule of thumb: PSI < 0.1 stable, > 0.25 drifted).
    Emits the per-band contributions plus band shares, so the drift is
    attributable, not just a scalar.

    Fixed band edges (log-spaced via the fixed domain, computed as a
    pure literal grid) keep the banding a pure function of the value;
    Laplace-smoothed shares avoid ln(0); contributions are 6 dp before
    the DECIMAL total. One scan with conditional aggregates per year.
    """
    o = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1996, 1997)
    )
    width = (_PSI_HI - _PSI_LO) / _PSI_BANDS
    band = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - F.lit(_PSI_LO)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(_PSI_BANDS - 1),
    ).cast("long")
    cells = o.groupBy(band.alias("band")).agg(
        F.sum((F.year("o_orderdate") == 1996).cast("long")).cast("long").alias("n0"),
        F.sum((F.year("o_orderdate") == 1997).cast("long")).cast("long").alias("n1"),
    )
    tot = cells.agg(
        F.sum("n0").cast("long").alias("t0"), F.sum("n1").cast("long").alias("t1")
    )
    expr_p = (
        "((CAST(n0 AS DOUBLE) + 0.5) / (CAST(t0 AS DOUBLE)"
        f" + 0.5 * {_PSI_BANDS}))"
    )
    expr_q = (
        "((CAST(n1 AS DOUBLE) + 0.5) / (CAST(t1 AS DOUBLE)"
        f" + 0.5 * {_PSI_BANDS}))"
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n0",
            "n1",
            F.round(F.expr(expr_p), 6).alias("share_1996"),
            F.round(F.expr(expr_q), 6).alias("share_1997"),
            F.round(
                F.expr(
                    f"({expr_q} - {expr_p}) * ln({expr_q} / {expr_p})"
                ),
                6,
            ).alias("psi_contrib"),
        )
        .orderBy("band")
    )


def _psi_sql() -> str:
    width = (_PSI_HI - _PSI_LO) / _PSI_BANDS
    expr_p = (
        "((CAST(n0 AS DOUBLE) + 0.5) / (CAST(t0 AS DOUBLE)"
        f" + 0.5 * {_PSI_BANDS}))"
    )
    expr_q = (
        "((CAST(n1 AS DOUBLE) + 0.5) / (CAST(t1 AS DOUBLE)"
        f" + 0.5 * {_PSI_BANDS}))"
    )
    return f"""
WITH o AS (
  SELECT o_totalprice, year(o_orderdate) AS yr FROM orders
  WHERE year(o_orderdate) IN (1996, 1997)),
cells AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - {_PSI_LO}) / {width}),
              0), {_PSI_BANDS - 1}) AS BIGINT) AS band,
         CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM o GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n0) AS BIGINT) AS t0, CAST(SUM(n1) AS BIGINT) AS t1
  FROM cells)
SELECT band, n0, n1,
       round({expr_p}, 6) AS share_1996,
       round({expr_q}, 6) AS share_1997,
       round(({expr_q} - {expr_p}) * ln({expr_q} / {expr_p}), 6) AS psi_contrib
FROM cells CROSS JOIN tot
ORDER BY band
"""


QUERIES["dq_psi_drift"] = dq_psi_drift
ORACLE["dq_psi_drift"] = _psi_sql()


_GAP_TOPK = 20


def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream sequence gap audit: within each event type, the
    top-20 widest holes in the event-id subsequence as (gap_start,
    gap_end, missing) ranges — the completeness check that catches a
    dropped ingest batch for ONE stream (a contiguous id range absent
    from that type), which row counts and per-key dup checks
    (dq_duplicate_keys_sample) can't see. The global id space is dense
    by construction, so the per-type view is where real holes live —
    exactly the per-partition-sequence shape of a Kafka topic audit.
    One lag window partitioned by type (range-partitioned sort at
    scale) + a TakeOrdered top-k. Ties break on (type, gap_start)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id")
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("event_id")
    gaps = (
        ev.select(
            "event_type",
            F.col("event_id").alias("next_key"),
            F.lag("event_id").over(w).alias("prev_key"),
        )
        .where(F.col("prev_key").isNotNull())
        .where(F.col("next_key") - F.col("prev_key") > 1)
        .select(
            "event_type",
            (F.col("prev_key") + 1).cast("long").alias("gap_start"),
            (F.col("next_key") - 1).cast("long").alias("gap_end"),
            (F.col("next_key") - F.col("prev_key") - 1)
            .cast("long")
            .alias("missing"),
        )
    )
    return gaps.orderBy(
        F.col("missing").desc(),
        F.col("event_type").asc(),
        F.col("gap_start").asc(),
    ).limit(_GAP_TOPK)


_SEQ_GAPS_SQL = f"""
WITH k AS (SELECT DISTINCT event_type, event_id FROM events),
gaps AS (
  SELECT event_type,
         CAST(prev_key + 1 AS BIGINT) AS gap_start,
         CAST(event_id - 1 AS BIGINT) AS gap_end,
         CAST(event_id - prev_key - 1 AS BIGINT) AS missing
  FROM (SELECT event_type, event_id,
               LAG(event_id) OVER (PARTITION BY event_type
                                   ORDER BY event_id) AS prev_key
        FROM k)
  WHERE prev_key IS NOT NULL AND event_id - prev_key > 1)
SELECT event_type, gap_start, gap_end, missing
FROM gaps ORDER BY missing DESC, event_type ASC, gap_start ASC
LIMIT {_GAP_TOPK}
"""

QUERIES["dq_sequence_gaps"] = dq_sequence_gaps
ORACLE["dq_sequence_gaps"] = _SEQ_GAPS_SQL


_VOL_Z = 2.0  # flag threshold (|z| over the daily-count distribution)


def dq_volume_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume monitoring: daily ORDER COUNTS z-scored against
    the whole daily-count distribution, flagging days whose volume is
    anomalous — the pipeline-health complement to dq_anomaly (which
    screens VALUES) and dq_freshness_lag (which screens recency); a
    half-ingested day shows up here first. Counts are exact integers,
    the global moments are integer sums, and mean/std/z round at 6 dp
    before the threshold so membership can't float-flip. Two tiny
    aggregates (day, then one global row broadcast back)."""
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(bcount().alias("n_orders"))
    mom = daily.agg(
        bcount().alias("m"),
        F.sum("n_orders").cast("long").alias("s1"),
        F.sum(F.col("n_orders") * F.col("n_orders")).cast("long").alias("s2"),
    )
    mu = F.round(F.col("s1").cast("double") / F.col("m"), 6)
    sd = F.round(
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("m")
            )
            / (F.col("m") - F.lit(1))
        ),
        6,
    )
    scored = daily.crossJoin(F.broadcast(mom)).select(
        "day",
        "n_orders",
        F.round((F.col("n_orders") - mu) / sd, 6).alias("z"),
    )
    return scored.where(F.abs(F.col("z")) > _VOL_Z).orderBy("day")


_VOL_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(n_orders) AS BIGINT) AS s1,
         CAST(SUM(n_orders * n_orders) AS BIGINT) AS s2
  FROM daily),
scored AS (
  SELECT day, n_orders,
         round((n_orders - round(CAST(s1 AS DOUBLE) / m, 6))
               / round(sqrt((CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * s1 / m) / (m - 1)), 6),
               6) AS z
  FROM daily, mom)
SELECT day, n_orders, z FROM scored WHERE abs(z) > {_VOL_Z} ORDER BY day
"""

QUERIES["dq_volume_anomaly_daily"] = dq_volume_anomaly_daily
ORACLE["dq_volume_anomaly_daily"] = _VOL_ANOMALY_SQL
