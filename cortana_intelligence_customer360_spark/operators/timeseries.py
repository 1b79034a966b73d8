"""Time-series operators: OHLC resampling, gap-fill with forward
fill, rolling z-score anomaly flags.

Reference parity: the upstream solution's pipelines are time-sliced
batch jobs over event-time partitions (SURVEY.md §1.1, §3.1 — the
checkout itself is empty, §0); these operators give the engine the
standard time-series surface a Customer-360 event stream needs beyond
the plain windowed aggregates in operators/windows.py.

Scale posture (100 TB): every operator here shuffles at most once on
``user_id`` (or ``(user_id, bucket)``), the natural high-cardinality
partition key of an event table. Gap-fill's generated hour spine is
bounded per user by that user's own [min, max] activity span, so the
explode never amplifies a user beyond its true time range; the
forward-fill window is a per-user running frame — Spark executes it
after a single hash partition by user, no global sort. Rolling
z-score stays numerically cross-engine-stable by deriving mean/std
from DECIMAL-exact window sums (compat rule 1) so both engines feed
identical doubles into identical IEEE arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount, davg, davg_sql, dsum, dsum_sql, epoch_us, epoch_us_sql
from ..sources.tables import load_table

_DEC = "decimal(30,6)"

# Microseconds per hour: the gap-fill bucket index is an integer
# floor-division on epoch-µs, identical in both engines on the
# all-positive 2024 timestamps.
_US_PER_HOUR = 3_600_000_000


def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user per hour: open/high/low/close of ``value`` (financial
    resampling shape). Open/close are the values at the earliest/latest
    event in the bucket, tie-broken by event_id (compat rule 7); they
    are raw column values — no arithmetic — so they hash exactly."""
    ev = load_table(spark, sf_dir, "events")
    df = ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
    wa = Window.partitionBy("user_id", "hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = df.select(
        "user_id",
        "hour",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        ranked.groupBy("user_id", "hour")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            bcount().alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            epoch_us("hour").alias("hour_us"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "sum_value",
        )
    )


_OHLC_SQL = f"""
WITH r AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT user_id,
       {epoch_us_sql('hour')} AS hour_us,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM r
GROUP BY user_id, hour
"""


def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill per user: generate the full hour spine over each
    user's own activity span, left-join observed hourly sums, and
    forward-fill missing hours with the last observed value (the
    dashboard/feature-store "carry last reading forward" primitive).

    The spine is ``sequence(h0, h1)`` per user — bounded by real
    activity, so a 100 TB run generates no more rows than the busiest
    user's wall-clock span; the fill is one per-user running window."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            "user_id",
            (F.unix_micros(F.col("ts")) / F.lit(_US_PER_HOUR))
            .cast("long")
            .alias("hour_idx"),
            "value",
        )
        .groupBy("user_id", "hour_idx")
        .agg(dsum("value").alias("v"))
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_idx"),
        )
    )
    joined = spine.join(obs, ["user_id", "hour_idx"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_idx",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().cast("int").alias("is_gap"),
    )


_GAP_FILL_SQL = f"""
WITH obs AS (
  SELECT user_id,
         CAST({epoch_us_sql('ts')} // {_US_PER_HOUR} AS BIGINT) AS hour_idx,
         {dsum_sql('value')} AS v
  FROM events GROUP BY 1, 2),
span AS (SELECT user_id, MIN(hour_idx) AS h0, MAX(hour_idx) AS h1
         FROM obs GROUP BY user_id),
spine AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour_idx FROM span),
j AS (SELECT s.user_id, s.hour_idx, o.v
      FROM spine s LEFT JOIN obs o USING (user_id, hour_idx))
SELECT user_id, hour_idx,
       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       CAST(v IS NULL AS INT) AS is_gap
FROM j
"""

_ZSCORE_N = 24  # trailing full-day window at the corpus's hourly-ish event rate


def ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag: per user ordered by event time, a
    trailing 24-row mean/std and the current value's z-score. Emits
    only rows with a FULL window (n = 24) and positive variance, so
    the division is always defined.

    Cross-engine float discipline: the window sum and sum-of-squares
    accumulate in DECIMAL(30,6) (exact, order-independent — compat
    rule 1), then every derived quantity (mean, variance, std, z) is
    the same IEEE double expression over identical operands in both
    engines; the 6-dp round is belt-and-braces."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ZSCORE_N - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
    sq = F.sum((F.col("value") * F.col("value")).cast(_DEC)).over(w).cast("double")
    mean = s / n
    var = (sq - s * s / n) / (n - F.lit(1))
    std = F.sqrt(var)
    scored = ev.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("ts_us"),
        "value",
        n.alias("n"),
        mean.alias("mean_raw"),
        std.alias("std_raw"),
    ).where((F.col("n") == _ZSCORE_N) & (F.col("std_raw") > 0))
    return scored.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.round("mean_raw", 6).alias("roll_mean"),
        F.round("std_raw", 6).alias("roll_std"),
        F.round((F.col("value") - F.col("mean_raw")) / F.col("std_raw"), 6).alias(
            "zscore"
        ),
        (
            F.abs((F.col("value") - F.col("mean_raw")) / F.col("std_raw")) > 2.0
        )
        .cast("int")
        .alias("is_anomaly"),
    )


_ZSCORE_SQL = f"""
WITH win AS (
  SELECT event_id, user_id, {epoch_us_sql('ts')} AS ts_us, value,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(value * value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sq
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ZSCORE_N - 1} PRECEDING AND CURRENT ROW)),
d AS (
  SELECT event_id, user_id, ts_us, value,
         s / n AS mean_raw,
         sqrt((sq - s * s / n) / (n - 1)) AS std_raw
  FROM win WHERE n = {_ZSCORE_N})
SELECT event_id, user_id, ts_us, value,
       round(mean_raw, 6) AS roll_mean,
       round(std_raw, 6) AS roll_std,
       round((value - mean_raw) / std_raw, 6) AS zscore,
       CAST(abs((value - mean_raw) / std_raw) > 2.0 AS INT) AS is_anomaly
FROM d WHERE std_raw > 0
"""


_EWMA_ALPHA = 0.2
_EWMA_N = 24
# Literal decay weights (1-a)^k, k = lag distance. Both engines receive
# the IDENTICAL repr-precision double constants and evaluate the same
# left-associated 24-term expression, so the result is bit-deterministic
# without any decimal quantization.
_EWMA_W = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_N)]
_EWMA_NORM = sum(_EWMA_W)  # full-window normalizer (rows with 24 lags only)


def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user
    (alpha=0.2, truncated at 24 trailing rows, full windows only).
    The recursion is unrolled into a fixed 24-term dot product over
    ``lag()`` columns with literal weights — one per-user window sort,
    zero Python, and (because the term order is frozen in the
    expression) bit-identical IEEE arithmetic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    terms = F.col("value") * F.lit(_EWMA_W[0])
    for k in range(1, _EWMA_N):
        terms = terms + F.lag("value", k).over(w) * F.lit(_EWMA_W[k])
    return (
        ev.select(
            "event_id",
            "user_id",
            epoch_us("ts").alias("ts_us"),
            "value",
            F.row_number().over(w).alias("rn"),
            terms.alias("wsum"),
        )
        .where(F.col("rn") >= _EWMA_N)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            F.round(F.col("wsum") / F.lit(_EWMA_NORM), 6).alias("ewma"),
        )
    )


def _ewma_sql() -> str:
    terms = " + ".join(
        f"value * {_EWMA_W[0]!r}"
        if k == 0
        else f"lag(value, {k}) OVER w * {_EWMA_W[k]!r}"
        for k in range(_EWMA_N)
    )
    return f"""
WITH t AS (
  SELECT event_id, user_id, {epoch_us_sql('ts')} AS ts_us, value,
         ROW_NUMBER() OVER w AS rn,
         {terms} AS wsum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, ts_us, value,
       round(wsum / {_EWMA_NORM!r}, 6) AS ewma
FROM t WHERE rn >= {_EWMA_N}
"""


# 3 * 1.4826 (the normal-consistency constant): the conventional
# "3 sigma" robust outlier threshold expressed in MAD units.
_MAD_K = 4.4478


def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly detection via Median Absolute Deviation.

    For each user: median(value), MAD = median(|value - median|), and
    the count of events whose deviation exceeds 3-sigma-equivalent
    (``_MAD_K * MAD``). Unlike mean/stddev z-scores (ts_rolling_zscore),
    the median/MAD pair is outlier-robust — the detector a fraud/abuse
    pipeline actually wants. Three aggregates, but ALL keyed on
    user_id: the exchange is computed once and reused (AQE), so at
    100 TB this is one partition pass + two medians over already-
    co-located rows. Both engines compute exact interpolated medians
    over identical doubles; the threshold compare is 6-dp rounded on
    both sides so a 1-ulp interpolation delta cannot flip a flag."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    dev = ev.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.median("adev").alias("mad"))
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            bcount().alias("n_events"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count(
                F.when(
                    F.round(F.col("adev"), 6)
                    > F.round(F.lit(_MAD_K) * F.col("mad"), 6),
                    1,
                )
            )
            .cast("long")
            .alias("n_anomalies"),
        )
    )


_MAD_SQL = f"""
WITH m AS (
  SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
d AS (
  SELECT e.user_id, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN m USING (user_id)),
md AS (
  SELECT user_id, median(adev) AS mad FROM d GROUP BY user_id)
SELECT d.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MAX(d.med), 6) AS med,
       ROUND(MAX(md.mad), 6) AS mad,
       CAST(COUNT(*) FILTER (WHERE ROUND(adev, 6) > ROUND({_MAD_K} * md.mad, 6))
            AS BIGINT) AS n_anomalies
FROM d JOIN md USING (user_id)
GROUP BY d.user_id
"""


_CP_MIN_SIDE = 5  # min observations on each side of a candidate split


def ts_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user level-shift changepoint: the split point (between
    consecutive events) maximizing |mean(before) - mean(after)| — the
    exhaustive-scan single-changepoint detector (binary-segmentation
    step 1). The naive form is O(n²) per user (recompute two means per
    split); this is the O(n) prefix-sum form: one running DECIMAL sum
    per user gives every split's two means from (prefix, total−prefix).
    Ranking uses the ROUNDED delta with a ts tiebreak so the argmax is
    engine-independent. One user_id window shuffle + a WindowGroupLimit
    rank cut; splits need >= _CP_MIN_SIDE points per side."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wall = Window.partitionBy("user_id")
    pre = (
        ev.withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "psum",
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double"),
        )
        .withColumn("n", F.count("*").over(wall).cast("long"))
        .withColumn(
            "tot", F.sum(F.col("value").cast(_DEC)).over(wall).cast("double")
        )
    )
    cand = pre.where(
        (F.col("i") >= _CP_MIN_SIDE) & (F.col("n") - F.col("i") >= _CP_MIN_SIDE)
    ).select(
        "user_id",
        "ts_us",
        "i",
        "n",
        F.round(
            F.abs(
                F.col("psum") / F.col("i").cast("double")
                - (F.col("tot") - F.col("psum"))
                / (F.col("n") - F.col("i")).cast("double")
            ),
            6,
        ).alias("delta"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("delta").desc(), F.col("ts_us").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts_us").alias("split_after_us"),
            F.col("i").alias("n_before"),
            (F.col("n") - F.col("i")).cast("long").alias("n_after"),
            "delta",
        )
    )


_CHANGEPOINT_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, {epoch_us_sql('ts')} AS ts_us, value FROM events),
pre AS (
  SELECT user_id, ts_us,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS psum,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (PARTITION BY user_id)
              AS DOUBLE) AS tot
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING)),
cand AS (
  SELECT user_id, ts_us, i, n,
         ROUND(abs(psum / CAST(i AS DOUBLE)
                   - (tot - psum) / CAST(n - i AS DOUBLE)), 6) AS delta
  FROM pre
  WHERE i >= {_CP_MIN_SIDE} AND n - i >= {_CP_MIN_SIDE})
SELECT user_id, ts_us AS split_after_us, i AS n_before,
       CAST(n - i AS BIGINT) AS n_after, delta
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY delta DESC, ts_us ASC) AS rn
      FROM cand)
WHERE rn = 1
"""


def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of event values per user (the classical
    "is this series momentum or noise?" statistic): r1 =
    Σ(x_t−m)(x_{t+1}−m) / Σ(x_t−m)² with the user mean m from an exact
    DECIMAL sum. Both the numerator's cross terms and the denominator's
    squares are rounded at 6 dp per row and summed in DECIMAL, so
    accumulation order cannot move the quotient. One user window (lead)
    + one aggregate on the same key — a single exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us"), "value"
    )
    m = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*")).alias("m")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dev = (
        ev.join(m, "user_id")
        .withColumn("d", F.col("value") - F.col("m"))
        .withColumn("d_next", F.lead("d").over(w))
    )
    cross = F.round(F.col("d") * F.col("d_next"), 6)
    sq = F.round(F.col("d") * F.col("d"), 6)
    agg = dev.groupBy("user_id").agg(
        bcount().alias("n_events"),
        F.sum(cross.cast(_DEC)).cast("double").alias("num"),
        F.sum(sq.cast(_DEC)).cast("double").alias("den"),
    )
    return agg.select(
        "user_id",
        "n_events",
        F.when(F.col("den") > 0, F.round(F.col("num") / F.col("den"), 6)).alias(
            "r1"
        ),
    )


_ACF_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, {epoch_us_sql('ts')} AS ts_us, value FROM events),
m AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS m
  FROM e GROUP BY user_id),
dev AS (
  SELECT e.user_id, value - m AS d,
         LEAD(value - m) OVER (PARTITION BY e.user_id
                               ORDER BY ts_us, event_id) AS d_next
  FROM e JOIN m ON e.user_id = m.user_id),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(ROUND(d * d_next, 6) AS DECIMAL(30,6))) AS DOUBLE) AS num,
         CAST(SUM(CAST(ROUND(d * d, 6) AS DECIMAL(30,6))) AS DOUBLE) AS den
  FROM dev GROUP BY user_id)
SELECT user_id, n_events,
       CASE WHEN den > 0 THEN ROUND(num / den, 6) END AS r1
FROM agg
"""


def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily revenue
    series: trend = 7-day centered moving average, seasonal = weekday
    mean of the detrended series, residual = observed - trend -
    seasonal. Only days with a FULL 7-day window are emitted, so the
    trend is never edge-biased.

    Determinism: daily revenue is an exact integer-cents sum; the
    centered MA is an exact-integer sum / 7 (one double divide);
    detrended values are rounded to 6 dp before the weekday mean's
    DECIMAL sum (libm discipline), so every emitted number is
    bit-identical cross-engine.

    Scale posture: the raw scan collapses to ~one row per day in the
    FIRST aggregate (map-side combined); every window after that runs
    over the day-level series, which is driver-size for any horizon a
    trend window makes sense on (40 years = 15k rows). The weekday
    profile is a 7-row broadcast join back onto the series."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = (
        o.select(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
            cents.alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    wd = Window.orderBy("day").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("n_win", F.count(F.lit(1)).over(wd))
        .withColumn("trend_c", F.avg("rev_cents").over(wd))
        .where(F.col("n_win") == 7)
        .select(
            "day",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
            F.round(F.col("trend_c") / 100.0, 6).alias("trend"),
            F.round(
                (F.col("rev_cents") - F.col("trend_c")) / 100.0, 6
            ).alias("detrended"),
            (F.dayofweek("day") - 1).cast("long").alias("dow"),
        )
    )
    seasonal = trended.groupBy("dow").agg(
        F.round(
            F.sum(F.col("detrended").cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("seasonal")
    )
    # day emitted as ISO string: DuckDB DATE arrives in pandas as a
    # midnight timestamp and would canon differently from Spark's date.
    return trended.join(F.broadcast(seasonal), "dow").select(
        F.col("day").cast("string").alias("day"),
        "revenue",
        "trend",
        "seasonal",
        F.round(
            F.col("detrended") - F.col("seasonal"), 6
        ).alias("residual"),
    )


_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1),
t AS (
  SELECT day, rev_cents,
         COUNT(*) OVER w AS n_win,
         AVG(rev_cents) OVER w AS trend_c
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
trended AS (
  SELECT day,
         CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
         round(trend_c / 100.0, 6) AS trend,
         round((rev_cents - trend_c) / 100.0, 6) AS detrended,
         CAST(dayofweek(day) AS BIGINT) AS dow
  FROM t WHERE n_win = 7),
seasonal AS (
  SELECT dow,
         round(CAST(SUM(CAST(detrended AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*), 6) AS seasonal
  FROM trended GROUP BY dow)
SELECT CAST(day AS VARCHAR) AS day, revenue, trend, seasonal.seasonal,
       round(detrended - seasonal.seasonal, 6) AS residual
FROM trended JOIN seasonal USING (dow)
"""


_TSEN_CAP = 30  # pairwise slopes over the first K events per user


def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per user: the median of all pairwise
    slopes (v_j - v_i)/(t_j - t_i) over the user's first K=30 events —
    the estimator that shrugs off the outliers that wreck OLS
    (compare ml_linreg_closed_form).

    The median is pinned by construction: slopes are ranked
    (slope, i, j) and the median is the mean of the two middle ranks
    (equal for odd counts) — no reliance on either engine's
    median/quantile interpolation.

    Scale posture: the per-user prefix cap makes pair generation
    O(K²/2) per user (435 pairs at K=30), independent of corpus size;
    the self-join and both windows are all keyed by user_id, so the
    whole plan is one hash partitioning reused end-to-end."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TSEN_CAP)
        .select(
            "user_id",
            "rn",
            epoch_us("ts").alias("t"),
            "value",
        )
    )
    a = capped.select(
        "user_id",
        F.col("rn").alias("i"),
        F.col("t").alias("ti"),
        F.col("value").alias("vi"),
    )
    b = capped.select(
        "user_id",
        F.col("rn").alias("j"),
        F.col("t").alias("tj"),
        F.col("value").alias("vj"),
    )
    slopes = (
        a.join(b, "user_id")
        .where((F.col("i") < F.col("j")) & (F.col("ti") < F.col("tj")))
        .select(
            "user_id",
            "i",
            "j",
            (
                (F.col("vj") - F.col("vi"))
                / ((F.col("tj") - F.col("ti")) / F.lit(1_000_000.0))
            ).alias("slope"),
        )
    )
    ws = Window.partitionBy("user_id").orderBy("slope", "i", "j")
    ranked = slopes.select(
        "user_id",
        "slope",
        F.row_number().over(ws).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    mid = ranked.where(
        (F.col("rk") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rk") == F.floor(F.col("n") / 2) + 1)
    )
    return mid.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_slopes"),
        F.round(
            F.sum("slope") / F.count(F.lit(1)), 9
        ).alias("theil_sen_slope"),
    )


def _tsen_sql() -> str:
    return f"""
WITH capped AS (
  SELECT user_id, rn, t, value
  FROM (SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               {epoch_us_sql('ts')} AS t
        FROM events)
  WHERE rn <= {_TSEN_CAP}),
slopes AS (
  SELECT a.user_id, a.rn AS i, b.rn AS j,
         (b.value - a.value)
           / ((b.t - a.t) / CAST(1000000 AS DOUBLE)) AS slope
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.rn < b.rn AND a.t < b.t),
ranked AS (
  SELECT user_id, slope, i, j,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY slope, i, j) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM slopes)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_slopes,
       round(SUM(slope) / COUNT(*), 9) AS theil_sen_slope
FROM ranked
WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1
GROUP BY user_id
"""


def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per user over the same capped 30-event
    prefix as ts_theil_sen: S = Σ sign(v_j - v_i) over ordered pairs,
    plus Kendall's tau-a = S / n_pairs — the non-parametric "is there
    a monotonic trend" screen (pure integers + one exact division, so
    the whole statistic is bit-identical cross-engine; the slope
    MAGNITUDE lives in ts_theil_sen)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TSEN_CAP)
        .select("user_id", "rn", epoch_us("ts").alias("t"), "value")
    )
    a = capped.select(
        "user_id", F.col("rn").alias("i"), F.col("t").alias("ti"),
        F.col("value").alias("vi"),
    )
    b = capped.select(
        "user_id", F.col("rn").alias("j"), F.col("t").alias("tj"),
        F.col("value").alias("vj"),
    )
    pairs = a.join(b, "user_id").where(
        (F.col("i") < F.col("j")) & (F.col("ti") < F.col("tj"))
    )
    sgn = F.signum(F.col("vj") - F.col("vi")).cast("long")
    return (
        pairs.select("user_id", sgn.alias("s"))
        .groupBy("user_id")
        .agg(
            bcount().alias("n_pairs"),
            F.sum("s").cast("long").alias("mk_s"),
        )
        .select(
            "user_id",
            "n_pairs",
            "mk_s",
            F.round(
                F.col("mk_s").cast("double") / F.col("n_pairs").cast("double"),
                6,
            ).alias("tau_a"),
        )
    )


def _mk_sql() -> str:
    return f"""
WITH capped AS (
  SELECT user_id, rn, t, value
  FROM (SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               {epoch_us_sql('ts')} AS t
        FROM events)
  WHERE rn <= {_TSEN_CAP}),
pairs AS (
  SELECT a.user_id, CAST(sign(b.value - a.value) AS BIGINT) AS s
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.rn < b.rn AND a.t < b.t)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(s) AS BIGINT) AS mk_s,
       round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS tau_a
FROM pairs GROUP BY user_id
"""


def ts_next_purchase_eta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-purchase ETA per customer: mean inter-order gap (exact
    integer day diffs, DECIMAL mean) projected from the last order —
    the "when do we expect them back" operational feature (and its
    overdue flag relative to the dataset's end). Integer day
    arithmetic throughout; the ETA emits as an ISO date string."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    gaps = o.select(
        "o_custkey",
        "d",
        F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap"),
    )
    per = gaps.groupBy("o_custkey").agg(
        bcount().alias("n_orders"),
        F.max("d").alias("last_d"),
        F.round(
            F.sum(F.col("gap").cast(_DEC)).cast("double")
            / F.count("gap"),
            6,
        ).alias("mean_gap_days"),
    )
    return per.where(F.col("n_orders") >= 2).select(
        "o_custkey",
        "n_orders",
        F.col("last_d").cast("string").alias("last_order_day"),
        "mean_gap_days",
        F.date_add(
            F.col("last_d"), F.round(F.col("mean_gap_days")).cast("int")
        )
        .cast("string")
        .alias("eta_day"),
    )


_ETA_SQL = """
WITH g AS (
  SELECT o_custkey, d,
         datediff('day', lag(d) OVER (PARTITION BY o_custkey ORDER BY d),
                  d) AS gap
  FROM (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders)),
per AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         MAX(d) AS last_d,
         round(CAST(SUM(CAST(gap AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(gap), 6) AS mean_gap_days
  FROM g GROUP BY o_custkey)
SELECT o_custkey, n_orders,
       CAST(last_d AS VARCHAR) AS last_order_day,
       mean_gap_days,
       CAST(last_d + CAST(round(mean_gap_days) AS INT) AS VARCHAR)
         AS eta_day
FROM per WHERE n_orders >= 2
"""


def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift monitor per event_type: S_t = Σ(cnt_i - μ)
    over the daily count series, reported as max |S_t|, its peak day,
    and a flag against the h = 5σ·conventional band — the classic
    page-style drift detector complementing dq_distribution_drift
    (distributional) and ts_changepoint_split (single split).

    Determinism: daily counts and their cumsums are exact integers;
    S_t = cum_t - t·(total/n) and σ both become single double
    expressions of identical integer operands in both engines
    (variance is cancellation-amplified, so display values round 6 dp
    — NOTES rule). Peak day tie-breaks to the earliest day. One
    shuffle to daily grain, then per-type windows over a
    days-bounded frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(bcount().alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    wa = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.row_number().over(w).cast("long").alias("t"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cum"),
        F.sum("cnt").over(wa).cast("long").alias("total"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n_days"),
        F.sum(F.col("cnt") * F.col("cnt")).over(wa).cast("long").alias(
            "sum_sq"
        ),
    )
    s = (
        F.col("cum").cast("double")
        - F.col("t").cast("double")
        * F.col("total").cast("double")
        / F.col("n_days").cast("double")
    )
    scored = cum.withColumn("abs_s", F.abs(s))
    wr = Window.partitionBy("event_type").orderBy(
        F.col("abs_s").desc(), F.col("d").asc()
    )
    best = (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") == 1)
        .select(
            "event_type",
            "total",
            "n_days",
            "sum_sq",
            F.col("abs_s").alias("cusum_max"),
            F.col("d").alias("peak_day"),
        )
    )
    n = F.col("n_days").cast("double")
    mu = F.col("total").cast("double") / n
    sigma = F.sqrt(F.col("sum_sq").cast("double") / n - mu * mu)
    return best.select(
        "event_type",
        "n_days",
        F.round("cusum_max", 6).alias("cusum_max"),
        F.col("peak_day").cast("string").alias("peak_day"),
        F.round(sigma, 6).alias("sigma"),
        (F.col("cusum_max") > F.lit(5.0) * sigma).alias("flagged"),
    )


_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, d,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS t,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
         CAST(SUM(cnt * cnt) OVER (PARTITION BY event_type) AS BIGINT)
           AS sum_sq
  FROM daily),
scored AS (
  SELECT *,
         abs(CAST(cum AS DOUBLE) - CAST(t AS DOUBLE) * CAST(total AS DOUBLE)
             / CAST(n_days AS DOUBLE)) AS abs_s
  FROM cum),
best AS (
  SELECT event_type, total, n_days, sum_sq,
         abs_s AS cusum_max, d AS peak_day
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY abs_s DESC, d ASC) AS rnk
    FROM scored)
  WHERE rnk = 1)
SELECT event_type, n_days,
       round(cusum_max, 6) AS cusum_max,
       CAST(peak_day AS VARCHAR) AS peak_day,
       round(sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_days AS DOUBLE)
             - (CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE))
               * (CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE))), 6)
         AS sigma,
       cusum_max > 5.0 * sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_days AS DOUBLE)
             - (CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE))
               * (CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE)))
         AS flagged
FROM best
"""


QUERIES = {
    "ts_cusum_drift": ts_cusum_drift,
    "ts_mann_kendall": ts_mann_kendall,
    "ts_next_purchase_eta": ts_next_purchase_eta,
    "ts_seasonal_decompose": ts_seasonal_decompose,
    "ts_theil_sen": ts_theil_sen,
    "ts_resample_ohlc": ts_resample_ohlc,
    "ts_autocorr_lag1": ts_autocorr_lag1,
    "ts_anomaly_mad": ts_anomaly_mad,
    "ts_changepoint_split": ts_changepoint_split,
    "ts_gap_fill": ts_gap_fill,
    "ts_rolling_zscore": ts_rolling_zscore,
    "ts_ewma": ts_ewma,
}

ORACLE = {
    "ts_cusum_drift": _CUSUM_SQL,
    "ts_mann_kendall": _mk_sql(),
    "ts_next_purchase_eta": _ETA_SQL,
    "ts_seasonal_decompose": _SEASONAL_SQL,
    "ts_theil_sen": _tsen_sql(),
    "ts_resample_ohlc": _OHLC_SQL,
    "ts_autocorr_lag1": _ACF_SQL,
    "ts_anomaly_mad": _MAD_SQL,
    "ts_changepoint_split": _CHANGEPOINT_SQL,
    "ts_gap_fill": _GAP_FILL_SQL,
    "ts_rolling_zscore": _ZSCORE_SQL,
    "ts_ewma": _ewma_sql(),
}


# ---------------------------------------------------------------------------
# Rolling-origin forecast backtest (round 4): evaluate a 3-observation
# moving-average forecaster out-of-sample at every month — the
# walk-forward validation loop every demand-forecasting pipeline runs.


_SMA_WIN = 3


def ts_backtest_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest SMA(3): for each order priority's monthly revenue
    series, forecast month m with the mean of the previous 3 OBSERVED
    months (ROWS window — gap-safe by definition: the forecaster sees
    the last 3 observations, matching what a production job would have
    on hand) and score the forecast against the realized value.

    Exactness: revenue per month is a DECIMAL sum; the SMA is that
    exact sum over an exact count, one IEEE division; error and
    absolute-percentage-error are single-expression doubles rounded to
    6 dp. Scale: one orders aggregate down to (priority x month), then
    5-series windows."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mon"),
    ).agg(dsum("o_totalprice").alias("val"))
    w = (
        Window.partitionBy("series")
        .orderBy("mon")
        .rowsBetween(-_SMA_WIN, -1)
    )
    d = monthly.withColumn(
        "pred_sum", F.sum(F.col("val").cast(_DEC)).over(w).cast("double")
    ).withColumn("pred_n", F.count(F.lit(1)).over(w))
    d = d.where(F.col("pred_n") == _SMA_WIN).withColumn(
        "pred", F.col("pred_sum") / F.col("pred_n").cast("double")
    )
    return d.select(
        "series",
        F.col("mon").cast("string").alias("mon"),
        F.round("val", 2).alias("actual"),
        F.round("pred", 6).alias("pred"),
        F.round(F.col("val") - F.col("pred"), 6).alias("err"),
        F.round(
            F.abs(F.col("val") - F.col("pred")) / F.col("val"), 6
        ).alias("ape"),
    )


_BACKTEST_SMA_SQL = f"""
WITH monthly AS (
  SELECT o_orderpriority AS series,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
         {dsum_sql('o_totalprice')} AS val
  FROM orders GROUP BY 1, 2),
d AS (
  SELECT *,
         CAST(SUM(CAST(val AS DECIMAL(30,6))) OVER (
           PARTITION BY series ORDER BY mon
           ROWS BETWEEN {_SMA_WIN} PRECEDING AND 1 PRECEDING) AS DOUBLE)
           AS pred_sum,
         COUNT(*) OVER (
           PARTITION BY series ORDER BY mon
           ROWS BETWEEN {_SMA_WIN} PRECEDING AND 1 PRECEDING) AS pred_n
  FROM monthly)
SELECT series, CAST(mon AS VARCHAR) AS mon,
       round(val, 2) AS actual,
       round(pred_sum / CAST(pred_n AS DOUBLE), 6) AS pred,
       round(val - pred_sum / CAST(pred_n AS DOUBLE), 6) AS err,
       round(abs(val - pred_sum / CAST(pred_n AS DOUBLE)) / val, 6) AS ape
FROM d WHERE pred_n = {_SMA_WIN}
"""

QUERIES["ts_backtest_sma"] = ts_backtest_sma
ORACLE["ts_backtest_sma"] = _BACKTEST_SMA_SQL


# ---------------------------------------------------------------------------
# Time-weighted average (round 4): the hypertable/irregular-sampling
# aggregate (TimescaleDB's time_weight('LOCF')): each observation holds
# until the next one, so its weight is the interval it covers — the
# correct mean for unevenly-sampled gauges, where a plain AVG
# overweights bursts.


def ts_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value`` (last-observation-
    carried-forward): sum(value_i * (t_{i+1} - t_i)) / (t_n - t_0),
    over microsecond epochs. Each product value x microseconds is
    computed in double (single IEEE multiply on identical operands),
    quantized to DECIMAL(30,6), and summed exactly — order-independent
    (the pagerank discipline) — then ONE division by the exact total
    span. Users with < 2 events have no span and are excluded (the
    operator's documented domain). One window sort per user partition,
    one aggregate; nothing global."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = epoch_us("ts")
    d = ev.select(
        "user_id",
        ts_us.alias("t"),
        "value",
        (F.lead(ts_us).over(w) - ts_us).alias("dt_us"),
    )
    agg = (
        d.groupBy("user_id")
        .agg(
            F.sum(
                (F.col("value") * F.col("dt_us").cast("double")).cast(_DEC)
            ).alias("wsum"),
            F.sum("dt_us").cast("long").alias("span_us"),
            bcount().alias("n_obs"),
        )
        .where(F.col("span_us") > 0)
    )
    return agg.select(
        "user_id",
        "n_obs",
        "span_us",
        F.round(
            F.col("wsum").cast("double") / F.col("span_us").cast("double"), 6
        ).alias("twa"),
    )


_TWA_SQL = f"""
WITH d AS (
  SELECT user_id, {epoch_us_sql('ts')} AS t, value,
         lead({epoch_us_sql('ts')}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)
           - {epoch_us_sql('ts')} AS dt_us
  FROM events),
agg AS (
  SELECT user_id,
         SUM(CAST(value * CAST(dt_us AS DOUBLE) AS DECIMAL(30,6))) AS wsum,
         CAST(SUM(dt_us) AS BIGINT) AS span_us,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM d GROUP BY user_id)
SELECT user_id, n_obs, span_us,
       round(CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE), 6) AS twa
FROM agg WHERE span_us > 0
"""

QUERIES["ts_twa"] = ts_twa
ORACLE["ts_twa"] = _TWA_SQL


# ---------------------------------------------------------------------------
# Holt's linear-trend exponential smoothing (round 5): the genuinely
# SEQUENTIAL per-series recurrence (level+trend feed back into every
# step) that no window frame or closed form expresses — the canonical
# use of applyInPandas: one Arrow batch per series key, the recurrence
# runs in-process over that series, and the cluster parallelizes
# ACROSS keys. Constants are chosen exactly representable in binary
# (alpha=0.5, beta=0.25, so 1-alpha=0.5 and 1-beta=0.75 are exact) and
# the update expressions are written with identical operand order in
# Python and in the DuckDB recursive-CTE oracle, so every IEEE step is
# bit-identical — the oracle is a FULL hash oracle despite the op
# being "iterative state", which is the point.

_HW_ALPHA = 0.5
_HW_BETA = 0.25


def _holt_group(pdf):
    import pandas as pd

    pdf = pdf.sort_values("d")
    ys = [float(v) for v in pdf["cnt"]]
    level, trend = ys[0], 0.0
    for y in ys[1:]:
        prev = level
        level = _HW_ALPHA * y + (1.0 - _HW_ALPHA) * (level + trend)
        trend = _HW_BETA * (level - prev) + (1.0 - _HW_BETA) * trend
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [len(ys)],
            "level": [round(level, 6)],
            "trend": [round(trend, 6)],
            "forecast_1": [round(level + trend, 6)],
            "forecast_7": [round(level + 7.0 * trend, 6)],
        }
    )


def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing of the per-event_type daily
    count series: init l_1 = y_1, b_1 = 0, then
    l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1});
    b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}.
    Emits final state and the 1- and 7-step-ahead linear forecasts.
    One shuffle to daily grain, one shuffle to series keys; at scale
    the per-key series (days-cardinality) always fits an Arrow batch."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(bcount().alias("cnt"))
    schema = (
        "event_type string, n_days long, level double, trend double,"
        " forecast_1 double, forecast_7 double"
    )
    return daily.groupBy("event_type").applyInPandas(_holt_group, schema)


_HOLT_SQL = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily),
hw(event_type, rn, n, l, b) AS (
  SELECT event_type, 1, n, y, CAST(0 AS DOUBLE) FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.event_type, i.rn, h.n,
         {_HW_ALPHA} * i.y + {1.0 - _HW_ALPHA} * (h.l + h.b),
         {_HW_BETA} * (({_HW_ALPHA} * i.y + {1.0 - _HW_ALPHA} * (h.l + h.b))
                       - h.l)
           + {1.0 - _HW_BETA} * h.b
  FROM hw h JOIN idx i ON i.event_type = h.event_type AND i.rn = h.rn + 1)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(l + b, 6) AS forecast_1, round(l + 7 * b, 6) AS forecast_7
FROM hw WHERE rn = n
"""

QUERIES["ts_holt_winters"] = ts_holt_winters
ORACLE["ts_holt_winters"] = _HOLT_SQL


# ---------------------------------------------------------------------------
# DFT periodogram (round 5): naive discrete-Fourier power at candidate
# periods 2..14 days over the mean-centered per-event_type daily count
# series — the seasonality detector behind "is this weekly?". The
# interesting determinism problem: the terms are TRANSCENDENTAL
# (cos/sin may differ by 1 ulp between java.lang.Math and libm), and a
# double SUM over them is order-dependent — so each term is quantized
# to DECIMAL(38,12) and summed EXACTLY (pagerank's discipline), making
# the sum order-independent in both engines; the residual 1-ulp term
# noise (~1e-14 abs) is absorbed by rounding the power to 2 dp. Cost:
# one shuffle to daily grain, then a 13x literal-period explode over a
# days-cardinality frame — all codegen, no Python.

_DFT_PERIODS = tuple(range(2, 15))


def ts_fourier_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(bcount().alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    wa = Window.partitionBy("event_type")
    t = (
        daily.select(
            "event_type",
            (F.row_number().over(w) - 1).cast("double").alias("t"),
            (
                F.col("cnt").cast("double")
                - F.sum("cnt").over(wa).cast("double") / F.count("cnt").over(wa)
            ).alias("y"),
        )
        .select(
            "event_type",
            "y",
            "t",
            F.explode(
                F.array(*[F.lit(p) for p in _DFT_PERIODS])
            ).alias("period"),
        )
    )
    theta = (F.lit(2.0) * F.lit(math.pi) * F.col("t")) / F.col(
        "period"
    ).cast("double")
    # decimal(38,12), NOT compat._DEC (30,6): the trig terms are O(1)
    # and 6 dp of per-term quantization would cost ~1e-4 over a series.
    quant = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    agg = t.groupBy("event_type", "period").agg(
        quant(F.col("y") * F.cos(theta)).alias("sc"),
        quant(F.col("y") * F.sin(theta)).alias("ss"),
    )
    return agg.select(
        "event_type",
        F.col("period").cast("long").alias("period"),
        F.round(
            F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"), 2
        ).alias("power"),
    )


def _dft_sql() -> str:
    periods = ", ".join(str(p) for p in _DFT_PERIODS)
    return f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1
              AS DOUBLE) AS t,
         CAST(cnt AS DOUBLE)
           - CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE)
             / COUNT(cnt) OVER (PARTITION BY event_type) AS y
  FROM daily),
f AS (
  SELECT event_type, y, t, period
  FROM c, UNNEST([{periods}]) AS u(period)),
agg AS (
  SELECT event_type, period,
         CAST(SUM(CAST(y * cos((2.0 * pi() * t) / CAST(period AS DOUBLE))
                       AS DECIMAL(38,12))) AS DOUBLE) AS sc,
         CAST(SUM(CAST(y * sin((2.0 * pi() * t) / CAST(period AS DOUBLE))
                       AS DECIMAL(38,12))) AS DOUBLE) AS ss
  FROM f GROUP BY 1, 2)
SELECT event_type, CAST(period AS BIGINT) AS period,
       round(sc * sc + ss * ss, 2) AS power
FROM agg
"""


QUERIES["ts_fourier_period"] = ts_fourier_period
ORACLE["ts_fourier_period"] = _dft_sql()


# ---------------------------------------------------------------------------
# 1-D Kalman filter, local-level model (round 5): the second
# sequential-state operator (with ts_holt_winters) — predict/update
# recursion where the GAIN itself evolves with the error covariance,
# so no fixed-weight unrolling (ts_ewma's trick) can express it.
# applyInPandas per series; constants q=1, r=4 and init p=1 are exact
# binary doubles and both engines evaluate the same expression tree,
# so the recursion is bit-identical and the oracle is a full hash
# oracle (the Holt discipline).

_KF_Q = 1.0  # process variance
_KF_R = 4.0  # observation variance


def _kalman_group(pdf):
    import pandas as pd

    pdf = pdf.sort_values("d")
    ys = [float(v) for v in pdf["cnt"]]
    x, p = ys[0], 1.0
    k = 0.0
    for y in ys[1:]:
        p_pred = p + _KF_Q
        k = p_pred / (p_pred + _KF_R)
        x = x + k * (y - x)
        p = (1.0 - k) * p_pred
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [len(ys)],
            "x_final": [round(x, 6)],
            "p_final": [round(p, 6)],
            "k_final": [round(k, 6)],
        }
    )


def ts_kalman_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kalman local-level filter over per-event_type daily counts:
    x_t = x_{t-1} + k_t (y_t - x_{t-1}) with
    k_t = (p_{t-1}+q) / (p_{t-1}+q+r), p_t = (1-k_t)(p_{t-1}+q).
    Emits the final state estimate, covariance and gain per series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(bcount().alias("cnt"))
    schema = (
        "event_type string, n_days long, x_final double, p_final double,"
        " k_final double"
    )
    return daily.groupBy("event_type").applyInPandas(_kalman_group, schema)


_KALMAN_SQL = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily),
kf(event_type, rn, n, x, p, k) AS (
  SELECT event_type, 1, n, y, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.event_type, i.rn, f.n,
         f.x + ((f.p + {_KF_Q}) / ((f.p + {_KF_Q}) + {_KF_R})) * (i.y - f.x),
         (1.0 - (f.p + {_KF_Q}) / ((f.p + {_KF_Q}) + {_KF_R}))
           * (f.p + {_KF_Q}),
         (f.p + {_KF_Q}) / ((f.p + {_KF_Q}) + {_KF_R})
  FROM kf f JOIN idx i ON i.event_type = f.event_type AND i.rn = f.rn + 1)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(x, 6) AS x_final, round(p, 6) AS p_final, round(k, 6) AS k_final
FROM kf WHERE rn = n
"""

QUERIES["ts_kalman_filter"] = ts_kalman_filter
ORACLE["ts_kalman_filter"] = _KALMAN_SQL


# ---------------------------------------------------------------------------
# ACF profile (round 5): sample autocorrelation of the daily-revenue
# series at lags 1..7 — the first diagnostic a forecaster runs (weekly
# seasonality shows as a lag-7 peak). Companion to ts_autocorr_lag1
# (per-user lag-1 on event values); this is the SERIES-level profile
# over multiple lags with the standard full-series denominator.

_ACF_MAX_LAG = 7


def ts_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample ACF r_k = sum_t (x_t - xbar)(x_{t-k} - xbar) / sum_t
    (x_t - xbar)^2 for k = 1.._ACF_MAX_LAG over daily order revenue.

    Shape: ONE groupBy(o_orderdate) shuffle reduces 100 TB of orders to
    a ~2.4k-row daily series; xbar/denominator come from DECIMAL-exact
    full-frame window sums and the lag products go back through DECIMAL
    before summing, so both engines feed identical doubles into
    identical IEEE division (compat rules 1-3). The ordered window runs
    on the aggregated series (bounded rows), so the single-partition
    sort is a non-issue at any input scale.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(dsum("o_totalprice").alias("x"))
    )
    tot = Window.partitionBy()
    xbar = (
        F.sum(F.col("x").cast(_DEC)).over(tot).cast("double")
        / F.count("*").over(tot)
    ).cast("double")
    w = Window.orderBy("o_orderdate")
    d = daily.select(
        "x",
        xbar.alias("xbar"),
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, _ACF_MAX_LAG + 1)],
    )
    dev = F.col("x") - F.col("xbar")
    d = d.withColumn(
        "denom",
        F.sum((dev * dev).cast(_DEC)).over(tot).cast("double"),
    )
    long = d.select(
        "x",
        "xbar",
        "denom",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"x{k}").alias("xl"),
                    )
                    for k in range(1, _ACF_MAX_LAG + 1)
                ]
            )
        ).alias("s"),
    ).select("x", "xbar", "denom", "s.lag", "s.xl")
    num = F.sum(
        F.when(
            F.col("xl").isNotNull(),
            ((F.col("x") - F.col("xbar")) * (F.col("xl") - F.col("xbar"))).cast(_DEC),
        )
    ).cast("double")
    return (
        long.groupBy("lag")
        .agg(
            F.count("xl").cast("long").alias("n_pairs"),
            F.round(num / F.max("denom"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


_ACF_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS d, {dsum_sql('o_totalprice')} AS x
  FROM orders GROUP BY o_orderdate),
st AS (
  SELECT d, x,
         CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) OVER () AS DOUBLE)
              / COUNT(*) OVER () AS DOUBLE) AS xbar
  FROM daily),
lagd AS (
  SELECT x, xbar,
         {', '.join(f'lag(x, {k}) OVER (ORDER BY d) AS x{k}' for k in range(1, _ACF_MAX_LAG + 1))},
         CAST(SUM(CAST((x - xbar) * (x - xbar) AS DECIMAL(30,6))) OVER ()
              AS DOUBLE) AS denom
  FROM st),
long AS (
  SELECT x, xbar, denom, u.lag AS lag, u.xl AS xl
  FROM lagd, UNNEST([
    {', '.join("{'lag': CAST(%d AS BIGINT), 'xl': x%d}" % (k, k) for k in range(1, _ACF_MAX_LAG + 1))}
  ]) AS t(u))
SELECT lag, CAST(COUNT(xl) AS BIGINT) AS n_pairs,
       round(CAST(SUM(CAST((x - xbar) * (xl - xbar) AS DECIMAL(30,6)))
                  FILTER (WHERE xl IS NOT NULL) AS DOUBLE)
             / MAX(denom), 6) AS acf
FROM long
GROUP BY lag
ORDER BY lag
"""

QUERIES["ts_acf_profile"] = ts_acf_profile
ORACLE["ts_acf_profile"] = _ACF_SQL


def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of each event-type's daily-count periodogram —
    the one-number regularity score (low = one dominant cycle, high =
    white noise) built ON TOP of ts_fourier_period's registered output:
    p_k = power_k / sum(power), H = -sum p ln p, plus H normalized by
    ln(K). The powers are already 2-dp-quantized by the DFT op, so the
    spectrum itself is cross-engine identical; entropy terms are 6-dp
    quantized into a DECIMAL sum (the Kaplan-Meier log discipline).
    Zero-power bins contribute 0 by the usual convention."""
    spec = ts_fourier_period(spark, sf_dir)
    wa = Window.partitionBy("event_type")
    tot = F.sum(F.col("power").cast(_DEC)).over(wa).cast("double")
    p = F.col("power") / F.col("tot")
    term = F.when(
        F.col("power") > 0.0, F.round(-(p * F.log(p)), 6)
    ).otherwise(F.lit(0.0))
    import math

    d = spec.withColumn("tot", tot).select(
        "event_type", "period", term.alias("h_term")
    )
    return (
        d.groupBy("event_type")
        .agg(
            bcount().alias("n_periods"),
            F.sum(F.col("h_term").cast(_DEC)).cast("double").alias("h_raw"),
        )
        .select(
            "event_type",
            "n_periods",
            F.round("h_raw", 6).alias("h_nats"),
            F.round(
                F.col("h_raw") / F.lit(math.log(len(_DFT_PERIODS))), 6
            ).alias("h_norm"),
        )
        .orderBy("event_type")
    )


def _spectral_entropy_sql() -> str:
    import math

    return f"""
WITH dft AS ({_dft_sql()}),
withtot AS (
  SELECT event_type, period, power,
         CAST(SUM(CAST(power AS DECIMAL(30,6)))
              OVER (PARTITION BY event_type) AS DOUBLE) AS tot
  FROM dft),
terms AS (
  SELECT event_type,
         CASE WHEN power > 0.0
              THEN round(-((power / tot) * ln(power / tot)), 6)
              ELSE 0.0 END AS h_term
  FROM withtot)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_periods,
       round(CAST(SUM(CAST(h_term AS DECIMAL(30,6))) AS DOUBLE), 6) AS h_nats,
       round(CAST(SUM(CAST(h_term AS DECIMAL(30,6))) AS DOUBLE)
             / {math.log(len(_DFT_PERIODS))!r}, 6) AS h_norm
FROM terms
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["ts_spectral_entropy"] = ts_spectral_entropy
ORACLE["ts_spectral_entropy"] = _spectral_entropy_sql()


# Durbin-Levinson recursion unrolled for lags 1..4 over the 6 dp-
# quantized ACF values r1..r4 (ts_acf_profile's outputs, already
# bit-identical across engines). Each step is ONE shared SQL text
# evaluated by Spark (F.expr) and DuckDB verbatim on columns produced
# by the previous step, so the IEEE operation trees are identical by
# construction.
_DL_STEPS = [
    ("p11", "(r1)"),
    ("p22", "((r2 - p11 * r1) / (1.0 - p11 * r1))"),
    ("p21", "(p11 - p22 * p11)"),
    (
        "p33",
        "((r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2))",
    ),
    ("p31", "(p21 - p33 * p22)"),
    ("p32", "(p22 - p33 * p21)"),
    (
        "p44",
        "((r4 - p31 * r3 - p32 * r2 - p33 * r1)"
        " / (1.0 - p31 * r1 - p32 * r2 - p33 * r3))",
    ),
]


def ts_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (lags 1-4) of daily order revenue via
    the Durbin-Levinson recursion — the AR-order diagnostic (the PACF
    cuts off at the true AR lag, where the ACF only decays).

    Composition on top of ts_acf_profile's REGISTERED output: the 6 dp
    ACF values are pivoted into one row (r1..r4) and the recursion is
    a fixed unrolled cascade of shared-text float expressions
    (_DL_STEPS) — no iteration, no data-size dependence. All heavy
    lifting is the one groupBy(o_orderdate) shuffle inside the ACF;
    everything after runs on a single broadcastable row.
    """
    acf = QUERIES["ts_acf_profile"](spark, sf_dir)
    row = acf.agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("acf"))).alias(f"r{k}")
            for k in range(1, 5)
        ]
    )
    for name, expr in _DL_STEPS:
        row = row.withColumn(name, F.expr(expr))
    pacf = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.round(F.col(p), 6).alias("pacf"),
                    )
                    for k, p in ((1, "p11"), (2, "p22"), (3, "p33"), (4, "p44"))
                ]
            )
        ).alias("s")
    ).select("s.lag", "s.pacf")
    return pacf.orderBy("lag")


def _pacf_sql() -> str:
    pivot = ", ".join(
        f"MAX(CASE WHEN lag = {k} THEN acf END) AS r{k}" for k in range(1, 5)
    )
    ctes = [f"acf AS ({_ACF_SQL})", f"r0 AS (SELECT {pivot} FROM acf)"]
    prev = "r0"
    for i, (name, expr) in enumerate(_DL_STEPS):
        ctes.append(f"d{i} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"d{i}"
    rows = "\nUNION ALL ".join(
        "SELECT CAST(%d AS BIGINT) AS lag, round(%s, 6) AS pacf FROM %s"
        % (k, p, prev)
        for k, p in ((1, "p11"), (2, "p22"), (3, "p33"), (4, "p44"))
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows + "\nORDER BY lag"


QUERIES["ts_pacf_durbin"] = ts_pacf_durbin
ORACLE["ts_pacf_durbin"] = _pacf_sql()


# Croston smoothing constant and its complement as literal text so both
# engines parse the identical doubles.
_CROSTON_A = "0.2"
_CROSTON_B = "0.8"
# EWMA closed form per part over demand events ordered by day (rn, n):
# z_n = (1-a)^(n-1) y_1 + a * sum_{k=2..n} (1-a)^(n-k) y_k, and the
# inter-arrival smoother starts at the FIRST gap (rn = 2):
# p_n = (1-a)^(n-2) g_2 + a * sum_{k=3..n} (1-a)^(n-k) g_k.
_CROSTON_ZTERM = (
    f"(CASE WHEN rn = 1 THEN power({_CROSTON_B}, CAST(n - 1 AS DOUBLE)) * yv"
    f" ELSE {_CROSTON_A} * power({_CROSTON_B}, CAST(n - rn AS DOUBLE)) * yv END)"
)
_CROSTON_PTERM = (
    f"(CASE WHEN rn = 2 THEN power({_CROSTON_B}, CAST(n - 2 AS DOUBLE)) * g"
    f" WHEN rn > 2 THEN {_CROSTON_A} * power({_CROSTON_B},"
    f" CAST(n - rn AS DOUBLE)) * g ELSE NULL END)"
)
_CROSTON_MIN_DAYS = 8


def ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand (Croston 1972): per
    part, exponentially smooth the nonzero demand SIZES and the
    INTER-ARRIVAL gaps separately; the demand-rate forecast is z/p.
    The standard forecast for spare-parts-style series where most days
    sell nothing — exactly what per-part order history looks like.

    The recursion is replaced by its closed form: an EWMA after n
    observations is a fixed linear combination with weights
    a*(1-a)^(n-k) (init term (1-a)^(n-1)), so both smoothers become
    one groupBy(part) over per-event terms — no iteration, fully
    oracle-able. Terms go through DECIMAL per-term rounding (compat
    rule 1) so the power() libm wiggle can never reorder a sum.

    Shape: one shuffle keys the order-line join (orderkey), one keys
    the per-(part, day) demand collapse, and the event window +
    final aggregate reuse that part partitioning. Parts with fewer
    than 8 demand days are dropped (too sparse to smooth).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # shuffle_hash on the (4x smaller, 2-column) orders side: sort-merge
    # sorts BOTH shuffled sides, and that UnsafeExternalSorter is what
    # spilled the 40x point under the local heap (SCALE_SMOKE r3 note).
    # A per-partition hash build of orders is a fraction of the sort
    # buffers, and nothing downstream needs join order (the next op is
    # a hash groupBy re-shuffle on (part, day)).
    demands = (
        li.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_partkey",
            (epoch_us("o_orderdate") / F.lit(86_400_000_000)).cast("long").alias("day"),
        )
        .agg(dsum("l_quantity").alias("yv"))
    )
    wp = Window.partitionBy("l_partkey").orderBy("day")
    ev = (
        demands.withColumn("rn", F.row_number().over(wp))
        .withColumn("n", F.count("*").over(Window.partitionBy("l_partkey")))
        .withColumn("g", (F.col("day") - F.lag("day", 1).over(wp)).cast("double"))
        .where(F.col("n") >= _CROSTON_MIN_DAYS)
    )
    agg = ev.groupBy("l_partkey").agg(
        F.max("n").cast("long").alias("n_days"),
        dsum(F.expr(_CROSTON_ZTERM)).alias("z"),
        dsum(F.expr(_CROSTON_PTERM)).alias("p"),
    )
    return agg.select(
        "l_partkey",
        "n_days",
        F.round("z", 6).alias("z"),
        F.round("p", 6).alias("p"),
        F.round(F.col("z") / F.col("p"), 6).alias("croston_rate"),
    ).orderBy("l_partkey")


_CROSTON_SQL = f"""
WITH demands AS (
  SELECT l.l_partkey,
         {epoch_us_sql('o.o_orderdate')} // 86400000000 AS day,
         {dsum_sql('l.l_quantity')} AS yv
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
ev AS (
  SELECT l_partkey, yv,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY day) AS rn,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n,
         CAST(day - LAG(day, 1) OVER (PARTITION BY l_partkey ORDER BY day)
              AS DOUBLE) AS g
  FROM demands),
agg AS (
  SELECT l_partkey,
         CAST(MAX(n) AS BIGINT) AS n_days,
         {dsum_sql(_CROSTON_ZTERM)} AS z,
         {dsum_sql(_CROSTON_PTERM)} AS p
  FROM ev
  WHERE n >= {_CROSTON_MIN_DAYS}
  GROUP BY l_partkey)
SELECT l_partkey, n_days, round(z, 6) AS z, round(p, 6) AS p,
       round(z / p, 6) AS croston_rate
FROM agg
ORDER BY l_partkey
"""

QUERIES["ts_croston"] = ts_croston
ORACLE["ts_croston"] = _CROSTON_SQL


_XCORR_MAX_LAG = 7
# Pearson correlation from DECIMAL-exact sufficient sums — one shared
# closed-form text over (np, sa, sb, sab, saa, sbb).
_XCORR_R = (
    "((CAST(np AS DOUBLE) * sab - sa * sb)"
    " / (sqrt(CAST(np AS DOUBLE) * saa - sa * sa)"
    " * sqrt(CAST(np AS DOUBLE) * sbb - sb * sb)))"
)


def ts_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation profile between the daily click and
    purchase counts: Pearson r of (clicks_t, purchases_{t+lag}) for
    lag -7..+7 — 'do clicks lead purchases, and by how many days?',
    the cross-series counterpart of ts_acf_profile.

    Shape: the event table collapses to one ~700-row daily frame in a
    single groupBy(day) shuffle; the 15-lag explode and the shifted
    self-join run on that bounded frame (join key day+lag), so input
    scale only affects the first aggregate. Sufficient sums go through
    DECIMAL; r is one shared closed-form text, rounded to 6 dp.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("a"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("b"),
        )
    )
    lags = F.broadcast(
        spark.createDataFrame(
            [(l,) for l in range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1)], "lag long"
        )
    )
    left = daily.select("day", "a").crossJoin(lags)
    right = daily.select(F.col("day").alias("rday"), "b")
    pairs = left.join(
        right, F.col("rday") == F.col("day") + F.col("lag")
    ).select("lag", F.col("a").cast("double").alias("a"), F.col("b").cast("double").alias("b"))
    suff = pairs.groupBy("lag").agg(
        bcount().alias("np"),
        dsum("a").alias("sa"),
        dsum("b").alias("sb"),
        dsum(F.col("a") * F.col("b")).alias("sab"),
        dsum(F.col("a") * F.col("a")).alias("saa"),
        dsum(F.col("b") * F.col("b")).alias("sbb"),
    )
    return suff.select(
        "lag", "np", F.round(F.expr(_XCORR_R), 6).alias("xcorr")
    ).orderBy("lag")


def _xcorr_sql() -> str:
    vals = ", ".join(
        f"({l})" for l in range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT {epoch_us_sql('ts')} // 86400000000 AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1),
lags(lag) AS (VALUES {vals}),
pairs AS (
  SELECT l.lag, CAST(x.a AS DOUBLE) AS a, CAST(y.b AS DOUBLE) AS b
  FROM daily x CROSS JOIN lags l
  JOIN daily y ON y.day = x.day + l.lag),
suff AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS np,
         {dsum_sql('a')} AS sa, {dsum_sql('b')} AS sb,
         {dsum_sql('a * b')} AS sab,
         {dsum_sql('a * a')} AS saa,
         {dsum_sql('b * b')} AS sbb
  FROM pairs GROUP BY lag)
SELECT lag, np, round({_XCORR_R}, 6) AS xcorr
FROM suff
ORDER BY lag
"""


QUERIES["ts_lead_lag_xcorr"] = ts_lead_lag_xcorr
ORACLE["ts_lead_lag_xcorr"] = _xcorr_sql()


# Seasonal/trend strength (Hyndman & Athanasopoulos FPP): variance
# ratios over the decomposition components, from DECIMAL-exact sums.
_STRENGTH_FS = (
    "GREATEST(0.0, 1.0 - (vrr / CAST(n AS DOUBLE)"
    " - (srr / CAST(n AS DOUBLE)) * (srr / CAST(n AS DOUBLE)))"
    " / (vsr / CAST(n AS DOUBLE)"
    " - (ssr / CAST(n AS DOUBLE)) * (ssr / CAST(n AS DOUBLE))))"
)
_STRENGTH_FT = (
    "GREATEST(0.0, 1.0 - (vrr / CAST(n AS DOUBLE)"
    " - (srr / CAST(n AS DOUBLE)) * (srr / CAST(n AS DOUBLE)))"
    " / (vtr / CAST(n AS DOUBLE)"
    " - (str_ / CAST(n AS DOUBLE)) * (str_ / CAST(n AS DOUBLE))))"
)


def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend STRENGTH of the daily revenue series (FPP3
    definitions): F_s = max(0, 1 - Var(R)/Var(S+R)) and
    F_t = max(0, 1 - Var(R)/Var(T+R)) over ts_seasonal_decompose's
    registered components — the one-number 'is this series worth a
    seasonal model?' diagnostic on top of the full decomposition.

    Composition discipline: the decomposition's emitted columns are
    already 6 dp-quantized and hash-identical across engines, so this
    op only adds DECIMAL-exact sufficient sums over that bounded
    day-level frame and two shared-text variance-ratio expressions.
    """
    d = QUERIES["ts_seasonal_decompose"](spark, sf_dir)
    comp = d.select(
        F.col("residual").alias("r"),
        (F.col("seasonal") + F.col("residual")).alias("sr"),
        (F.col("trend") + F.col("residual")).alias("tr"),
    )
    suff = comp.agg(
        bcount().alias("n"),
        dsum("r").alias("srr"),
        dsum(F.col("r") * F.col("r")).alias("vrr"),
        dsum("sr").alias("ssr"),
        dsum(F.col("sr") * F.col("sr")).alias("vsr"),
        dsum("tr").alias("str_"),
        dsum(F.col("tr") * F.col("tr")).alias("vtr"),
    )
    return suff.select(
        "n",
        F.round(F.expr(_STRENGTH_FS), 6).alias("f_seasonal"),
        F.round(F.expr(_STRENGTH_FT), 6).alias("f_trend"),
    )


def _seasonal_strength_sql() -> str:
    return f"""
WITH decomp AS ({_SEASONAL_SQL}),
comp AS (
  SELECT residual AS r, seasonal + residual AS sr, trend + residual AS tr
  FROM decomp),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('r')} AS srr, {dsum_sql('r * r')} AS vrr,
         {dsum_sql('sr')} AS ssr, {dsum_sql('sr * sr')} AS vsr,
         {dsum_sql('tr')} AS str_, {dsum_sql('tr * tr')} AS vtr
  FROM comp)
SELECT n, round({_STRENGTH_FS}, 6) AS f_seasonal,
       round({_STRENGTH_FT}, 6) AS f_trend
FROM suff
"""


QUERIES["ts_seasonal_strength"] = ts_seasonal_strength
ORACLE["ts_seasonal_strength"] = _seasonal_strength_sql()


# Ljung-Box over the quantized ACF profile; chi-square tail via the
# Wilson-Hilferty cube-root normal approximation (shared text).
_LB_K = 7  # lags == _ACF_MAX_LAG


def _wh_chi2_tail(x: str, k: int) -> str:
    """P(Chi2_k > x) by Wilson-Hilferty: 1 - Phi(((x/k)^(1/3) - (1 -
    2/(9k))) / sqrt(2/(9k))) — one shared closed-form text. The normal
    score is quantized to 6 dp BEFORE the Phi tail so the pow() libm
    wiggle can't reach the final rounding (caught live: a 1-ulp pow
    difference flipped the 6th decimal of p across engines)."""
    c = f"(2.0 / (9.0 * {float(k)}))"
    z = (
        f"round((pow({x} / {float(k)}, 1.0 / 3.0) - (1.0 - {c}))"
        f" / sqrt({c}), 6)"
    )
    half = (
        f"(CASE WHEN {z} >= 0.0"
        f" THEN ({_AS_TAIL(z)}) / 2.0"
        f" ELSE 1.0 - ({_AS_TAIL(z)}) / 2.0 END)"
    )
    return half


def _AS_TAIL(zabs_signed: str) -> str:
    """Two-sided A&S normal tail of |z| (same polynomial the inference
    module uses), inlined here to keep timeseries self-contained."""
    x = f"(abs({zabs_signed}) * 0.7071067811865476)"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"(((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741)"
        f" * {t} - 0.284496736) * {t} + 0.254829592) * {t})"
    )
    return f"({poly} * exp(-({x} * {x})))"


def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily-revenue ACF (lags 1-7):
    Q = n(n+2) * sum r_k^2/(n-k) with an approximate chi-square_7
    p-value (Wilson-Hilferty) — 'is this series white noise?', the
    gatekeeper before fitting any AR structure (ts_pacf_durbin).

    Composed on ts_acf_profile's registered 6 dp ACF and exact pair
    counts; Q's terms go through DECIMAL, and the p-value is one
    shared-text closed form, so the whole test is engine-stable. All
    math runs on the 7-row ACF frame — input scale only touches the
    ACF's one daily shuffle.
    """
    acf = QUERIES["ts_acf_profile"](spark, sf_dir)
    # n = series length = n_pairs at lag k plus k (exact integers)
    terms = acf.select(
        "lag",
        "acf",
        (F.col("n_pairs") + F.col("lag")).alias("n"),
    )
    suff = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.expr(
                "CAST(acf * acf / (CAST(n - lag AS DOUBLE)) AS DECIMAL(30,18))"
            )
        )
        .cast("double")
        .alias("s"),
    )
    q = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * s)"
    return suff.select(
        "n",
        F.round(F.expr(q), 6).alias("q_stat"),
        F.round(F.expr(_wh_chi2_tail(q, _LB_K)), 5).alias("p_approx"),
    )


def _ljung_box_sql() -> str:
    q = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * s)"
    return f"""
WITH acf AS ({_ACF_SQL}),
terms AS (
  SELECT lag, acf, n_pairs + lag AS n FROM acf),
suff AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CAST(acf * acf / (CAST(n - lag AS DOUBLE))
              AS DECIMAL(30,18))) AS DOUBLE) AS s
  FROM terms)
SELECT n, round({q}, 6) AS q_stat,
       round({_wh_chi2_tail(q, _LB_K)}, 5) AS p_approx
FROM suff
"""


QUERIES["ts_ljung_box"] = ts_ljung_box
ORACLE["ts_ljung_box"] = _ljung_box_sql()


# OLS of daily revenue (in MILLIONS — the |v| < 4e9 DECIMAL rule) on
# daily order count; closed-form slope/intercept, quantized 6 dp
# before residuals.
_EG_BETA = (
    "round((CAST(n AS DOUBLE) * sxy - sx * sy)"
    " / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)"
)
_EG_ALPHA = "round((sy - beta * sx) / CAST(n AS DOUBLE), 6)"


def ts_residual_mean_reversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger-style residual diagnostics: regress daily revenue
    on daily order count (OLS, closed form), then measure how strongly
    the residual series mean-reverts via its lag-1 autocorrelation —
    rho near 1 means the 'relationship residual' wanders (no
    cointegration-like stability), rho near 0 means deviations correct
    within a day. The pair-trading / steady-relationship screen.

    Revenue is scaled to millions before any DECIMAL quantization (the
    4e9 rule); alpha/beta quantize to 6 dp before residuals so the
    residual column is engine-identical; the lag join runs on the
    bounded daily frame (ACF discipline).
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            bcount().alias("cnt"),
            dsum(F.col("o_totalprice") / F.lit(1000000.0)).alias("rev"),
        )
    )
    suff = daily.agg(
        bcount().alias("n"),
        dsum(F.col("cnt").cast("double")).alias("sx"),
        dsum("rev").alias("sy"),
        dsum(F.col("cnt").cast("double") * F.col("rev")).alias("sxy"),
        dsum(F.col("cnt").cast("double") * F.col("cnt").cast("double")).alias("sxx"),
    )
    fit = suff.withColumn("beta", F.expr(_EG_BETA)).withColumn(
        "alpha", F.expr(_EG_ALPHA)
    )
    resid = daily.crossJoin(F.broadcast(fit.select("n", "alpha", "beta"))).select(
        "day",
        "n",
        (
            F.col("rev")
            - (F.col("alpha") + F.col("beta") * F.col("cnt").cast("double"))
        ).alias("e"),
    )
    w = Window.orderBy("day")
    lagged = resid.withColumn("el", F.lag("e", 1).over(w))
    out = lagged.agg(
        F.max("n").cast("long").alias("n_days"),
        dsum(F.when(F.col("el").isNotNull(), F.col("e") * F.col("el"))).alias("num"),
        dsum(F.col("e") * F.col("e")).alias("den"),
    )
    return out.crossJoin(F.broadcast(fit.select("alpha", "beta"))).select(
        "n_days",
        "beta",
        "alpha",
        F.round(F.col("num") / F.col("den"), 6).alias("resid_rho1"),
    )


def _eg_sql() -> str:
    return f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         {dsum_sql('o_totalprice / 1000000.0')} AS rev
  FROM orders GROUP BY 1),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('CAST(cnt AS DOUBLE)')} AS sx,
         {dsum_sql('rev')} AS sy,
         {dsum_sql('CAST(cnt AS DOUBLE) * rev')} AS sxy,
         {dsum_sql('CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)')} AS sxx
  FROM daily),
fit2 AS (
  SELECT n, beta, {_EG_ALPHA} AS alpha
  FROM (SELECT *, {_EG_BETA} AS beta FROM suff)),
resid AS (
  SELECT d.day, f.n,
         d.rev - (f.alpha + f.beta * CAST(d.cnt AS DOUBLE)) AS e
  FROM daily d CROSS JOIN fit2 f),
lagged AS (
  SELECT n, e, LAG(e, 1) OVER (ORDER BY day) AS el FROM resid),
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_days,
         {dsum_sql('CASE WHEN el IS NOT NULL THEN e * el END')} AS num,
         {dsum_sql('e * e')} AS den
  FROM lagged)
SELECT n_days, f.beta, f.alpha, round(num / den, 6) AS resid_rho1
FROM agg CROSS JOIN fit2 f
"""


QUERIES["ts_residual_mean_reversion"] = ts_residual_mean_reversion
ORACLE["ts_residual_mean_reversion"] = _eg_sql()


_PEAK_WING = 3


def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection on daily order revenue: a day is a peak
    when it strictly exceeds every day within +-3 days (integer-cents
    comparisons — no float ties), reported with its wing-relative
    prominence (peak minus the higher of the two wing maxima). The
    alerting primitive behind 'unusual day' detection.

    Shape: the fact table collapses to the bounded daily frame first;
    the 6 lag/lead comparisons are one window pass over that frame.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    cols = {}
    for k in range(1, _PEAK_WING + 1):
        cols[f"lb{k}"] = F.lag("cents", k).over(w)
        cols[f"la{k}"] = F.lead("cents", k).over(w)
    d = daily
    for name, c in cols.items():
        d = d.withColumn(name, c)
    neighbors = [F.col(f"lb{k}") for k in range(1, _PEAK_WING + 1)] + [
        F.col(f"la{k}") for k in range(1, _PEAK_WING + 1)
    ]
    is_peak = F.lit(True)
    for nb in neighbors:
        is_peak = is_peak & nb.isNotNull() & (F.col("cents") > nb)
    wingmax = F.greatest(*neighbors)
    return (
        d.where(is_peak)
        .select(
            F.col("day").cast("string").alias("day"),
            (F.col("cents") / F.lit(100.0)).alias("revenue"),
            ((F.col("cents") - wingmax) / F.lit(100.0)).alias("prominence"),
        )
        .orderBy("day")
    )


def _peak_sql() -> str:
    lags = ",\n         ".join(
        f"LAG(cents, {k}) OVER (ORDER BY day) AS lb{k},\n         "
        f"LEAD(cents, {k}) OVER (ORDER BY day) AS la{k}"
        for k in range(1, _PEAK_WING + 1)
    )
    nbs = [f"lb{k}" for k in range(1, _PEAK_WING + 1)] + [
        f"la{k}" for k in range(1, _PEAK_WING + 1)
    ]
    notnull = " AND ".join(f"{n} IS NOT NULL" for n in nbs)
    above = " AND ".join(f"cents > {n}" for n in nbs)
    wingmax = f"GREATEST({', '.join(nbs)})"
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
lagged AS (
  SELECT day, cents,
         {lags}
  FROM daily)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(cents - {wingmax} AS DOUBLE) / 100.0 AS prominence
FROM lagged
WHERE {notnull} AND {above}
ORDER BY day
"""


QUERIES["ts_peak_detection"] = ts_peak_detection
ORACLE["ts_peak_detection"] = _peak_sql()


# Theta method (Assimakopoulos & Nikolopoulos 2000), theta = 2,
# SES alpha = 0.2: literal-text constants shared by both engines.
_THETA_A = "0.2"
_THETA_B = "0.8"
_THETA_TREND_B = (
    "round((CAST(n AS DOUBLE) * sty - st * sy)"
    " / (CAST(n AS DOUBLE) * stt - st * st), 6)"
)
_THETA_TREND_A = "round((sy - b * st) / CAST(n AS DOUBLE), 6)"
_THETA_SES_TERM = (
    f"(CASE WHEN rn = 1 THEN power({_THETA_B}, CAST(n - 1 AS DOUBLE)) * th"
    f" ELSE {_THETA_A} * power({_THETA_B}, CAST(n - rn AS DOUBLE)) * th END)"
)


def ts_theta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Theta forecast (M3 competition winner) for next-day revenue:
    average of (a) the linear-trend extrapolation and (b) SES over the
    theta(2)-line 2y - trend, which doubles the series' local
    curvature. All three pieces are closed forms — OLS on the time
    index, the EWMA weight-sum for SES (croston discipline) — so the
    whole forecast oracles exactly.

    Revenue runs in MILLIONS (DECIMAL 4e9 rule); trend parameters
    quantize to 6 dp before the theta-line so every SES term is an
    engine-identical double. One fact collapse to the daily frame;
    everything else is bounded-frame windows.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice") / F.lit(1000000.0)).alias("y"))
    )
    w = Window.orderBy("day")
    d = daily.withColumn("rn", F.row_number().over(w).cast("long"))
    suff = d.agg(
        bcount().alias("n"),
        dsum(F.col("rn").cast("double")).alias("st"),
        dsum("y").alias("sy"),
        dsum(F.col("rn").cast("double") * F.col("y")).alias("sty"),
        dsum(F.col("rn").cast("double") * F.col("rn").cast("double")).alias("stt"),
    )
    fit = suff.withColumn("b", F.expr(_THETA_TREND_B)).withColumn(
        "a", F.expr(_THETA_TREND_A)
    )
    th = d.crossJoin(F.broadcast(fit.select("n", "a", "b"))).select(
        "rn",
        "n",
        "a",
        "b",
        (
            2.0 * F.col("y")
            - (F.col("a") + F.col("b") * F.col("rn").cast("double"))
        ).alias("th"),
    )
    ses = th.agg(
        F.max("n").cast("long").alias("n"),
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.round(dsum(F.expr(_THETA_SES_TERM)), 6).alias("ses_theta2"),
    )
    return ses.select(
        "n",
        "a",
        "b",
        "ses_theta2",
        F.round(
            F.expr(
                "0.5 * (a + b * (CAST(n AS DOUBLE) + 1.0)) + 0.5 * ses_theta2"
            ),
            6,
        ).alias("theta_forecast"),
    )


def _theta_sql() -> str:
    return f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         {dsum_sql('o_totalprice / 1000000.0')} AS y
  FROM orders GROUP BY 1),
d AS (
  SELECT day, y,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn
  FROM daily),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('CAST(rn AS DOUBLE)')} AS st,
         {dsum_sql('y')} AS sy,
         {dsum_sql('CAST(rn AS DOUBLE) * y')} AS sty,
         {dsum_sql('CAST(rn AS DOUBLE) * CAST(rn AS DOUBLE)')} AS stt
  FROM suff_src),
fit AS (
  SELECT n, b, {_THETA_TREND_A} AS a
  FROM (SELECT *, {_THETA_TREND_B} AS b FROM suff)),
th AS (
  SELECT d.rn, f.n, f.a, f.b,
         2.0 * d.y - (f.a + f.b * CAST(d.rn AS DOUBLE)) AS th
  FROM d CROSS JOIN fit f),
ses AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(a) AS a, MAX(b) AS b,
         round({dsum_sql(_THETA_SES_TERM)}, 6) AS ses_theta2
  FROM th)
SELECT n, a, b, ses_theta2,
       round(0.5 * (a + b * (CAST(n AS DOUBLE) + 1.0)) + 0.5 * ses_theta2, 6)
         AS theta_forecast
FROM ses
""".replace("suff_src", "d")


QUERIES["ts_theta_method"] = ts_theta_method
ORACLE["ts_theta_method"] = _theta_sql()


def ts_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy kit over the daily revenue series: MAE, RMSE
    and MASE for the two canonical baselines — naive (yesterday) and
    seasonal-naive (same weekday last week) — one row per method. The
    scoreboard every forecasting op (ts_theta_method, ts_backtest_sma,
    ts_holt_winters) is judged against; MASE scales by the naive MAE,
    so values < 1 beat 'just use yesterday'.

    Revenue in millions (DECIMAL 4e9 rule: squared errors stay small);
    all errors are lag-column arithmetic on the bounded daily frame,
    DECIMAL-summed, shared-text final ratios.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice") / F.lit(1000000.0)).alias("y"))
    )
    w = Window.orderBy("day")
    d = (
        daily.withColumn("p_naive", F.lag("y", 1).over(w))
        .withColumn("p_snaive", F.lag("y", 7).over(w))
        .where(F.col("p_snaive").isNotNull())
    )
    e1 = F.col("y") - F.col("p_naive")
    e7 = F.col("y") - F.col("p_snaive")
    suff = d.agg(
        bcount().alias("n"),
        dsum(F.abs(e1)).alias("ae1"),
        dsum(e1 * e1).alias("se1"),
        dsum(F.abs(e7)).alias("ae7"),
        dsum(e7 * e7).alias("se7"),
    )
    naive = suff.select(
        F.lit("naive").alias("method"),
        "n",
        F.round(F.expr("ae1 / CAST(n AS DOUBLE)"), 6).alias("mae"),
        F.round(F.expr("sqrt(se1 / CAST(n AS DOUBLE))"), 6).alias("rmse"),
        F.round(F.lit(1.0), 6).alias("mase"),
    )
    snaive = suff.select(
        F.lit("seasonal_naive").alias("method"),
        "n",
        F.round(F.expr("ae7 / CAST(n AS DOUBLE)"), 6).alias("mae"),
        F.round(F.expr("sqrt(se7 / CAST(n AS DOUBLE))"), 6).alias("rmse"),
        F.round(F.expr("(ae7 / CAST(n AS DOUBLE)) / (ae1 / CAST(n AS DOUBLE))"), 6).alias(
            "mase"
        ),
    )
    return naive.unionByName(snaive).orderBy("method")


def _forecast_accuracy_sql() -> str:
    return f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         {dsum_sql('o_totalprice / 1000000.0')} AS y
  FROM orders GROUP BY 1),
d AS (
  SELECT y,
         LAG(y, 1) OVER (ORDER BY day) AS p_naive,
         LAG(y, 7) OVER (ORDER BY day) AS p_snaive
  FROM daily),
k AS (SELECT * FROM d WHERE p_snaive IS NOT NULL),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('abs(y - p_naive)')} AS ae1,
         {dsum_sql('(y - p_naive) * (y - p_naive)')} AS se1,
         {dsum_sql('abs(y - p_snaive)')} AS ae7,
         {dsum_sql('(y - p_snaive) * (y - p_snaive)')} AS se7
  FROM k)
SELECT 'naive' AS method, n,
       round(ae1 / CAST(n AS DOUBLE), 6) AS mae,
       round(sqrt(se1 / CAST(n AS DOUBLE)), 6) AS rmse,
       round(1.0, 6) AS mase
FROM suff
UNION ALL
SELECT 'seasonal_naive' AS method, n,
       round(ae7 / CAST(n AS DOUBLE), 6) AS mae,
       round(sqrt(se7 / CAST(n AS DOUBLE)), 6) AS rmse,
       round((ae7 / CAST(n AS DOUBLE)) / (ae1 / CAST(n AS DOUBLE)), 6) AS mase
FROM suff
ORDER BY method
"""


QUERIES["ts_forecast_accuracy"] = ts_forecast_accuracy
ORACLE["ts_forecast_accuracy"] = _forecast_accuracy_sql()


def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing days in the daily
    click-revenue series (events 'value' for purchases): a full date
    scaffold left-joins the observed days, and each gap day gets
    prev + (next - prev) * offset/gap — the standard time-series
    imputation (ts_gap_fill's forward-fill sibling).

    The interpolation weights are exact integer day offsets; values
    are 6 dp-quantized before the affine blend so both engines blend
    identical doubles. Scaffold and windows live on the bounded daily
    frame.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day")
    ).agg(F.round(dsum("value"), 6).alias("v"))
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).collect()[0]
    scaffold = spark.range(bounds.lo, bounds.hi + 1).select(
        F.col("id").alias("day")
    )
    j = scaffold.join(daily, "day", "left")
    w = Window.orderBy("day")
    wprev = w.rowsBetween(Window.unboundedPreceding, 0)
    wnext = w.rowsBetween(0, Window.unboundedFollowing)
    filled = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(wprev))
        .withColumn(
            "pd",
            F.last(F.when(F.col("v").isNotNull(), F.col("day")), True).over(wprev),
        )
        .withColumn("nv", F.first("v", ignorenulls=True).over(wnext))
        .withColumn(
            "nd",
            F.first(F.when(F.col("v").isNotNull(), F.col("day")), True).over(wnext),
        )
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.round(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("day") - F.col("pd")).cast("double")
                / (F.col("nd") - F.col("pd")).cast("double")
            ),
            6,
        )
    )
    return (
        filled.where(F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            "day",
            (F.col("v").isNull()).cast("int").alias("imputed"),
            interp.alias("value"),
        )
        .orderBy("day")
    )


_INTERP_SQL = f"""
WITH daily AS (
  SELECT {epoch_us_sql('ts')} // 86400000000 AS day,
         round({dsum_sql('value')}, 6) AS v
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
scaffold AS (
  SELECT CAST(UNNEST(range(lo, hi + 1)) AS BIGINT) AS day FROM bounds),
j AS (SELECT s.day, d.v FROM scaffold s LEFT JOIN daily d ON s.day = d.day),
filled AS (
  SELECT day, v,
         LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
           OVER wp AS pd,
         FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
           OVER wn AS nd
  FROM j
  WINDOW wp AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT day,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS imputed,
       CASE WHEN v IS NOT NULL THEN v
            ELSE round(pv + (nv - pv)
                 * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)), 6)
       END AS value
FROM filled
WHERE pv IS NOT NULL AND nv IS NOT NULL
ORDER BY day
"""

QUERIES["ts_linear_interpolate"] = ts_linear_interpolate
ORACLE["ts_linear_interpolate"] = _INTERP_SQL


_HAAR_LEVELS = 3


def ts_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level Haar wavelet decomposition of daily revenue:
    multi-resolution energy split — detail energies per level (1-day,
    2-day, 4-day structure) plus the level-3 approximation energy, the
    'at which time-scale does variance live?' diagnostic that
    complements the Fourier periodogram.

    Revenue runs in hundreds-of-millions units so every coefficient
    product stays far below the DECIMAL-safe 4e9 bound; pair averages
    and differences are /2 halvings of identical doubles (exact IEEE),
    and each level is one groupBy on the bounded (and halving) daily
    frame. The series is truncated to a multiple of 2^3 so every level
    pairs exactly.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("double")
                / F.lit(100000000.0)
            ).alias("y")
        )
    )
    w = Window.orderBy("day")
    d = daily.withColumn("rn", F.row_number().over(w).cast("long"))
    n8 = d.agg(
        F.expr(f"(MAX(rn) DIV {2 ** _HAAR_LEVELS}) * {2 ** _HAAR_LEVELS}").alias("n8")
    )
    cur = d.crossJoin(F.broadcast(n8)).where(F.col("rn") <= F.col("n8")).select(
        "rn", "y"
    )
    out = []
    for lvl in range(1, _HAAR_LEVELS + 1):
        paired = cur.groupBy(F.expr("(rn + 1) DIV 2").alias("p")).agg(
            (F.sum("y") / F.lit(2.0)).alias("a"),
            (
                F.sum(
                    F.expr("y * CASE WHEN rn % 2 = 1 THEN 1.0 ELSE -1.0 END")
                )
                / F.lit(2.0)
            ).alias("dd"),
        )
        out.append(
            paired.agg(
                F.lit(f"d{lvl}").alias("component"),
                bcount().alias("n_coeffs"),
                F.round(dsum(F.col("dd") * F.col("dd")), 6).alias("energy"),
            )
        )
        cur = paired.select(F.col("p").alias("rn"), F.col("a").alias("y"))
    out.append(
        cur.agg(
            F.lit(f"a{_HAAR_LEVELS}").alias("component"),
            bcount().alias("n_coeffs"),
            F.round(dsum(F.col("y") * F.col("y")), 6).alias("energy"),
        )
    )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("component")


def _haar_sql() -> str:
    ctes = [
        """daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100000000.0 AS y
  FROM orders GROUP BY 1)""",
        """d0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn, y
  FROM daily)""",
        f"""n8 AS (SELECT (MAX(rn) // {2 ** _HAAR_LEVELS})
             * {2 ** _HAAR_LEVELS} AS n8 FROM d0)""",
        "c0 AS (SELECT rn, y FROM d0 CROSS JOIN n8 WHERE rn <= n8)",
    ]
    selects = []
    for lvl in range(1, _HAAR_LEVELS + 1):
        ctes.append(
            f"""p{lvl} AS (
  SELECT (rn + 1) // 2 AS p,
         SUM(y) / 2.0 AS a,
         SUM(y * CASE WHEN rn % 2 = 1 THEN 1.0 ELSE -1.0 END) / 2.0 AS dd
  FROM c{lvl - 1} GROUP BY 1)"""
        )
        ctes.append(f"c{lvl} AS (SELECT p AS rn, a AS y FROM p{lvl})")
        selects.append(
            f"""SELECT 'd{lvl}' AS component,
       CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       round({dsum_sql('dd * dd')}, 6) AS energy
FROM p{lvl}"""
        )
    selects.append(
        f"""SELECT 'a{_HAAR_LEVELS}' AS component,
       CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       round({dsum_sql('y * y')}, 6) AS energy
FROM c{_HAAR_LEVELS}"""
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY component"
    )


QUERIES["ts_haar_wavelet"] = ts_haar_wavelet
ORACLE["ts_haar_wavelet"] = _haar_sql()


# Syntetos-Boylan demand-pattern cut points, as literal text.
_SBC_ADI = "1.32"
_SBC_CV2 = "0.49"


def ts_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan demand classification: each part's demand
    pattern lands in one of four quadrants by ADI (average inter-demand
    interval) and CV^2 (squared coefficient of variation of demand
    sizes) — smooth / intermittent / erratic / lumpy, the router that
    decides WHICH forecaster (SES vs ts_croston) each series gets.
    Emits the per-class part counts plus mean ADI/CV^2.

    Same one-shuffle demand collapse as ts_croston; ADI and CV^2 are
    closed forms over exact per-part integer/DECIMAL sums, and the
    quadrant compare uses 6 dp-rounded values so the cut is
    engine-stable.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # shuffle_hash on the (4x smaller, 2-column) orders side: sort-merge
    # sorts BOTH shuffled sides, and that UnsafeExternalSorter is what
    # spilled the 40x point under the local heap (SCALE_SMOKE r3 note).
    # A per-partition hash build of orders is a fraction of the sort
    # buffers, and nothing downstream needs join order (the next op is
    # a hash groupBy re-shuffle on (part, day)).
    demands = (
        li.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_partkey",
            (epoch_us("o_orderdate") / F.lit(86_400_000_000)).cast("long").alias("day"),
        )
        .agg(dsum("l_quantity").alias("yv"))
    )
    per = demands.groupBy("l_partkey").agg(
        bcount().alias("nd"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        dsum("yv").alias("s"),
        dsum(F.col("yv") * F.col("yv")).alias("ss"),
    ).where(F.col("nd") >= 4)
    scored = per.select(
        "l_partkey",
        F.round(
            F.expr("CAST(d1 - d0 AS DOUBLE) / (CAST(nd AS DOUBLE) - 1.0)"), 6
        ).alias("adi"),
        F.round(
            F.expr(
                "(ss / CAST(nd AS DOUBLE)"
                " - (s / CAST(nd AS DOUBLE)) * (s / CAST(nd AS DOUBLE)))"
                " / ((s / CAST(nd AS DOUBLE)) * (s / CAST(nd AS DOUBLE)))"
            ),
            6,
        ).alias("cv2"),
    )
    cls = F.when(
        (F.col("adi") < float(_SBC_ADI)) & (F.col("cv2") < float(_SBC_CV2)),
        "smooth",
    ).when(
        (F.col("adi") >= float(_SBC_ADI)) & (F.col("cv2") < float(_SBC_CV2)),
        "intermittent",
    ).when(
        (F.col("adi") < float(_SBC_ADI)) & (F.col("cv2") >= float(_SBC_CV2)),
        "erratic",
    ).otherwise("lumpy")
    return (
        scored.select(cls.alias("pattern"), "adi", "cv2")
        .groupBy("pattern")
        .agg(
            bcount().alias("n_parts"),
            F.round(davg("adi"), 6).alias("mean_adi"),
            F.round(davg("cv2"), 6).alias("mean_cv2"),
        )
        .orderBy("pattern")
    )


def _sbc_sql() -> str:
    return f"""
WITH demands AS (
  SELECT l.l_partkey,
         {epoch_us_sql('o.o_orderdate')} // 86400000000 AS day,
         {dsum_sql('l.l_quantity')} AS yv
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
per AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nd,
         MIN(day) AS d0, MAX(day) AS d1,
         {dsum_sql('yv')} AS s,
         {dsum_sql('yv * yv')} AS ss
  FROM demands GROUP BY 1
  HAVING COUNT(*) >= 4),
scored AS (
  SELECT l_partkey,
         round(CAST(d1 - d0 AS DOUBLE) / (CAST(nd AS DOUBLE) - 1.0), 6) AS adi,
         round((ss / CAST(nd AS DOUBLE)
               - (s / CAST(nd AS DOUBLE)) * (s / CAST(nd AS DOUBLE)))
               / ((s / CAST(nd AS DOUBLE)) * (s / CAST(nd AS DOUBLE))), 6)
           AS cv2
  FROM per),
classed AS (
  SELECT CASE WHEN adi < {_SBC_ADI} AND cv2 < {_SBC_CV2} THEN 'smooth'
              WHEN adi >= {_SBC_ADI} AND cv2 < {_SBC_CV2} THEN 'intermittent'
              WHEN adi < {_SBC_ADI} AND cv2 >= {_SBC_CV2} THEN 'erratic'
              ELSE 'lumpy' END AS pattern,
         adi, cv2
  FROM scored)
SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_parts,
       round({davg_sql('adi')}, 6) AS mean_adi,
       round({davg_sql('cv2')}, 6) AS mean_cv2
FROM classed
GROUP BY pattern
ORDER BY pattern
"""


QUERIES["ts_demand_classification"] = ts_demand_classification
ORACLE["ts_demand_classification"] = _sbc_sql()


_HAMPEL_K = "3.0"
_HAMPEL_SCALE = "1.4826"  # MAD -> sigma consistency constant


def ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter on daily revenue: a day is an outlier when it
    deviates from its 7-day window MEDIAN by more than 3 * 1.4826 *
    window-MAD — the robust alternative to z-scores (one spike can't
    inflate its own threshold the way it inflates a stddev). Emits the
    flagged days with their robust z.

    Exact discipline: the window median is the 4th element of the
    SORTED 7-element integer-cents array (collect over a full ROWS
    frame; windows with < 7 days are skipped), the MAD is the 4th
    element of the sorted absolute deviations — integer arithmetic
    until the final robust-z ratio. One window pass on the bounded
    daily frame.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    arr = daily.withColumn("win", F.collect_list("cents").over(w)).where(
        F.size("win") == 7
    )
    med = F.element_at(F.array_sort("win"), 4)
    dev = F.element_at(
        F.array_sort(F.transform("win", lambda x: F.abs(x - med))), 4
    )
    scored = arr.select(
        "day",
        "cents",
        med.alias("med"),
        dev.alias("mad"),
    ).where(F.col("mad") > 0)
    rz = F.expr(
        f"abs(CAST(cents - med AS DOUBLE))"
        f" / ({_HAMPEL_SCALE} * CAST(mad AS DOUBLE))"
    )
    return (
        scored.withColumn("robust_z", F.round(rz, 6))
        .where(F.col("robust_z") > float(_HAMPEL_K))
        .select(
            F.col("day").cast("string").alias("day"),
            (F.col("cents") / F.lit(100.0)).alias("revenue"),
            (F.col("med") / F.lit(100.0)).alias("window_median"),
            "robust_z",
        )
        .orderBy("day")
    )


_HAMPEL_SQL = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
arr AS (
  SELECT day, cents,
         list(cents) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win
  FROM daily),
full7 AS (SELECT * FROM arr WHERE len(win) = 7),
scored AS (
  SELECT day, cents,
         list_sort(win)[4] AS med,
         list_sort(list_transform(win,
             x -> abs(x - list_sort(win)[4])))[4] AS mad
  FROM full7)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(med AS DOUBLE) / 100.0 AS window_median,
       robust_z
FROM (SELECT *, round(abs(CAST(cents - med AS DOUBLE))
             / ({_HAMPEL_SCALE} * CAST(mad AS DOUBLE)), 6) AS robust_z
      FROM scored WHERE mad > 0)
WHERE robust_z > {_HAMPEL_K}
ORDER BY day
"""

QUERIES["ts_hampel_outliers"] = ts_hampel_outliers
ORACLE["ts_hampel_outliers"] = _HAMPEL_SQL


def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic discretization of the monthly revenue series:
    piecewise-aggregate approximation (calendar-month mean of order
    totals, exact decimal sums), z-normalization against the global
    mean/std of the monthly series, then a 4-letter alphabet cut at
    the standard-normal breakpoints (-0.6745, 0, 0.6745) — the
    time-series indexing primitive behind SAX/iSAX motif search.

    Exactness: the ~80 monthly PAA doubles feed the global moments
    through DECIMAL(38,12) casts (values are O(1e5); scale-12 keeps 20+
    significant digits), so the grand sums are order-independent; the
    z-score is rounded to 6 dp on both sides BEFORE the breakpoint
    CASE so a letter can only flip if a z rounds exactly onto a
    breakpoint (measure-zero on this corpus; verified not to occur).

    Scale: one fact-table aggregate to months, one single-row global
    moment join — at any SF the series length is months, not rows."""
    od = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,12)"
    monthly = od.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(davg("o_totalprice").alias("paa"))
    mom = monthly.agg(
        bcount().alias("n"),
        F.sum(F.col("paa").cast(dec)).cast("double").alias("s1"),
        F.sum((F.col("paa") * F.col("paa")).cast(dec))
        .cast("double")
        .alias("s2"),
    )
    z = F.round(
        (F.col("paa") - F.col("s1") / F.col("n"))
        / F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - F.lit(1))
        ),
        6,
    )
    return (
        monthly.crossJoin(F.broadcast(mom))
        .select(
            "yr",
            "mo",
            F.round("paa", 6).alias("paa"),
            z.alias("z"),
            F.when(z < -0.6745, "a")
            .when(z < 0.0, "b")
            .when(z < 0.6745, "c")
            .otherwise("d")
            .alias("sax"),
        )
    )


_SAX_SQL = f"""
WITH monthly AS (
  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS yr,
         CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS mo,
         {davg_sql('o_totalprice')} AS paa
  FROM orders GROUP BY 1, 2),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(paa AS DECIMAL(38,12))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(paa * paa AS DECIMAL(38,12))) AS DOUBLE) AS s2
  FROM monthly),
scored AS (
  SELECT yr, mo, round(paa, 6) AS paa,
         round((paa - s1 / n)
               / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
  FROM monthly, mom)
SELECT yr, mo, paa, z,
       CASE WHEN z < -0.6745 THEN 'a'
            WHEN z < 0.0 THEN 'b'
            WHEN z < 0.6745 THEN 'c'
            ELSE 'd' END AS sax
FROM scored
"""

QUERIES["ts_sax_symbols"] = ts_sax_symbols
ORACLE["ts_sax_symbols"] = _SAX_SQL


_SES_ALPHAS = "(0.1), (0.2), (0.3), (0.4), (0.5), (0.6), (0.7), (0.8), (0.9)"

# One recursive walk shared verbatim by both engines: the monthly
# revenue series (in $M, rounded to 6dp) is smoothed per alpha with
# s' = s + a*(x - s); the one-step-ahead squared error accumulates
# through acc + e*e. The updates are deliberately NOT rounded
# per-step: a 1-dp alpha times a 6-dp value is an exact 7-dp decimal
# whose 7th digit is often 5 — a TRUE decimal half-tie where Spark's
# BigDecimal-exact round and DuckDB's scale-multiply round can split
# (it did, at sf0.001: sse diverged in the 6th dp). Because BOTH
# engines execute this identical expression text on identical input
# doubles, the unrounded chain is IEEE-bit-identical by construction;
# only the emitted sse is rounded (to 4 dp, far above the ~1e-10
# accumulated-path sensitivity of a ~1e2-magnitude SSE).
#
# Spark executes each recursion level as its own job (~0.15 s/level
# measured on a trivial 80-level recursion), so the walk consumes
# _SES_STRIDE months per level: month t+1 joins INNER (terminates the
# recursion), months t+2..t+stride join LEFT with CASE-guarded updates
# for the series tail. 80 levels -> 20; same float chain, same text on
# both engines.
_SES_STRIDE = 4


def _ses_level_exprs() -> tuple[str, str, str]:
    """(s_expr, acc_expr, rn_expr) applying _SES_STRIDE guarded SES
    updates in one recursion level; mK aliases the (LEFT-)joined month
    at offset K."""
    s, acc = "w.s", "w.acc"
    for k in range(1, _SES_STRIDE + 1):
        e = f"(m{k}.x - {s})"
        upd_s = f"({s} + w.a * {e})"
        upd_acc = f"({acc} + {e} * {e})"
        if k == 1:  # INNER-joined: always present
            s, acc = upd_s, upd_acc
        else:
            s = f"(CASE WHEN m{k}.x IS NULL THEN {s} ELSE {upd_s} END)"
            acc = f"(CASE WHEN m{k}.x IS NULL THEN {acc} ELSE {upd_acc} END)"
    rn = (
        "COALESCE("
        + ", ".join(f"m{k}.rn" for k in range(_SES_STRIDE, 0, -1))
        + ")"
    )
    return s, acc, rn


def _ses_walk_sql() -> str:
    s, acc, rn = _ses_level_exprs()
    bcast = ", ".join(f"m{k}" for k in range(1, _SES_STRIDE + 1))
    joins = "JOIN {months} m1 ON m1.rn = w.rn + 1\n" + "\n".join(
        f"  LEFT JOIN {{months}} m{k} ON m{k}.rn = w.rn + {k}"
        for k in range(2, _SES_STRIDE + 1)
    )
    return f"""
walk(a, rn, s, acc) AS (
  SELECT CAST(a AS DOUBLE), m.rn, m.x, CAST(0.0 AS DOUBLE)
  FROM (VALUES {{alphas}}) AS al(a), {{months}} m WHERE m.rn = 1
  UNION ALL
  SELECT /*+ BROADCAST({bcast}) */ w.a, {rn}, {s}, {acc}
  FROM walk w {joins}),
fin AS (
  SELECT a AS alpha, round(acc, 4) AS sse
  FROM walk WHERE rn = (SELECT MAX(rn) FROM {{months}}))
SELECT alpha, sse,
       (RANK() OVER (ORDER BY sse, alpha) = 1) AS is_best
FROM fin
"""


_SES_WALK = _ses_walk_sql()


def ts_ses_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing hyperparameter sweep: nine alphas
    smooth the monthly revenue series in parallel lanes, the
    one-step-ahead SSE accumulates per lane, and the best alpha is
    flagged — model selection for the level-only forecaster (the
    trend/seasonal big brother is ts_holt_winters).

    The SES recursion s' = s + a*(x - s), acc' = acc + (x-s)^2 is a
    strict left fold over the month series, so the Spark side runs it
    as ONE aggregate() higher-order expression over the collected
    ~80-month array — the identical IEEE-double operation chain the
    oracle's recursive CTE executes, without the O(months/stride)
    sequential recursion-level jobs Spark pays for WITH RECURSIVE
    (measured round 11: ~20 driver-planned levels = 5.9-6.1 s isolated
    at sf0.1; the fold form is one job over a 9-row lane frame). The
    oracle text keeps the recursive-CTE walk; equivalence was verified
    by byte-identical rows at sf0.001/0.01/0.1 plus the driver_sim
    hash MATCH (same float chain: e = x - s once per month, s and acc
    both updated from the PRE-update s, exactly the walk's expression
    tree)."""
    od = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate").cast("long") * 100
          + F.month("o_orderdate").cast("long"))
    months = od.groupBy(ym.alias("ym")).agg(
        F.round(dsum("o_totalprice") / 1e6, 6).alias("x")
    )
    series = months.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ym", "x"))), lambda m: m.x
        ).alias("xs")
    )
    alphas = spark.sql(
        f"SELECT CAST(a AS DOUBLE) AS a FROM (VALUES {_SES_ALPHAS}) AS al(a)"
    )
    lanes = alphas.crossJoin(F.broadcast(series))
    st = F.aggregate(
        F.slice(F.col("xs"), F.lit(2), F.size("xs") - F.lit(1)),
        F.struct(
            F.element_at("xs", 1).alias("s"),
            F.lit(0.0).cast("double").alias("acc"),
        ),
        lambda st, x: F.struct(
            (st.s + F.col("a") * (x - st.s)).alias("s"),
            (st.acc + (x - st.s) * (x - st.s)).alias("acc"),
        ),
    )
    fin = lanes.select(
        F.col("a").alias("alpha"), F.round(st.acc, 4).alias("sse")
    )
    return fin.select(
        "alpha",
        "sse",
        (F.rank().over(Window.orderBy("sse", "alpha")) == 1).alias("is_best"),
    )


_SES_MONTHS_SQL = """
(SELECT ym, x,
        CAST(ROW_NUMBER() OVER (ORDER BY ym) AS BIGINT) AS rn
 FROM (SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) * 100
                + CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ym,
              round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                    / 1e6, 6) AS x
       FROM orders GROUP BY 1))
"""

_SES_SQL = "WITH RECURSIVE " + _SES_WALK.format(
    months=_SES_MONTHS_SQL, alphas=_SES_ALPHAS
)

QUERIES["ts_ses_grid"] = ts_ses_grid
ORACLE["ts_ses_grid"] = _SES_SQL


_PW_SEGS = 3


def ts_piecewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented trend fit on the monthly revenue series: the month
    index splits into three equal-width regimes (knots at floor(n/3),
    floor(2n/3) — data-dependent but integer-exact in both engines)
    and each regime gets its own OLS line (slope, intercept, r²) — the
    piecewise-linear trend readout behind prophet-style changepoint
    models (ts_changepoint_split is the per-user MEAN-shift detector;
    this fits per-regime SLOPES on the global series).

    Exactness: x is the integer month index, y the monthly revenue in
    $M rounded to 6dp; per-regime moments go through DECIMAL(38,12)
    (agg_regr_family discipline) and the regression closed form is one
    fixed expression tree, rounded at 6dp.

    Scale: one fact aggregate to months; everything after is O(months)
    — a single tiny groupBy on the regime id."""
    od = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate").cast("long") * 100
          + F.month("o_orderdate").cast("long"))
    monthly = (
        od.groupBy(ym.alias("ym"))
        .agg(F.round(dsum("o_totalprice") / 1e6, 6).alias("y"))
        .select(
            "y",
            F.row_number().over(Window.orderBy("ym")).cast("long").alias("t"),
        )
    )
    n_months = monthly.agg(bcount().alias("n"))
    dec = "decimal(38,12)"
    seg = (
        F.when(F.col("t") <= F.floor(F.col("n") / _PW_SEGS), 1)
        .when(F.col("t") <= F.floor(2 * F.col("n") / _PW_SEGS), 2)
        .otherwise(3)
        .cast("long")
    )
    m = (
        monthly.crossJoin(F.broadcast(n_months))
        .select(seg.alias("segment"), "t", "y")
        .groupBy("segment")
        .agg(
            bcount().alias("n_points"),
            F.sum(F.col("t").cast(dec)).cast("double").alias("sx"),
            F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
            F.sum((F.col("t") * F.col("t")).cast(dec))
            .cast("double")
            .alias("sxx"),
            F.sum((F.col("t") * F.col("y")).cast(dec))
            .cast("double")
            .alias("sxy"),
            F.sum((F.col("y") * F.col("y")).cast(dec))
            .cast("double")
            .alias("syy"),
        )
    )
    n, sx, sy = F.col("n_points"), F.col("sx"), F.col("sy")
    cov_n = F.col("sxy") - sx * sy / n
    varx_n = F.col("sxx") - sx * sx / n
    vary_n = F.col("syy") - sy * sy / n
    return m.select(
        "segment",
        "n_points",
        F.round(cov_n / varx_n, 6).alias("slope"),
        F.round(sy / n - (cov_n / varx_n) * (sx / n), 6).alias("intercept"),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias("r2"),
        F.round(sy / n, 6).alias("mean_rev"),
    )


_PIECEWISE_SQL = """
WITH monthly0 AS (
  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) * 100
           + CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ym,
         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               / 1e6, 6) AS y
  FROM orders GROUP BY 1),
monthly AS (
  SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY ym) AS BIGINT) AS t
  FROM monthly0),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly),
m AS (
  SELECT CASE WHEN t <= n // 3 THEN 1
              WHEN t <= (2 * n) // 3 THEN 2
              ELSE 3 END AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(t * t AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(t * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM monthly, nn GROUP BY 1)
SELECT CAST(segment AS BIGINT) AS segment, n_points,
       round((sxy - sx * sy / n_points)
             / (sxx - sx * sx / n_points), 6) AS slope,
       round(sy / n_points - ((sxy - sx * sy / n_points)
             / (sxx - sx * sx / n_points)) * (sx / n_points), 6)
         AS intercept,
       round((sxy - sx * sy / n_points) * (sxy - sx * sy / n_points)
             / ((sxx - sx * sx / n_points) * (syy - sy * sy / n_points)),
             6) AS r2,
       round(sy / n_points, 6) AS mean_rev
FROM m
"""

QUERIES["ts_piecewise_trend"] = ts_piecewise_trend
ORACLE["ts_piecewise_trend"] = _PIECEWISE_SQL


_DTW_OUT = (
    "type_a string, type_b string, n_points long, dtw double, "
    "dtw_norm double"
)


def _dtw_pair(pdf):
    """Full-window DTW between the two hour-of-day profiles of one
    event-type pair. Every cell is rounded to 6 dp; since all inputs
    are (binary images of) 6-dp decimals, each cell value sits within
    ~1e-12 of a 6-dp decimal, so Python's round and SQL round recover
    the identical decimal — no tie ambiguity, no cross-engine drift
    (the ts_ses_grid recurrence argument, applied to a 2-D DP)."""
    import pandas as pd

    pdf = pdf.sort_values("hr")
    a = [float(v) for v in pdf["va"]]
    b = [float(v) for v in pdf["vb"]]
    n = len(a)
    prev = None
    for i in range(n):
        cur = []
        for j in range(n):
            cost = round(abs(a[i] - b[j]), 6)
            if i == 0 and j == 0:
                best = 0.0
            else:
                cands = []
                if i > 0:
                    cands.append(prev[j])
                if j > 0:
                    cands.append(cur[j - 1])
                if i > 0 and j > 0:
                    cands.append(prev[j - 1])
                best = min(cands)
            cur.append(round(cost + best, 6))
        prev = cur
    dtw = prev[-1]
    return pd.DataFrame(
        {
            "type_a": [pdf["type_a"].iloc[0]],
            "type_b": [pdf["type_b"].iloc[0]],
            "n_points": [n],
            "dtw": [dtw],
            "dtw_norm": [round(dtw / (2 * n), 6)],
        }
    )


def ts_dtw_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between the hour-of-day activity
    profiles of every event-type pair: each type reduces to a 24-point
    mean-value curve (exact decimal means, rounded 6 dp), then a
    full-window L1 DTW aligns each pair — the elastic similarity
    measure k-shape clustering and motif search are built on
    (ts_lead_lag_xcorr is the rigid-lag linear cousin).

    Architecture: the profiles are a distributed aggregate; the DP is
    inherently sequential per pair, so it runs as applyInPandas over
    PAIRS (10 groups here; P² groups generally) — each task is O(L²)
    on an L-point profile, the textbook custom-operator shape for
    Spark. The oracle replays the identical rounded DP cell-by-cell in
    a DuckDB recursive CTE (row-major, list-carried frontier)."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    prof = (
        ev.groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
        .agg(
            F.round(
                F.sum(F.col("value").cast(dec)).cast("double")
                / F.count("value"),
                6,
            ).alias("m")
        )
        .localCheckpoint()
    )
    a = prof.select(
        F.col("event_type").alias("type_a"), "hr", F.col("m").alias("va")
    )
    b = prof.select(
        F.col("event_type").alias("type_b"),
        F.col("hr").alias("hr_b"),
        F.col("m").alias("vb"),
    )
    pairs = a.join(
        b, (F.col("hr") == F.col("hr_b")) & (F.col("type_a") < F.col("type_b"))
    ).select("type_a", "type_b", "hr", "va", "vb")
    return pairs.groupBy("type_a", "type_b").applyInPandas(
        _dtw_pair, _DTW_OUT
    )


_DTW_SQL = """
WITH RECURSIVE prof AS (
  SELECT event_type,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
         round(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
               / COUNT(value), 6) AS m
  FROM events GROUP BY 1, 2),
seq AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         list(a.m ORDER BY a.hr) AS la,
         list(b.m ORDER BY b.hr) AS lb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM prof a JOIN prof b ON a.hr = b.hr AND a.event_type < b.event_type
  GROUP BY 1, 2),
-- win[k] = D(k-1) in row-major order; cell m: i = m // n, j = m % n.
walk(ta, tb, idx, win) AS (
  SELECT ta, tb, CAST(0 AS BIGINT),
         [round(abs(la[1] - lb[1]), 6)]
  FROM seq
  UNION ALL
  SELECT w.ta, w.tb, w.idx + 1,
         w.win || [round(
           round(abs(s.la[(w.idx + 1) // s.n + 1]
                     - s.lb[(w.idx + 1) % s.n + 1]), 6)
           + LEAST(
               CASE WHEN (w.idx + 1) // s.n = 0 THEN 1e18
                    ELSE w.win[w.idx + 1 - s.n + 1] END,
               CASE WHEN (w.idx + 1) % s.n = 0 THEN 1e18
                    ELSE w.win[w.idx + 1] END,
               CASE WHEN (w.idx + 1) // s.n = 0 OR (w.idx + 1) % s.n = 0
                    THEN 1e18
                    ELSE w.win[w.idx + 1 - s.n] END), 6)]
  FROM walk w JOIN seq s ON w.ta = s.ta AND w.tb = s.tb
  WHERE w.idx + 1 < s.n * s.n)
SELECT w.ta AS type_a, w.tb AS type_b, s.n AS n_points,
       w.win[s.n * s.n] AS dtw,
       round(w.win[s.n * s.n] / (2 * s.n), 6) AS dtw_norm
FROM walk w JOIN seq s ON w.ta = s.ta AND w.tb = s.tb
WHERE w.idx = s.n * s.n - 1
"""

QUERIES["ts_dtw_profiles"] = ts_dtw_profiles
ORACLE["ts_dtw_profiles"] = _DTW_SQL


_ESD_ROUNDS = 5
_ESD_THRESH = 2.5  # fixed z cutoff (the t-quantile lambda needs no SQL)


def ts_anomaly_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-ESD-style iterative outlier extraction on the
    monthly revenue series: five rounds of (recompute mean/std on the
    REMAINING points -> flag the max-|z| point -> remove it) — the
    masking-robust multi-outlier detector (ts_anomaly_mad flags
    against a static robust baseline; ESD re-estimates after every
    removal, which is what lets it find outliers that mask each
    other). The textbook t-based λᵢ is replaced by a fixed z cutoff
    for the is_anomalous flag (the extraction ORDER is λ-free).

    Exactness: per-round moments are DECIMAL-exact closed forms
    (agg_stats discipline), z rounds to 6 dp before the argmax, ties
    break on the month key; the oracle unrolls the identical five
    rounds as CTE pairs. Scale: the series is O(months) after one
    fact aggregate; each round is a tiny-frame aggregate + top-1."""
    od = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate").cast("long") * 100
          + F.month("o_orderdate").cast("long"))
    cur = (
        od.groupBy(ym.alias("ym"))
        .agg(F.round(dsum("o_totalprice") / 1e6, 6).alias("x"))
        .localCheckpoint()
    )
    dec = "decimal(38,12)"
    found = []
    for rnd in range(1, _ESD_ROUNDS + 1):
        stats = cur.agg(
            bcount().alias("n"),
            F.sum(F.col("x").cast(dec)).cast("double").alias("s1"),
            F.sum((F.col("x") * F.col("x")).cast(dec))
            .cast("double")
            .alias("s2"),
        )
        z = F.round(
            F.abs(F.col("x") - F.col("s1") / F.col("n"))
            / F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - F.lit(1))
            ),
            6,
        )
        anom = (
            cur.crossJoin(F.broadcast(stats))
            .select("ym", "x", z.alias("z"))
            .orderBy(F.col("z").desc(), F.col("ym").asc())
            .limit(1)
            .select(
                F.lit(rnd).cast("long").alias("round"),
                "ym",
                "x",
                "z",
                (F.col("z") > _ESD_THRESH).cast("long").alias("is_anomalous"),
            )
            .localCheckpoint()
        )
        found.append(anom)
        cur = cur.join(anom.select("ym"), "ym", "left_anti").localCheckpoint()
    out = found[0]
    for f in found[1:]:
        out = out.unionByName(f)
    return out


def _esd_sql() -> str:
    rounds = []
    prev = "monthly"
    for rnd in range(1, _ESD_ROUNDS + 1):
        rounds.append(f"""
st{rnd} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS s2
  FROM {prev}),
an{rnd} AS (
  SELECT CAST({rnd} AS BIGINT) AS round, ym, x,
         round(abs(x - s1 / n)
               / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
  FROM {prev}, st{rnd}
  ORDER BY z DESC, ym ASC LIMIT 1),
rem{rnd} AS (
  SELECT m.ym, m.x FROM {prev} m
  WHERE m.ym NOT IN (SELECT ym FROM an{rnd}))""")
        prev = f"rem{rnd}"
    selects = " UNION ALL ".join(
        f"SELECT round, ym, x, z, "
        f"CAST(CASE WHEN z > {_ESD_THRESH} THEN 1 ELSE 0 END AS BIGINT)"
        f" AS is_anomalous FROM an{r}"
        for r in range(1, _ESD_ROUNDS + 1)
    )
    return f"""
WITH monthly AS (
  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) * 100
           + CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ym,
         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               / 1e6, 6) AS x
  FROM orders GROUP BY 1),
{','.join(rounds)}
{selects}
"""


QUERIES["ts_anomaly_esd"] = ts_anomaly_esd
ORACLE["ts_anomaly_esd"] = _esd_sql()


def ts_hierarchical_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation over region -> nation: each
    nation's next-year revenue is forecast with the drift method
    (last + (last-first)/(n-1)), each REGION is forecast independently
    the same way, and the incoherent bottom-up gap is closed by
    top-down proportional reconciliation — reconciled_nation =
    region_forecast x nation_forecast / sum(nation forecasts in the
    region). Coherence (reconciled children sum to the parent) is the
    property hierarchical-forecasting systems exist to guarantee;
    tests assert it to 1e-6.

    Exactness: yearly revenue goes through DECIMAL sums; first/last
    values are picked by min/max year with arg-extraction windows; the
    drift and proportion arithmetic is a fixed expression tree rounded
    at 6 dp. Two aggregates (nation-year, then nation) + one 5-row
    region frame — the hierarchy tables stay broadcast-size at any
    fact-table scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "r_name",
            "n_name",
            F.year("o_orderdate").cast("long").alias("yr"),
            "o_totalprice",
        )
    )
    yearly = base.groupBy("r_name", "n_name", "yr").agg(
        F.round(dsum("o_totalprice") / 1e6, 6).alias("rev")
    )

    def drift(df, keys):
        w = Window.partitionBy(*keys).orderBy("yr")
        wall = Window.partitionBy(*keys)
        return (
            df.select(
                *keys,
                "yr",
                "rev",
                F.first("rev").over(w).alias("first_rev"),
                F.last("rev").over(
                    w.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
                ).alias("last_rev"),
                F.count(F.lit(1)).over(wall).alias("n_years"),
                F.max("yr").over(wall).alias("max_yr"),
            )
            .where(F.col("yr") == F.col("max_yr"))
            .select(
                *keys,
                F.round(
                    F.col("last_rev")
                    + (F.col("last_rev") - F.col("first_rev"))
                    / (F.col("n_years") - F.lit(1)).cast("double"),
                    6,
                ).alias("forecast"),
            )
        )

    nat_fc = drift(yearly, ["r_name", "n_name"])
    reg_yearly = yearly.groupBy("r_name", "yr").agg(
        F.round(F.sum(F.col("rev").cast("decimal(38,12)")).cast("double"), 6)
        .alias("rev")
    )
    reg_fc = drift(reg_yearly, ["r_name"]).withColumnRenamed(
        "forecast", "region_forecast"
    )
    bu = nat_fc.groupBy("r_name").agg(
        F.round(
            F.sum(F.col("forecast").cast("decimal(38,12)")).cast("double"), 6
        ).alias("bu_total")
    )
    return (
        nat_fc.join(F.broadcast(reg_fc), "r_name")
        .join(F.broadcast(bu), "r_name")
        .select(
            "r_name",
            "n_name",
            F.col("forecast").alias("base_forecast"),
            "region_forecast",
            "bu_total",
            F.round(
                F.col("region_forecast") * F.col("forecast")
                / F.col("bu_total"),
                6,
            ).alias("reconciled"),
        )
    )


_HIER_FC_SQL = """
WITH yearly AS (
  SELECT r.r_name, n.n_name,
         CAST(year(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT) AS yr,
         round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               / 1e6, 6) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3),
nat_fc AS (
  SELECT r_name, n_name,
         round(MAX(CASE WHEN yr = max_yr THEN rev END)
               + (MAX(CASE WHEN yr = max_yr THEN rev END)
                  - MAX(CASE WHEN yr = min_yr THEN rev END))
                 / CAST(n_years - 1 AS DOUBLE), 6) AS forecast
  FROM (SELECT *, MIN(yr) OVER (PARTITION BY r_name, n_name) AS min_yr,
               MAX(yr) OVER (PARTITION BY r_name, n_name) AS max_yr,
               COUNT(*) OVER (PARTITION BY r_name, n_name) AS n_years
        FROM yearly)
  GROUP BY r_name, n_name, n_years),
reg_yearly AS (
  SELECT r_name, yr,
         round(CAST(SUM(CAST(rev AS DECIMAL(38,12))) AS DOUBLE), 6) AS rev
  FROM yearly GROUP BY 1, 2),
reg_fc AS (
  SELECT r_name,
         round(MAX(CASE WHEN yr = max_yr THEN rev END)
               + (MAX(CASE WHEN yr = max_yr THEN rev END)
                  - MAX(CASE WHEN yr = min_yr THEN rev END))
                 / CAST(n_years - 1 AS DOUBLE), 6) AS region_forecast
  FROM (SELECT *, MIN(yr) OVER (PARTITION BY r_name) AS min_yr,
               MAX(yr) OVER (PARTITION BY r_name) AS max_yr,
               COUNT(*) OVER (PARTITION BY r_name) AS n_years
        FROM reg_yearly)
  GROUP BY r_name, n_years),
bu AS (
  SELECT r_name,
         round(CAST(SUM(CAST(forecast AS DECIMAL(38,12))) AS DOUBLE), 6)
           AS bu_total
  FROM nat_fc GROUP BY r_name)
SELECT n.r_name, n.n_name,
       n.forecast AS base_forecast,
       g.region_forecast,
       b.bu_total,
       round(g.region_forecast * n.forecast / b.bu_total, 6) AS reconciled
FROM nat_fc n JOIN reg_fc g USING (r_name) JOIN bu b USING (r_name)
"""

QUERIES["ts_hierarchical_forecast"] = ts_hierarchical_forecast
ORACLE["ts_hierarchical_forecast"] = _HIER_FC_SQL


_ADF_CRIT_5PCT = -2.89  # DF tau_mu critical value, n~80, 5%

# Closed form over the joint moments of (x = y_{t-1}, d = y_t - y_{t-1});
# one text, two engines (fixed operation order).
_ADF_RHO = "((m * sxd - sx * sd) / (m * sxx - sx * sx))"
_ADF_ALPHA = f"(sd / m - {_ADF_RHO} * sx / m)"
_ADF_RSS = (
    f"(sdd - 2 * {_ADF_ALPHA} * sd - 2 * {_ADF_RHO} * sxd"
    f" + m * {_ADF_ALPHA} * {_ADF_ALPHA}"
    f" + 2 * {_ADF_ALPHA} * {_ADF_RHO} * sx"
    f" + {_ADF_RHO} * {_ADF_RHO} * sxx)"
)
_ADF_T = (
    f"({_ADF_RHO} / sqrt(({_ADF_RSS} / (m - 2)) * m / (m * sxx - sx * sx)))"
)


def ts_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (constant, no lag augmentation) on
    the monthly revenue series: regress Δy on y_{t-1}, and a
    sufficiently negative t(ρ̂) rejects the unit root — the
    stationarity gate run before ARMA-style modeling (ts_mann_kendall
    tests TREND; this tests mean reversion). The 5% τ_μ critical
    value is a literal; the decision flag flips with it.

    One window pass builds (y_{t-1}, Δy) pairs; the six regression
    moments are DECIMAL-exact sums and the ρ̂/t closed form is a single
    shared expression tree rounded at 6 dp."""
    od = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate").cast("long") * 100
          + F.month("o_orderdate").cast("long"))
    monthly = od.groupBy(ym.alias("ym")).agg(
        F.round(dsum("o_totalprice") / 1e6, 6).alias("y")
    )
    w = Window.orderBy("ym")
    pairs = (
        monthly.select(
            "ym", "y", F.lag("y").over(w).alias("x")
        )
        .where(F.col("x").isNotNull())
        .select("x", (F.col("y") - F.col("x")).alias("d"))
    )
    dec = "decimal(38,12)"
    mom = pairs.agg(
        bcount().cast("double").alias("m"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("d").cast(dec)).cast("double").alias("sd"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("d")).cast(dec)).cast("double").alias("sxd"),
        F.sum((F.col("d") * F.col("d")).cast(dec)).cast("double").alias("sdd"),
    )
    return mom.select(
        F.col("m").cast("long").alias("n_diffs"),
        F.round(F.expr(_ADF_RHO), 6).alias("rho"),
        F.round(F.expr(_ADF_T), 6).alias("t_stat"),
        (F.expr(_ADF_T) < _ADF_CRIT_5PCT).cast("long").alias("stationary"),
    )


_ADF_SQL = f"""
WITH monthly AS (
  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) * 100
           + CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ym,
         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               / 1e6, 6) AS y
  FROM orders GROUP BY 1),
pairs AS (
  SELECT x, y - x AS d
  FROM (SELECT ym, y, LAG(y) OVER (ORDER BY ym) AS x FROM monthly)
  WHERE x IS NOT NULL),
mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(d AS DECIMAL(38,12))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * d AS DECIMAL(38,12))) AS DOUBLE) AS sxd,
         CAST(SUM(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS sdd
  FROM pairs)
SELECT CAST(m AS BIGINT) AS n_diffs,
       round({_ADF_RHO}, 6) AS rho,
       round({_ADF_T}, 6) AS t_stat,
       CAST(CASE WHEN {_ADF_T} < {_ADF_CRIT_5PCT} THEN 1 ELSE 0 END
         AS BIGINT) AS stationary
FROM mom
"""

QUERIES["ts_adf_test"] = ts_adf_test
ORACLE["ts_adf_test"] = _ADF_SQL
