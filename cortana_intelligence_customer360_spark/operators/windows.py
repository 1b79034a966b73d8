"""Window-function operators (SURVEY.md §2.5).

Every ordering carries a unique-key tiebreak (compat rule 7) so rank /
ntile / lag outputs are deterministic, and running sums accumulate in
exact decimal so each prefix value is order-independent (DuckDB
evaluates window sums with a segment tree - a plain double running sum
would associate differently and drift).

Scale: each query is a single shuffle on its partition key; the frames
are computed within sorted partitions (no extra exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount, epoch_us, epoch_us_sql
from ..sources.tables import load_table


def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank of each customer's orders by price (rank
    functions are deterministic under ties by definition)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
"""


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer - the rank-filter idiom Catalyst
    rewrites into a per-group top-k (WindowGroupLimit) instead of
    ranking everything."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_TOPK_GROUP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders)
WHERE rn <= 3
"""


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas: value change since previous event and the
    next event's type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value", 1).over(w)).alias("value_delta"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       value - LAG(value, 1) OVER w AS value_delta,
       LEAD(event_type, 1) OVER w AS next_type
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer, exact-decimal accumulated."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        epoch_us("o_orderdate").alias("o_orderdate_us"),
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("cum_spend"),
    )


_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
FROM orders
"""


def win_sliding_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h activity sum per user by event time - a RANGE frame
    over epoch seconds (the reference's rolling-window feature shape,
    computed in-flight rather than via self-join)."""
    ev = load_table(spark, sf_dir, "events")
    ts_s = (epoch_us("ts") / F.lit(1_000_000)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_s"))
        .rangeBetween(-86400, 0)
    )
    return (
        ev.withColumn("ts_s", ts_s)
        .select(
            "event_id",
            "user_id",
            "ts_s",
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("sum_24h"),
        )
    )


_SLIDING_SQL = """
SELECT event_id, user_id, ts_s,
       CAST(SUM(CAST(value AS DECIMAL(30,6)))
            OVER (PARTITION BY user_id ORDER BY ts_s
                  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_24h
FROM (SELECT event_id, user_id, value,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s
      FROM events)
"""


def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile + percent_rank of balance within nation (ntile needs
    the key tiebreak - its split under ties is arbitrary)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


_NTILE_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last event type per user by time (last needs the
    unbounded-following frame; default frames stop at current row)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w_full).alias("first_type"),
            F.last("event_type").over(w_full).alias("last_type"),
        )
        .distinct()
    )


_FIRST_LAST_SQL = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type) OVER w AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist of order value within status (peer groups share the
    value, so ties are deterministic by definition)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.cume_dist().over(w).alias("cum_dist"),
    )


_CUME_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS cum_dist
FROM orders
"""


def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + lag(ignoreNulls) — the window functions dashboards
    lean on for 'third purchase' / 'last known value' questions. Per
    user: the 3rd event's value over the full frame, and the most
    recent PRIOR purchase value carried to every event (last(ignore
    nulls) over a conditional column, frame ending 1 PRECEDING)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.nth_value("value", 3).over(w_full).alias("third_value"),
        F.last(purchase_val, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("last_purchase_before"),
    )


_NTH_VALUE_SQL = """
SELECT event_id, user_id,
       NTH_VALUE(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS third_value,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         AS last_purchase_before
FROM events
"""


def win_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (the MATCH_RECOGNIZE shape Spark
    lacks natively): maximal runs of >= 3 CONSECUTIVE 'error' events in
    a user's chronological stream, reported with run span and length —
    the alerting/incident primitive.

    Gaps-and-islands with the running-count trick: the number of
    non-error events seen so far is constant exactly within a
    consecutive-error run, so it IS the run id. One user-keyed window
    shuffle; the run aggregation reuses the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grp = F.sum((F.col("event_type") != "error").cast("long")).over(w)
    runs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("grp", grp)
        .where(F.col("event_type") == "error")
        .groupBy("user_id", "grp")
        .agg(
            F.min(epoch_us("ts")).alias("start_us"),
            F.max(epoch_us("ts")).alias("end_us"),
            F.count(F.lit(1)).cast("long").alias("n_errors"),
        )
    )
    return runs.where(F.col("n_errors") >= 3).select(
        "user_id", "start_us", "end_us", "n_errors"
    )


_ERROR_BURST_SQL = f"""
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
  FROM events),
runs AS (
  SELECT user_id, grp,
         MIN({epoch_us_sql('ts')}) AS start_us,
         MAX({epoch_us_sql('ts')}) AS end_us,
         CAST(COUNT(*) AS BIGINT) AS n_errors
  FROM s WHERE event_type = 'error' GROUP BY user_id, grp)
SELECT user_id, start_us, end_us, n_errors
FROM runs WHERE n_errors >= 3
"""


def win_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of ``value`` over the last 5 events per
    user (robust smoother — the median analogue of win_running_sum's
    mean). Spark's ``percentile`` aggregate runs as a true window
    function over the ROWS frame; both engines use the same
    lower+(upper-lower)*frac interpolation on an identically-ordered
    frame (ts, event_id tiebreak — compat rule 7), so the doubles
    match without rounding tricks; r6 only at emission.

    Scale: one hash partition by user_id, per-user sort — the same
    single-shuffle shape as every window op here; the frame holds at
    most 5 values regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med5"),
    )


_MEDIAN_SLIDING_SQL = """
SELECT event_id, user_id,
       round(quantile_cont(value, 0.5)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
FROM events
"""


def win_decline_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style run detection without a pattern engine:
    per customer, the longest streak of consecutive orders (by order
    date) with strictly declining totals — gaps-and-islands via
    lag + running sum, the declarative form of `PATTERN (A B+)` with
    `B.total < PREV(B.total)`.

    Totals compare as exact integer cents, so the strict `<` agrees
    bit-for-bit with the oracle. One window pass + two keyed
    aggregates, all partitioned by custkey — no global shuffle beyond
    the window's hash partition, and map-side combine on both
    groupBys."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.select(
        "o_custkey", "o_orderdate", "o_orderkey", cents.alias("cents")
    ).select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.when(
            F.lag("cents").over(w).isNotNull()
            & (F.col("cents") < F.lag("cents").over(w)),
            1,
        )
        .otherwise(0)
        .alias("decline"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum(1 - F.col("decline")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_island = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return (
        per_island.groupBy("o_custkey")
        .agg(
            F.sum("run_len").cast("long").alias("n_orders"),
            F.max("run_len").alias("best_streak"),
            (F.sum("run_len") - F.count(F.lit(1))).cast("long").alias(
                "n_declines"
            ),
        )
        .where(F.col("best_streak") >= 3)
    )


_DECLINE_STREAK_SQL = """
WITH f AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CASE WHEN lag(cents) OVER w IS NOT NULL
               AND cents < lag(cents) OVER w THEN 1 ELSE 0 END AS decline
  FROM (SELECT o_custkey, o_orderdate, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders)
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
i AS (
  SELECT o_custkey,
         SUM(1 - decline) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS island
  FROM f),
runs AS (
  SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM i GROUP BY o_custkey, island),
agg AS (
  SELECT o_custkey,
         CAST(SUM(run_len) AS BIGINT) AS n_orders,
         MAX(run_len) AS best_streak,
         CAST(SUM(run_len) - COUNT(*) AS BIGINT) AS n_declines
  FROM runs GROUP BY o_custkey)
SELECT * FROM agg WHERE best_streak >= 3
"""



def win_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per market segment: the BI
    staple. Aggregate-then-window: the lag runs over the tiny
    (segment, month) aggregate, never the fact table; cents stay
    exact integers and the percent change is one double division
    rounded at emission. First month per segment emits NULL pct."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .select("c_mktsegment", ym.alias("ym"), cents.alias("cents"))
        .groupBy("c_mktsegment", "ym")
        .agg(F.sum("cents").cast("long").alias("rev_c"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("ym")
    prev = F.lag("rev_c").over(w)
    return per.select(
        "c_mktsegment",
        "ym",
        "rev_c",
        F.round(
            (F.col("rev_c") - prev).cast("double") / prev.cast("double")
            * 100.0,
            6,
        ).alias("mom_pct"),
    )


_MOM_SQL = """
WITH per AS (
  SELECT c.c_mktsegment,
         CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
           AS ym,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2)
SELECT c_mktsegment, ym, rev_c,
       round(CAST(rev_c - lag(rev_c) OVER w AS DOUBLE)
             / CAST(lag(rev_c) OVER w AS DOUBLE) * 100.0, 6) AS mom_pct
FROM per
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY ym)
"""


def win_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding DISTINCT count — per event, how many distinct event
    types its user produced in the trailing hour (behavioral-diversity
    signal). Distinct aggregates are the window case engines punt on:
    Spark expresses it directly as size(collect_set()) over a RANGE
    frame (one shuffle on user_id, frame evaluated in-sort); DuckDB
    has no DISTINCT-over-window, so the oracle states the same
    semantics as a range self-join — also documenting what the
    operator replaces at 100 TB (an events x events time-range join).
    The set stays bounded (|event types| = 5), so the frame state is
    O(1) per row."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    hour_us = 3600 * 1000 * 1000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us + 1, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("n_types_1h"),
    )


def _win_distinct_sliding_sql() -> str:
    return f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, {epoch_us_sql('ts')} AS ts_us
  FROM events)
SELECT e.event_id, e.user_id,
       (SELECT COUNT(DISTINCT f.event_type) FROM ev f
        WHERE f.user_id = e.user_id
          AND f.ts_us > e.ts_us - {3600 * 1000 * 1000}
          AND f.ts_us <= e.ts_us) AS n_types_1h
FROM ev e
"""


QUERIES = {
    "win_distinct_sliding": win_distinct_sliding,
    "win_mom_change": win_mom_change,
    "win_decline_streak": win_decline_streak,
    "win_median_sliding": win_median_sliding,
    "win_nth_value": win_nth_value,
    "win_error_burst": win_error_burst,
    "win_rank_dense": win_rank_dense,
    "win_cume_dist": win_cume_dist,
    "win_topk_per_group": win_topk_per_group,
    "win_lag_lead": win_lag_lead,
    "win_running_sum": win_running_sum,
    "win_sliding_range": win_sliding_range,
    "win_ntile_percent": win_ntile_percent,
    "win_first_last": win_first_last,
}

ORACLE = {
    "win_distinct_sliding": _win_distinct_sliding_sql(),
    "win_mom_change": _MOM_SQL,
    "win_decline_streak": _DECLINE_STREAK_SQL,
    "win_median_sliding": _MEDIAN_SLIDING_SQL,
    "win_nth_value": _NTH_VALUE_SQL,
    "win_error_burst": _ERROR_BURST_SQL,
    "win_rank_dense": _RANK_SQL,
    "win_cume_dist": _CUME_SQL,
    "win_topk_per_group": _TOPK_GROUP_SQL,
    "win_lag_lead": _LAG_LEAD_SQL,
    "win_running_sum": _RUNNING_SUM_SQL,
    "win_sliding_range": _SLIDING_SQL,
    "win_ntile_percent": _NTILE_SQL,
    "win_first_last": _FIRST_LAST_SQL,
}


# ---------------------------------------------------------------------------
# Sequential pattern detection (round 4): the MATCH_RECOGNIZE-style
# DOWN{2,} UP{2,} "V-shape" over a monthly series, expressed with
# windows + gaps-and-islands (Spark has no MATCH_RECOGNIZE; this is
# the composition an engine would lower it to).


def win_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-shaped dips in monthly order volume per order priority: a run
    of >= 2 strictly-down months hitting a bottom followed by a run of
    >= 2 strictly-up months. Emits one row per detected bottom with
    the run lengths and the peak-to-trough depth.

    Mechanics: month diffs -> sign column -> islands of constant sign
    via the row_number-difference trick -> a V bottom is the LAST row
    of a down-island of length >= 2 whose NEXT island is an up-island
    of length >= 2. The series values are exact BIGINT counts, so every
    comparison and depth is integer arithmetic — no float ties. Scale:
    the aggregate collapses to (priority x month) cardinality before
    any window runs; the windows then partition by priority (5 series),
    so the expensive part is the one groupBy shuffle of the orders
    scan."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mon"),
    ).agg(bcount().alias("val"))
    by_mon = Window.partitionBy("series").orderBy("mon")
    d = monthly.withColumn("lv", F.lag("val").over(by_mon)).withColumn(
        "sign",
        F.when(F.col("val") < F.col("lv"), -1)
        .when(F.col("val") > F.col("lv"), 1)
        .otherwise(0),
    ).where(F.col("lv").isNotNull())
    d = d.withColumn("rn", F.row_number().over(by_mon)).withColumn(
        "rs", F.row_number().over(Window.partitionBy("series", "sign").orderBy("mon"))
    ).withColumn("grp", F.col("rn") - F.col("rs"))
    isl = Window.partitionBy("series", "sign", "grp")
    d = (
        d.withColumn("run_len", F.count(F.lit(1)).over(isl))
        .withColumn(
            "pos_in_run", F.row_number().over(isl.orderBy("mon"))
        )
        .withColumn("peak", F.first("lv").over(isl.orderBy("mon")))
    )
    d = d.withColumn("next_sign", F.lead("sign").over(by_mon)).withColumn(
        "next_run", F.lead("run_len").over(by_mon)
    )
    return d.where(
        (F.col("sign") == -1)
        & (F.col("pos_in_run") == F.col("run_len"))
        & (F.col("run_len") >= 2)
        & (F.col("next_sign") == 1)
        & (F.col("next_run") >= 2)
    ).select(
        "series",
        F.col("mon").cast("string").alias("bottom_month"),
        F.col("run_len").cast("long").alias("down_len"),
        F.col("next_run").cast("long").alias("up_len"),
        (F.col("peak") - F.col("val")).cast("long").alias("depth"),
        F.col("val").cast("long").alias("bottom_val"),
    )


_VSHAPE_SQL = """
WITH monthly AS (
  SELECT o_orderpriority AS series,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
         CAST(COUNT(*) AS BIGINT) AS val
  FROM orders GROUP BY 1, 2),
d0 AS (
  SELECT *, lag(val) OVER (PARTITION BY series ORDER BY mon) AS lv
  FROM monthly),
d1 AS (
  SELECT *, CASE WHEN val < lv THEN -1 WHEN val > lv THEN 1 ELSE 0 END AS sign
  FROM d0 WHERE lv IS NOT NULL),
d2 AS (
  SELECT *,
         row_number() OVER (PARTITION BY series ORDER BY mon)
           - row_number() OVER (PARTITION BY series, sign ORDER BY mon) AS grp
  FROM d1),
d3 AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY series, sign, grp) AS run_len,
         row_number() OVER (PARTITION BY series, sign, grp ORDER BY mon)
           AS pos_in_run,
         first_value(lv) OVER (PARTITION BY series, sign, grp ORDER BY mon)
           AS peak
  FROM d2),
d4 AS (
  SELECT *,
         lead(sign) OVER (PARTITION BY series ORDER BY mon) AS next_sign,
         lead(run_len) OVER (PARTITION BY series ORDER BY mon) AS next_run
  FROM d3)
SELECT series, CAST(mon AS VARCHAR) AS bottom_month,
       CAST(run_len AS BIGINT) AS down_len,
       CAST(next_run AS BIGINT) AS up_len,
       CAST(peak - val AS BIGINT) AS depth,
       CAST(val AS BIGINT) AS bottom_val
FROM d4
WHERE sign = -1 AND pos_in_run = run_len AND run_len >= 2
  AND next_sign = 1 AND next_run >= 2
"""

QUERIES["win_pattern_vshape"] = win_pattern_vshape
ORACLE["win_pattern_vshape"] = _VSHAPE_SQL


# ---------------------------------------------------------------------------
# Maximum drawdown (round 5): the classic risk analytic — per user,
# the deepest peak-to-trough fall of the cumulative value series.
# Everything up to the final display cast runs in DECIMAL(30,6):
# cumulative sum, running peak, and drawdown are all EXACT (order
# independent, no float accumulation), so the oracle hash-matches
# without rounding tricks. One shuffle on user_id, two window passes
# over the same partitioning.


def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(30,6)"
    cum = F.sum(F.col("value").cast(dec)).over(w)
    series = ev.select("user_id", "ts", "event_id", cum.alias("cum"))
    peak = F.max("cum").over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = series.select(
        "user_id", "cum", peak.alias("peak"), (peak - F.col("cum")).alias("dd")
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("peak").cast("double").alias("peak_value"),
        F.max("dd").cast("double").alias("max_drawdown"),
    )


_DRAWDOWN_SQL = """
WITH c AS (
  SELECT user_id, ts, event_id,
         SUM(CAST(value AS DECIMAL(30,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM events),
p AS (
  SELECT user_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM c)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(peak) AS DOUBLE) AS peak_value,
       CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown
FROM p
GROUP BY user_id
"""

QUERIES["win_drawdown"] = win_drawdown
ORACLE["win_drawdown"] = _DRAWDOWN_SQL


def win_reset_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer that RESETS at every URGENT order —
    the conditional-reset cumulative pattern (budget refills, counter
    resets, post-incident accumulation) expressed with the
    gaps-and-islands rewrite: the reset marker's running count defines
    the island, and the DECIMAL running sum restarts per island.

    Shape: both windows share ONE (customer)-keyed sort — Catalyst
    collapses them into a single Window node over the same exchange —
    and the DECIMAL frame keeps the cumulative exact (compat rule 1).
    """
    o = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marked = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("is_reset"),
    ).withColumn(
        "grp",
        F.sum("is_reset").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wg = Window.partitionBy("o_custkey", "grp").orderBy(
        "o_orderdate", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    return marked.select(
        "o_custkey",
        "o_orderkey",
        "grp",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(wg)
        .cast("double")
        .alias("run_rev"),
    ).orderBy("o_custkey", "o_orderkey")


_WIN_RESET_SQL = """
WITH marked AS (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_reset
  FROM orders),
grp AS (
  SELECT *, SUM(is_reset) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM marked)
SELECT o_custkey, o_orderkey, CAST(grp AS BIGINT) AS grp,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
            OVER (PARTITION BY o_custkey, grp
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS run_rev
FROM grp
ORDER BY o_custkey, o_orderkey
"""

QUERIES["win_reset_running_sum"] = win_reset_running_sum
ORACLE["win_reset_running_sum"] = _WIN_RESET_SQL


_IM_HOLD = 7  # days each order keeps a hold open


def win_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per customer: each order opens a 7-day hold
    [day, day+7); overlapping holds merge into maximal islands via the
    classic rewrite — a new island starts where the interval's start
    exceeds the running max of all previous ends. Emits per customer:
    island count and total distinct covered days — the 'how much
    calendar does this account actually occupy' primitive
    (entitlements, on-call coverage, lock windows).

    Exact integer day arithmetic; both windows (running max, island
    id) share one customer-keyed sort. Island totals are
    sum(island_end_max - island_start) over a per-island aggregate.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (epoch_us("o_orderdate") / F.lit(86_400_000_000)).cast("long").alias("s"),
    )
    iv = o.select(
        "o_custkey", "s", (F.col("s") + _IM_HOLD).alias("e")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    marked = iv.withColumn(
        "prev_max_e", F.max("e").over(wprev)
    ).withColumn(
        "new_island",
        (F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))).cast(
            "long"
        ),
    )
    grp = marked.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = grp.groupBy("o_custkey", "island").agg(
        F.min("s").alias("is_s"), F.max("e").alias("is_e")
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            bcount().alias("n_islands"),
            F.sum(F.col("is_e") - F.col("is_s")).cast("long").alias("covered_days"),
        )
        .orderBy("o_custkey")
    )


_INTERVAL_MERGE_SQL = f"""
WITH iv AS (
  SELECT DISTINCT o_custkey,
         {epoch_us_sql('o_orderdate')} // 86400000000 AS s,
         {epoch_us_sql('o_orderdate')} // 86400000000 + {_IM_HOLD} AS e
  FROM orders),
marked AS (
  SELECT *,
         MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
  FROM iv),
grp AS (
  SELECT *,
         SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY o_custkey ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked),
islands AS (
  SELECT o_custkey, island, MIN(s) AS is_s, MAX(e) AS is_e
  FROM grp GROUP BY 1, 2)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(is_e - is_s) AS BIGINT) AS covered_days
FROM islands
GROUP BY o_custkey
ORDER BY o_custkey
"""

QUERIES["win_interval_merge"] = win_interval_merge
ORACLE["win_interval_merge"] = _INTERVAL_MERGE_SQL


# -- sequence-pattern matching (round 6) ------------------------------------


def win_pattern_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching, Spark-first:
    each user's event-type history becomes one ordered character
    string (v=view c=click p=purchase s=signup e=error), and the
    funnel pattern ``vc*p`` (view, any clicks, purchase) is counted
    with non-overlapping greedy regex semantics — identical in Java
    regex and RE2. Emits per user the match count, the longest
    click-run inside any match, and the sequence length.

    Determinism: ordering is (µs-truncated ts, event_id) on BOTH
    engines (compat rule 4 — DuckDB must CAST its ns timestamps to µs
    or sub-µs ties would order differently). Scale: one shuffle to
    the user key, sequence built by array_sort over the collected
    struct — per-user history strings are KBs; the regex pass is
    map-only codegen. At 100 TB you'd cap per-user history length at
    collect time (slice) — the pattern score only needs the window
    that business logic defines, never the unbounded tail."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("h")
        )
        .select(
            "user_id",
            F.concat_ws(
                "",
                F.transform(
                    "h", lambda s: F.substring(s["event_type"], 1, 1)
                ),
            ).alias("seq"),
        )
    )
    matches = F.regexp_extract_all("seq", F.lit("vc*p"), 0)
    return seq.select(
        "user_id",
        F.regexp_count("seq", F.lit("vc*p")).cast("long").alias("n_funnels"),
        F.coalesce(
            F.array_max(F.transform(matches, lambda m: F.length(m) - 2)),
            F.lit(0),
        ).cast("long").alias("max_clicks_in_funnel"),
        F.length("seq").cast("long").alias("seq_len"),
    )


_PATTERN_FUNNEL_SQL = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), ''
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels,
       CAST(COALESCE(list_max(list_transform(
              regexp_extract_all(seq, 'vc*p'), m -> length(m) - 2)), 0)
            AS BIGINT) AS max_clicks_in_funnel,
       CAST(length(seq) AS BIGINT) AS seq_len
FROM seqs
"""

QUERIES["win_pattern_funnel_regex"] = win_pattern_funnel_regex
ORACLE["win_pattern_funnel_regex"] = _PATTERN_FUNNEL_SQL
