"""Customer-360 feature engineering (SURVEY.md §2.8).

This is the engine's reason to exist: the reference solution
(Azure/cortana-intelligence-customer360 - a Cortana Intelligence
solution template wiring ADF + HDInsight Hive/Spark + SQL DW; local
checkout empty, SURVEY.md §0) computes per-customer rolling-window
activity aggregates from clickstream/purchase archives and joins them
with the referential profile into one wide "Customer 360" row per
customer. Re-expressed here as declarative DataFrame plans:

- feat_rfm            recency/frequency/monetary from orders
- feat_window_counts  multi-horizon (1d/7d/30d) activity aggregates
- feat_category_mix   per-category activity share vector
- feat_sessionize     gap-based sessionization (30-min inactivity)
- feat_profile_join   the flagship wide enriched-profile table

Scale notes (100 TB posture): every feature block aggregates FIRST
(shuffle moves one row per user, not per event) and joins SECOND; all
joins key on the same customer key so AQE can reuse the exchange;
the nation dim is broadcast. No Python UDFs anywhere - whole-stage
codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount, davg, davg_sql, dsum, dsum_sql, dsum_where_sql, epoch_us, epoch_us_sql
from ..operators.aggregates import event_type_pivot, pivot_oracle_sql
from ..sources.tables import EVENT_TYPES, load_table

# Feature anchors (FIXTURES.md): orders span [1995-01-01, 2001-08-01],
# events span [2024-01-01, 2024-01-31).
ORDERS_ANCHOR = "2001-08-01"
EVENTS_ANCHOR = "2024-01-31 00:00:00"
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-min inactivity gap, µs


def rfm_frame(orders: DataFrame) -> DataFrame:
    """Recency (days since last order at anchor) / Frequency / Monetary."""
    return orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(ORDERS_ANCHOR).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        )
        .cast("long")
        .alias("recency_days"),
        bcount().alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )


def feat_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_frame(load_table(spark, sf_dir, "orders"))


_RFM_SQL = f"""
SELECT o_custkey,
       CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '{ORDERS_ANCHOR}') AS BIGINT)
         AS recency_days,
       CAST(COUNT(*) AS BIGINT) AS frequency,
       {dsum_sql('o_totalprice')} AS monetary
FROM orders GROUP BY o_custkey
"""


_RFM_SEGMENT_LABELS = {
    # (r_hi, f_hi, m_hi): quintile >= 4 counts as "high" on that axis
    (True, True, True): "champion",
    (True, True, False): "loyal",
    (True, False, True): "big_spender",
    (True, False, False): "promising",
    (False, True, True): "at_risk_valuable",
    (False, True, False): "at_risk",
    (False, False, True): "cant_lose",
    (False, False, False): "hibernating",
}


def feat_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the Customer-360 deliverable the reference
    solution actually shipped to marketers: quintile-score each RFM
    axis, then map (high-R, high-F, high-M) octants to named segments
    (champion / at-risk / hibernating ...). Recency quintile 5 = most
    RECENT (smallest recency_days), so all three axes point the same
    way.

    The quintiles ride ntile(5) over the customer-cardinality RFM
    aggregate (tiny vs the fact tables; three window passes over one
    frame), with custkey tiebreaks so the cut points are deterministic
    cross-engine."""
    rfm = rfm_frame(load_table(spark, sf_dir, "orders"))
    wr = Window.orderBy(F.col("recency_days").desc(), F.col("o_custkey"))
    wf = Window.orderBy(F.col("frequency").asc(), F.col("o_custkey"))
    wm = Window.orderBy(F.col("monetary").asc(), F.col("o_custkey"))
    scored = rfm.select(
        "o_custkey",
        F.ntile(5).over(wr).cast("long").alias("r_score"),
        F.ntile(5).over(wf).cast("long").alias("f_score"),
        F.ntile(5).over(wm).cast("long").alias("m_score"),
    )
    label = None
    for (r_hi, f_hi, m_hi), name in _RFM_SEGMENT_LABELS.items():
        cond = (
            ((F.col("r_score") >= 4) == F.lit(r_hi))
            & ((F.col("f_score") >= 4) == F.lit(f_hi))
            & ((F.col("m_score") >= 4) == F.lit(m_hi))
        )
        label = F.when(cond, name) if label is None else label.when(cond, name)
    return scored.select("o_custkey", "r_score", "f_score", "m_score", label.alias("segment"))


def _rfm_segments_sql() -> str:
    cases = " ".join(
        f"WHEN (r_score >= 4) = {str(r).upper()} AND (f_score >= 4) = {str(f).upper()} "
        f"AND (m_score >= 4) = {str(m).upper()} THEN '{name}'"
        for (r, f, m), name in _RFM_SEGMENT_LABELS.items()
    )
    return f"""
WITH rfm AS ({_RFM_SQL}),
scored AS (
  SELECT o_custkey,
         CAST(NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT)
           AS r_score,
         CAST(NTILE(5) OVER (ORDER BY frequency ASC, o_custkey) AS BIGINT)
           AS f_score,
         CAST(NTILE(5) OVER (ORDER BY monetary ASC, o_custkey) AS BIGINT)
           AS m_score
  FROM rfm)
SELECT o_custkey, r_score, f_score, m_score,
       CASE {cases} END AS segment
FROM scored
"""


def feat_purchase_gap_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label construction: for every purchase event, the
    time until the user's NEXT purchase (the churn/repeat-purchase
    regression target) plus a 7-day repeat flag; the user's final
    purchase gets NULL gap and flag 0 (right-censored — the label a
    leakage-safe trainer wants). One lead() over the purchase substream
    — filter BEFORE the window, so the shuffle carries only purchases."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(w)
    gap = nxt - F.col("ts_us")
    return purchases.select(
        "event_id",
        "user_id",
        "ts_us",
        gap.alias("gap_us"),
        F.when(gap <= 7 * 86_400_000_000, 1).otherwise(0).cast("long").alias(
            "repeat_7d"
        ),
    )


_PURCHASE_GAP_SQL = f"""
WITH p AS (
  SELECT user_id, event_id, {epoch_us_sql('ts')} AS ts_us
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT event_id, user_id, ts_us,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - ts_us AS gap_us
  FROM p)
SELECT event_id, user_id, ts_us, gap_us,
       CAST(CASE WHEN gap_us <= {7 * 86_400_000_000} THEN 1 ELSE 0 END AS BIGINT)
         AS repeat_7d
FROM g
"""


def feat_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon trailing-window activity (1d/7d/30d as of anchor).

    Batch form of the reference's rolling-window browsing aggregates:
    one scan, conditional aggregates per horizon - NOT three self-joins.
    At 100 TB this is the difference between one shuffle and three."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit(EVENTS_ANCHOR).cast("timestamp")
    out_cols = []
    for days in (1, 7, 30):
        in_win = (F.col("ts") >= anchor - F.expr(f"INTERVAL {days} DAYS")) & (
            F.col("ts") < anchor
        )
        out_cols.append(
            F.count(F.when(in_win, 1)).cast("long").alias(f"n_{days}d")
        )
        out_cols.append(
            F.coalesce(dsum(F.when(in_win, F.col("value"))), F.lit(0.0)).alias(
                f"v_{days}d"
            )
        )
    return ev.groupBy("user_id").agg(*out_cols)


def _window_counts_sql() -> str:
    parts = []
    for days in (1, 7, 30):
        cond = (
            f"ts >= TIMESTAMP '{EVENTS_ANCHOR}' - INTERVAL {days} DAY "
            f"AND ts < TIMESTAMP '{EVENTS_ANCHOR}'"
        )
        parts.append(f"CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT) AS n_{days}d")
        parts.append(f"{dsum_where_sql('value', cond)} AS v_{days}d")
    cols = ",\n       ".join(parts)
    return f"SELECT user_id,\n       {cols}\nFROM events GROUP BY user_id"


DECAY_PER_DAY = 0.1


def feat_decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per user: each event
    contributes value * exp(-0.1 * days_before_anchor) - recency-
    weighted activity in one scan + one aggregate shuffle (the feature
    stores' alternative to maintaining many trailing windows)."""
    ev = load_table(spark, sf_dir, "events")
    anchor_us = F.unix_micros(F.lit(EVENTS_ANCHOR).cast("timestamp"))
    days_ago = (anchor_us - epoch_us("ts")).cast("double") / 86_400_000_000.0
    weighted = F.col("value") * F.exp(-F.lit(DECAY_PER_DAY) * days_ago)
    return ev.groupBy("user_id").agg(
        dsum(weighted).alias("decay_score"),
        bcount().alias("n_events"),
    )


_DECAY_SQL = f"""
SELECT user_id,
       {dsum_sql(
           "value * exp(-" + str(DECAY_PER_DAY) + " * "
           "CAST(epoch_us(TIMESTAMP '" + EVENTS_ANCHOR + "') - epoch_us(ts) AS DOUBLE)"
           " / 86400000000.0)"
       )} AS decay_score,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def feat_category_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-event_type activity share (category-affinity vector).

    groupBy first (events -> one row per user×type), then a window over
    the tiny aggregate - the window shuffle sees ≤5 rows per user."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(bcount().alias("n"))
    w = Window.partitionBy("user_id")
    return counts.select(
        "user_id",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias("share"),
    )


_CATEGORY_MIX_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type)
SELECT user_id, event_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY user_id) AS DOUBLE) AS share
FROM c
"""


def sessionized(events: DataFrame) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    since the user's previous event exceeds 30 minutes (strict >).

    Classic two-window plan: lag to flag session starts, running sum of
    flags to number sessions. One shuffle on user_id; both windows reuse
    the same partitioning. Returns events + (ts_us, session_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = epoch_us("ts")
    gap = ts_us - F.lag(ts_us).over(w)
    is_start = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    return events.withColumn("ts_us", ts_us).withColumn(
        "session_id",
        F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def feat_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats from gap-based sessionization."""
    ev = sessionized(load_table(spark, sf_dir, "events"))
    per_session = ev.groupBy("user_id", "session_id").agg(
        bcount().alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
    )
    return per_session.groupBy("user_id").agg(
        bcount().alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("span_us").cast("long").alias("total_session_us"),
        F.max("span_us").cast("long").alias("max_session_us"),
    )


_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, {epoch_us_sql('ts')} AS ts_us FROM events),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
numbered AS (
  SELECT user_id, ts_us,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(ts_us) - MIN(ts_us) AS span_us
  FROM numbered GROUP BY user_id, session_id)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(span_us) AS BIGINT) AS total_session_us,
       CAST(MAX(span_us) AS BIGINT) AS max_session_us
FROM per_session GROUP BY user_id
"""


def feat_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (cohort), counted by how many distinct users of that cohort were
    active in each subsequent week offset. Two aggregate shuffles, both
    on user-sized data - the standard product-analytics rollup."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    user_weeks = ev.select("user_id", week.alias("week")).distinct()
    first_week = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    joined = user_weeks.join(first_week, "user_id")
    return (
        joined.groupBy(
            epoch_us("cohort").alias("cohort_week_us"),
            F.floor(
                (epoch_us("week") - epoch_us("cohort")) / F.lit(7 * 86_400_000_000)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


_COHORT_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
fw AS (
  SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY user_id)
SELECT CAST(epoch_us(CAST(cohort AS TIMESTAMP)) AS BIGINT) AS cohort_week_us,
       CAST(FLOOR((epoch_us(CAST(week AS TIMESTAMP)) - epoch_us(CAST(cohort AS TIMESTAMP)))
                  / 604800000000.0) AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_active
FROM uw JOIN fw ON uw.user_id = fw.user_id
GROUP BY 1, 2
"""


def profile_frame(
    customer: DataFrame, orders: DataFrame, events: DataFrame, nation: DataFrame
) -> DataFrame:
    """The flagship Customer-360 wide profile: referential attributes +
    RFM + per-category activity counts, one row per customer.

    Join order: aggregate both fact tables down to per-customer rows
    FIRST, then left-join onto the customer spine (both sides already
    keyed/shuffled on the customer key), broadcast the 25-row nation
    dim. 90% of customers have no events; fillna(0) keeps the profile
    dense (FIXTURES.md)."""
    rfm = rfm_frame(orders)
    piv = event_type_pivot(events)
    prof = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(rfm, customer.c_custkey == rfm.o_custkey, "left")
        .join(piv, customer.c_custkey == piv.user_id, "left")
    )
    count_cols = [f"n_{t}" for t in EVENT_TYPES]
    return prof.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        "n_name",
        F.coalesce("recency_days", F.lit(0)).cast("long").alias("recency_days"),
        F.coalesce("frequency", F.lit(0)).cast("long").alias("frequency"),
        F.coalesce("monetary", F.lit(0.0)).alias("monetary"),
        *[F.coalesce(c, F.lit(0)).cast("long").alias(c) for c in count_cols],
    )


def feat_profile_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_frame(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "nation"),
    )


def _profile_join_sql() -> str:
    count_cols = ",\n       ".join(
        f"COALESCE(p.n_{t}, 0) AS n_{t}" for t in EVENT_TYPES
    )
    return f"""
WITH rfm AS ({_RFM_SQL}),
piv AS ({pivot_oracle_sql()})
SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal, n.n_name,
       CAST(COALESCE(r.recency_days, 0) AS BIGINT) AS recency_days,
       CAST(COALESCE(r.frequency, 0) AS BIGINT) AS frequency,
       COALESCE(r.monetary, 0.0) AS monetary,
       {count_cols}
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN rfm r ON c.c_custkey = r.o_custkey
LEFT JOIN piv p ON c.c_custkey = p.user_id
"""


def feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of p_brand against the
    return-probability target (l_returnflag = 'R'): each row's encoding
    is the mean target of all OTHER rows sharing its brand —
    (sum_target - own_target) / (n - 1). The canonical leakage-free
    categorical encoder for training pipelines: one groupBy over the
    fact table, stats broadcast back; the per-row math is exact integer
    arithmetic followed by one IEEE division, so it is bit-identical
    across engines with no rounding discipline needed."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    tgt = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    rows = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", tgt.alias("is_ret")
    )
    stats = rows.groupBy("p_brand").agg(
        F.sum("is_ret").alias("sum_ret"), F.count(F.lit(1)).alias("n")
    )
    enc = F.when(
        F.col("n") > 1,
        (F.col("sum_ret") - F.col("is_ret")).cast("double")
        / (F.col("n") - 1).cast("double"),
    )  # singleton categories have no peers: NULL, imputed downstream
    return rows.join(F.broadcast(stats), "p_brand").select(
        "l_orderkey",
        "l_linenumber",
        "p_brand",
        F.col("is_ret").cast("long").alias("is_ret"),
        enc.alias("brand_ret_loo"),
    )


_TARGET_ENC_SQL = """
WITH rows_t AS (
  SELECT l_orderkey, l_linenumber, p_brand,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_ret
  FROM lineitem JOIN part ON l_partkey = p_partkey),
stats AS (
  SELECT p_brand, SUM(is_ret) AS sum_ret, COUNT(*) AS n
  FROM rows_t GROUP BY 1)
SELECT l_orderkey, l_linenumber, p_brand,
       CAST(is_ret AS BIGINT) AS is_ret,
       CASE WHEN n > 1
            THEN CAST(sum_ret - is_ret AS DOUBLE) / CAST(n - 1 AS DOUBLE)
       END AS brand_ret_loo
FROM rows_t JOIN stats USING (p_brand)
"""


def feat_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hashing the
    stable document key (md5 -> bucket 0..99): reproducible across
    runs, engines and cluster sizes - the property random() sampling
    lacks - and any worker can compute a row's split without
    coordination. Returns per-split per-source counts (the balance
    audit a training pipeline runs on every snapshot)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "source")
        .groupBy("split", "source")
        .agg(bcount().alias("n_docs"))
    )


_TRAIN_SPLIT_SQL = """
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           AS bucket,
         source
  FROM documents)
GROUP BY 1, 2
"""


def feat_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel per user: first 'view', then the first
    'click' AFTER that view, then the first 'purchase' AFTER that
    click. Later stages condition on the previous stage's timestamp, so
    the funnel is three aggregate stages, each a groupBy(user) feeding
    a user-key join — every shuffle is on the same key and carries one
    row per user, not the event stream. depth counts completed stages.

    Timestamps compare in epoch-µs (events.ts is ns-truncated on read
    in both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("depth"),
        )
    )


_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, {epoch_us_sql('ts')} AS ts_us FROM events),
s1 AS (
  SELECT user_id, MIN(ts_us) AS t_view FROM e
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(ts_us) AS t_click
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(ts_us) AS t_purchase
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
SELECT s1.user_id, t_view, t_click, t_purchase,
       CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
              + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS depth
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def feat_activity_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern: an island is a run where day_idx minus
    its per-user row_number is constant. Day indices are integer
    epoch-day quotients, so the whole computation is exact integer
    arithmetic in both engines. Two shuffles: the distinct-days
    aggregation and the per-user window (same user key, so AQE reuses
    the partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day_idx"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = days.withColumn(
        "grp", F.col("day_idx") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "grp").agg(bcount().alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


_STREAK_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST({epoch_us_sql('ts')} // 86400000000 AS BIGINT) AS day_idx
  FROM events),
islands AS (
  SELECT user_id, day_idx,
         day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day_idx) AS grp
  FROM days),
streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM islands GROUP BY user_id, grp)
SELECT user_id, MAX(len) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM streaks GROUP BY user_id
"""


def feat_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for every
    (prev_type -> event_type) bigram in each user's chronological
    stream, the transition count and row-normalized probability — the
    behavioral-model / next-action-prediction primitive.

    Plan: ONE window shuffle keyed on user_id produces the lag pairs,
    then the groupBy reduces to a |types|² frame (25 rows) with map-side
    partials; the per-prev normalization is a window over that tiny
    aggregate, not over the event stream. Ordering ties broken by
    event_id (compat rule 7)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(bcount().alias("n"))
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


_MARKOV_SQL = """
WITH pairs AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
counts AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, event_type, n,
       round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM counts
"""


_N_TOP_PATHS = 20


def feat_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the top-20 most common session
    event-type sequences (e.g. ``view>click>purchase``) across all
    gap-based sessions — the funnel-discovery primitive.

    The per-session path is built with sort_array(collect_list(struct))
    so element order is deterministic (collect_list alone is
    partition-order-dependent); the path table the top-k runs on is
    aggregate-sized. Two shuffles total: user window + path groupBy;
    final rank ties broken by path text (compat rule 7)."""
    ev = sessionized(load_table(spark, sf_dir, "events"))
    paths = (
        ev.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts_us", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(bcount().alias("n_sessions"))
    )
    w = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return (
        paths.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _N_TOP_PATHS)
        .select("rank", "path", "n_sessions")
    )


_SESSION_PATHS_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, {epoch_us_sql('ts')} AS ts_us FROM events),
flagged AS (
  SELECT user_id, ts_us, event_id, event_type,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
numbered AS (
  SELECT user_id, ts_us, event_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM numbered GROUP BY user_id, session_id),
counted AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths GROUP BY path)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS BIGINT)
         AS rank,
       path, n_sessions
FROM counted
QUALIFY rank <= {_N_TOP_PATHS}
"""


# Funnel patterns evaluated against whole-session paths. Kept to
# regex constructs with identical semantics in Java regex and RE2
# (literals, '.', '*', alternation — no backrefs, no lookaround).
_PATH_PATTERNS = [
    ("view_to_purchase", "view.*purchase"),
    ("signup_then_purchase", "signup.*purchase"),
    ("error_retry", "error.*error"),
    ("bounce_click", "^click$"),
]


def feat_path_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex funnels over session paths — the MATCH_RECOGNIZE-lite
    primitive: how many gap-based sessions match each behavioral
    pattern (e.g. "a view eventually followed by a purchase in the
    same session"). The path table is aggregate-sized (one row per
    session); evaluating K patterns is a K-row literal explode against
    it, so the whole op is the sessionize shuffle plus one driver-size
    aggregate."""
    ev = sessionized(load_table(spark, sf_dir, "events"))
    paths = ev.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    pats = F.array(
        *[
            F.struct(F.lit(n).alias("pattern_name"), F.lit(p).alias("pattern"))
            for n, p in _PATH_PATTERNS
        ]
    )
    tagged = paths.select(
        "path", F.explode(pats).alias("p")
    ).select("path", "p.pattern_name", "p.pattern")
    return (
        tagged.groupBy("pattern_name", "pattern")
        .agg(
            bcount().alias("n_sessions"),
            F.sum(
                F.when(F.expr("path rlike pattern"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_matched"),
        )
        .select(
            "pattern_name",
            "pattern",
            "n_sessions",
            "n_matched",
            F.round(F.col("n_matched") / F.col("n_sessions"), 6).alias(
                "match_share"
            ),
        )
    )


def _path_regex_sql() -> str:
    pats = ", ".join(f"('{n}', '{p}')" for n, p in _PATH_PATTERNS)
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, {epoch_us_sql('ts')} AS ts_us FROM events),
flagged AS (
  SELECT user_id, ts_us, event_id, event_type,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
numbered AS (
  SELECT user_id, ts_us, event_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM numbered GROUP BY user_id, session_id),
pat(pattern_name, pattern) AS (VALUES {pats})
SELECT pattern_name, pattern,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN regexp_matches(path, pattern) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       round(SUM(CASE WHEN regexp_matches(path, pattern) THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS match_share
FROM paths, pat
GROUP BY pattern_name, pattern
"""


QUERIES = {
    "feat_path_regex": feat_path_regex,
    "feat_purchase_gap_label": feat_purchase_gap_label,
    "feat_rfm_segments": feat_rfm_segments,
    "feat_session_paths": feat_session_paths,
    "feat_markov_transitions": feat_markov_transitions,
    "feat_funnel_conversion": feat_funnel_conversion,
    "feat_activity_streak": feat_activity_streak,
    "feat_target_encoding": feat_target_encoding,
    "feat_train_test_split": feat_train_test_split,
    "feat_rfm": feat_rfm,
    "feat_window_counts": feat_window_counts,
    "feat_decay_weighted": feat_decay_weighted,
    "feat_cohort_retention": feat_cohort_retention,
    "feat_category_mix": feat_category_mix,
    "feat_sessionize": feat_sessionize,
    "feat_profile_join": feat_profile_join,
}

ORACLE = {
    "feat_purchase_gap_label": _PURCHASE_GAP_SQL,
    "feat_rfm_segments": _rfm_segments_sql(),
    "feat_session_paths": _SESSION_PATHS_SQL,
    "feat_path_regex": _path_regex_sql(),
    "feat_markov_transitions": _MARKOV_SQL,
    "feat_funnel_conversion": _FUNNEL_SQL,
    "feat_activity_streak": _STREAK_SQL,
    "feat_target_encoding": _TARGET_ENC_SQL,
    "feat_train_test_split": _TRAIN_SPLIT_SQL,
    "feat_rfm": _RFM_SQL,
    "feat_window_counts": _window_counts_sql(),
    "feat_decay_weighted": _DECAY_SQL,
    "feat_cohort_retention": _COHORT_SQL,
    "feat_category_mix": _CATEGORY_MIX_SQL,
    "feat_sessionize": _SESSIONIZE_SQL,
    "feat_profile_join": _profile_join_sql(),
}


_STATIONARY_ITERS = 8


def feat_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: 8 power
    iterations pi <- pi P over the row-normalized transition matrix
    from feat_markov_transitions — 'where does a user's behavior
    settle', the long-run companion of the one-step transition view.

    Determinism: transition probabilities quantize to 6 dp (identical
    across engines, proven by the transitions oracle); each iteration
    re-rounds pi to 6 dp and sums the <=5 per-state terms through
    DECIMAL, so the whole recursion is a fixed cascade of exact
    comparisons. All iterations run on the |types|^2 = 25-row frame —
    the single event-scale shuffle is the lag-pair window inside the
    transition matrix build.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(bcount().alias("n"))
    wp = Window.partitionBy("prev_type")
    P = counts.select(
        "prev_type",
        "event_type",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    ).localCheckpoint()  # 25 rows; reused every iteration
    states = P.select(F.col("prev_type").alias("state")).distinct()
    n_states = states.count()  # <= 5, a metadata-scale driver value
    pi = states.select(
        "state", F.round(F.lit(1.0) / F.lit(float(n_states)), 6).alias("pi")
    )
    for _ in range(_STATIONARY_ITERS):
        stepped = (
            pi.join(P, pi.state == P.prev_type)
            .select(
                F.col("event_type").alias("state"),
                (F.col("pi") * F.col("p")).cast("decimal(30,6)").alias("term"),
            )
            .groupBy("state")
            .agg(F.round(F.sum("term").cast("double"), 6).alias("pi"))
        )
        pi = stepped.localCheckpoint()
    return pi.orderBy("state")


def _stationary_sql() -> str:
    base = """
pairs AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
counts AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2),
P AS (
  SELECT prev_type, event_type,
         round(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
  FROM counts),
states AS (SELECT DISTINCT prev_type AS state FROM P),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
pi0 AS (
  SELECT state, round(1.0 / CAST(k AS DOUBLE), 6) AS pi FROM states, nn)"""
    sql = "WITH " + base
    prev = "pi0"
    steps = []
    for i in range(1, _STATIONARY_ITERS + 1):
        steps.append(
            f"""
pi{i} AS (
  SELECT P.event_type AS state,
         round(CAST(SUM(CAST({prev}.pi * P.p AS DECIMAL(30,6))) AS DOUBLE),
               6) AS pi
  FROM {prev} JOIN P ON {prev}.state = P.prev_type
  GROUP BY P.event_type)"""
        )
        prev = f"pi{i}"
    return (
        sql + "," + ",".join(steps)
        + f"\nSELECT state, pi FROM pi{_STATIONARY_ITERS} ORDER BY state"
    )


QUERIES["feat_markov_stationary"] = feat_markov_stationary
ORACLE["feat_markov_stationary"] = _stationary_sql()


_HASH_DIMS = 64
_HASH_DOCS = 50


def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick featurizer (HashingTF): tokens map to a fixed
    64-dim space via a DETERMINISTIC md5 bucket (not Murmur3, whose
    seed/implementation varies across engines) and per-(doc, dim)
    counts form the sparse feature vector — the schema-free text
    featurization step of a training pipeline, emitted for the first
    50 documents so the output is inspection-sized.

    Shape: explode + map-side-combined groupBy; the dim hash is a pure
    per-token expression at scan speed. All integers, exact oracle.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _HASH_DOCS)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    dim = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % _HASH_DIMS
    )
    return (
        docs.select("doc_id", dim.alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(bcount().alias("n"))
        .orderBy("doc_id", "dim")
    )


_HASHING_TRICK_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(str_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < {_HASH_DOCS}),
dims AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_HASH_DIMS} AS dim
  FROM toks WHERE tok <> '')
SELECT doc_id, dim, CAST(COUNT(*) AS BIGINT) AS n
FROM dims GROUP BY doc_id, dim
ORDER BY doc_id, dim
"""

QUERIES["feat_hashing_trick"] = feat_hashing_trick
ORACLE["feat_hashing_trick"] = _HASHING_TRICK_SQL


def ml_ranking_eval_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-metric evaluation harness — MRR, NDCG, hit@1 and hit@3 —
    scoring the global-popularity ranking as a next-event predictor
    over every (prev -> next) transition: the baseline every
    recommender (feat_next_best_offer, feat_item_similarity) must
    beat, and the metric kit used to compare them.

    The predicted list is the event types by global frequency
    (count desc, name asc — deterministic); the 'relevant item' is the
    user's ACTUAL next event. Ranks are small integers, so 1/rank and
    1/log2(rank+1) are deterministic per row and the means go through
    DECIMAL — exact oracle. One user-keyed window for transitions, a
    broadcast 5-row rank join, one global aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    pop = (
        ev.groupBy("event_type")
        .agg(bcount().alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("event_type").asc())
    ranks = pop.select(
        "event_type", F.row_number().over(wr).cast("long").alias("rnk")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .select("next_type")
    )
    scored = nxt.join(
        F.broadcast(ranks), F.col("next_type") == F.col("event_type")
    )
    return scored.agg(
        bcount().alias("n_transitions"),
        F.round(davg(1.0 / F.col("rnk").cast("double")), 6).alias("mrr"),
        F.round(
            davg(F.expr("1.0 / (ln(CAST(rnk AS DOUBLE) + 1.0) / ln(2.0))")), 6
        ).alias("ndcg"),
        F.round(davg((F.col("rnk") == 1).cast("double")), 6).alias("hit1"),
        F.round(davg((F.col("rnk") <= 3).cast("double")), 6).alias("hit3"),
    )


_RANKING_EVAL_SQL = f"""
WITH pop AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
ranks AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, event_type ASC) AS BIGINT)
           AS rnk
  FROM pop),
nxt AS (
  SELECT LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events),
scored AS (
  SELECT r.rnk FROM nxt JOIN ranks r ON nxt.next_type = r.event_type)
SELECT CAST(COUNT(*) AS BIGINT) AS n_transitions,
       round({davg_sql('1.0 / CAST(rnk AS DOUBLE)')}, 6) AS mrr,
       round({davg_sql('1.0 / (ln(CAST(rnk AS DOUBLE) + 1.0) / ln(2.0))')}, 6)
         AS ndcg,
       round({davg_sql('CASE WHEN rnk = 1 THEN 1.0 ELSE 0.0 END')}, 6) AS hit1,
       round({davg_sql('CASE WHEN rnk <= 3 THEN 1.0 ELSE 0.0 END')}, 6) AS hit3
FROM scored
"""

QUERIES["ml_ranking_eval_popularity"] = ml_ranking_eval_popularity
ORACLE["ml_ranking_eval_popularity"] = _RANKING_EVAL_SQL


def feat_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention-decay fit: pooled over cohorts, the
    per-offset retention rate r(k) = active(k)/cohort_size is fit as
    ln r = a + b*k (OLS over offsets >= 1), giving the weekly decay
    rate and the retention HALF-LIFE -ln(2)/b — the single number a
    growth team quotes from the cohort matrix (feat_cohort_retention's
    registered rollup).

    Retention ratios are exact integer quotients rounded 6 dp, ln is
    quantized 6 dp before the OLS sums (libm discipline), and the
    closed-form solve is shared text. All frames are offset-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    user_weeks = ev.select("user_id", week.alias("week")).distinct()
    first_week = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    joined = user_weeks.join(first_week, "user_id").select(
        "cohort",
        (
            F.datediff(F.col("week"), F.col("cohort")) / F.lit(7)
        ).cast("long").alias("k"),
        "user_id",
    )
    sizes = joined.where(F.col("k") == 0).groupBy("cohort").agg(
        bcount().alias("size")
    )
    act = joined.groupBy("cohort", "k").agg(bcount().alias("active"))
    pooled = (
        act.join(sizes, "cohort")
        .groupBy("k")
        .agg(
            F.sum("active").cast("long").alias("a"),
            F.sum("size").cast("long").alias("s"),
        )
        .where(F.col("k") >= 1)
        .select(
            F.col("k").cast("double").alias("x"),
            F.round(
                F.log(
                    F.round(
                        F.expr("CAST(a AS DOUBLE) / CAST(s AS DOUBLE)"), 6
                    )
                ),
                6,
            ).alias("lnr"),
        )
    )
    suff = pooled.agg(
        bcount().alias("n"),
        dsum("x").alias("sx"),
        dsum("lnr").alias("sy"),
        dsum(F.col("x") * F.col("lnr")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    b = (
        "round((CAST(n AS DOUBLE) * sxy - sx * sy)"
        " / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)"
    )
    return suff.select(
        "n",
        F.expr(b).alias("weekly_decay"),
        F.round(
            F.expr(
                f"CASE WHEN {b} < 0.0 THEN -ln(2.0) / {b} END"
            ),
            6,
        ).alias("half_life_weeks"),
    )


_RETENTION_DECAY_SQL = f"""
WITH user_weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
first_week AS (
  SELECT user_id, MIN(week) AS cohort FROM user_weeks GROUP BY 1),
joined AS (
  SELECT f.cohort,
         CAST(date_diff('day', CAST(f.cohort AS DATE), CAST(u.week AS DATE))
              / 7 AS BIGINT) AS k,
         u.user_id
  FROM user_weeks u JOIN first_week f ON u.user_id = f.user_id),
sizes AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS size
  FROM joined WHERE k = 0 GROUP BY 1),
act AS (
  SELECT cohort, k, CAST(COUNT(*) AS BIGINT) AS active
  FROM joined GROUP BY 1, 2),
pooled AS (
  SELECT CAST(k AS DOUBLE) AS x,
         round(ln(round(CAST(SUM(active) AS DOUBLE)
               / CAST(SUM(size) AS DOUBLE), 6)), 6) AS lnr
  FROM act JOIN sizes ON act.cohort = sizes.cohort
  WHERE k >= 1
  GROUP BY k),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('lnr')} AS sy,
         {dsum_sql('x * lnr')} AS sxy, {dsum_sql('x * x')} AS sxx
  FROM pooled)
SELECT n,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS weekly_decay,
       round(CASE WHEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) < 0.0
                  THEN -ln(2.0) / round((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) END, 6)
         AS half_life_weeks
FROM suff
"""

QUERIES["feat_retention_decay_fit"] = feat_retention_decay_fit
ORACLE["feat_retention_decay_fit"] = _RETENTION_DECAY_SQL


def feat_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classified as NEW
    (first week), RETAINED (also active the previous week) or
    RESURRECTED (returning after a gap), plus the week's CHURNED count
    (active last week, absent now) and the quick ratio
    (new + resurrected) / churned — the canonical MAU-accounting
    readout (Social Capital's growth framework).

    One user-keyed lag window over the distinct (user, week) frame
    classifies everything; churn attributes to prev_week + 7 days via
    a shifted projection (no self-join). Exact integers throughout.
    """
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    marked = uw.withColumn("prev", F.lag("week").over(w)).select(
        "user_id",
        "week",
        F.when(F.col("prev").isNull(), "new")
        .when(F.datediff("week", "prev") == 7, "retained")
        .otherwise("resurrected")
        .alias("kind"),
        "prev",
    )
    counts = marked.groupBy("week").agg(
        F.sum((F.col("kind") == "new").cast("long")).cast("long").alias("n_new"),
        F.sum((F.col("kind") == "retained").cast("long"))
        .cast("long")
        .alias("n_retained"),
        F.sum((F.col("kind") == "resurrected").cast("long"))
        .cast("long")
        .alias("n_resurrected"),
    )
    # churned at week w: active at w-7 and NOT active at w = actives(w-7)
    # minus retained(w); actives per week from the same frame
    actives = uw.groupBy("week").agg(bcount().alias("n_active"))
    shifted = actives.select(
        F.date_add("week", 7).alias("week"), F.col("n_active").alias("prev_active")
    )
    out = (
        counts.join(shifted, "week", "left")
        .select(
            F.col("week").cast("string").alias("week"),
            "n_new",
            "n_retained",
            "n_resurrected",
            (
                F.coalesce("prev_active", F.lit(0)) - F.col("n_retained")
            ).cast("long").alias("n_churned"),
        )
        .withColumn(
            "quick_ratio",
            F.when(
                F.col("n_churned") > 0,
                F.round(
                    F.expr(
                        "CAST(n_new + n_resurrected AS DOUBLE)"
                        " / CAST(n_churned AS DOUBLE)"
                    ),
                    6,
                ),
            ),
        )
        .orderBy("week")
    )
    return out


_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events),
marked AS (
  SELECT user_id, week,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN date_diff('day', prev, week) = 7 THEN 'retained'
              ELSE 'resurrected' END AS kind
  FROM (SELECT user_id, week,
               LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
        FROM uw)),
counts AS (
  SELECT week,
         CAST(SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected
  FROM marked GROUP BY week),
actives AS (
  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active FROM uw GROUP BY week),
shifted AS (
  SELECT week + INTERVAL 7 DAY AS week, n_active AS prev_active FROM actives)
SELECT CAST(c.week AS VARCHAR) AS week, c.n_new, c.n_retained,
       c.n_resurrected,
       CAST(COALESCE(s.prev_active, 0) - c.n_retained AS BIGINT) AS n_churned,
       CASE WHEN COALESCE(s.prev_active, 0) - c.n_retained > 0
            THEN round(CAST(c.n_new + c.n_resurrected AS DOUBLE)
                 / CAST(COALESCE(s.prev_active, 0) - c.n_retained AS DOUBLE), 6)
       END AS quick_ratio
FROM counts c LEFT JOIN shifted s ON c.week = CAST(s.week AS DATE)
ORDER BY week
"""

QUERIES["feat_growth_accounting"] = feat_growth_accounting
ORACLE["feat_growth_accounting"] = _GROWTH_SQL


def feat_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month: average daily active users
    divided by the month's distinct actives — 'how many of the
    monthly users show up on a typical day', the habit-strength
    metric next to feat_growth_accounting's flow view.

    Two distinct-count collapses of the same (user, day) frame
    (day level and month level); the ratio is an exact-integer
    quotient rounded 6 dp.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
    ).distinct()
    dau = ud.groupBy("month", "day").agg(bcount().alias("dau"))
    mau = ud.select("month", "user_id").distinct().groupBy("month").agg(
        bcount().alias("mau")
    )
    per_month = dau.groupBy("month").agg(
        F.sum("dau").cast("long").alias("sum_dau"),
        bcount().alias("n_days"),
    )
    return (
        per_month.join(mau, "month")
        .select(
            F.col("month").cast("string").alias("month"),
            "n_days",
            "mau",
            F.round(
                F.expr(
                    "CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE)"
                    " / CAST(mau AS DOUBLE)"
                ),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


_DAU_MAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(date_trunc('month', ts) AS DATE) AS month
  FROM events),
dau AS (
  SELECT month, day, CAST(COUNT(*) AS BIGINT) AS dau
  FROM ud GROUP BY 1, 2),
mau AS (
  SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM ud GROUP BY 1),
per_month AS (
  SELECT month, CAST(SUM(dau) AS BIGINT) AS sum_dau,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dau GROUP BY 1)
SELECT CAST(p.month AS VARCHAR) AS month, p.n_days, m.mau,
       round(CAST(p.sum_dau AS DOUBLE) / CAST(p.n_days AS DOUBLE)
             / CAST(m.mau AS DOUBLE), 6) AS stickiness
FROM per_month p JOIN mau m ON p.month = m.month
ORDER BY month
"""

QUERIES["feat_dau_mau_stickiness"] = feat_dau_mau_stickiness
ORACLE["feat_dau_mau_stickiness"] = _DAU_MAU_SQL
