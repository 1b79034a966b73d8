"""Marketing attribution & churn labeling (Customer-360 analytics).

The reference solution (Azure/cortana-intelligence-customer360 — local
checkout empty, SURVEY.md §0; SURVEY §2.8 is the normative inventory)
targets exactly this consumer: a marketer deciding which channel gets
credit for a conversion and which customers are about to churn. Three
operators:

- feat_attribution_touch   first- and last-touch channel attribution
                           for every purchase event
- feat_churn_label         observation/label-period split with
                           leakage-safe churn flag per active user
- feat_audience_overlap    audience co-membership (Jaccard) between
                           event-type segments

Scale notes (100 TB posture): attribution is ONE window shuffle on
user_id (the same exchange every session/feature op uses — AQE reuses
it); both attribution aggregates shrink to <= |event_type| rows before
the final outer join, so the join is driver-trivial. Churn labeling is
a single conditional-aggregate scan (no self-join between observation
and label periods). Audience overlap self-joins the DISTINCT
(user, type) table — bounded at |users| x |event_types| rows, and each
user contributes at most C(5,2) = 10 pairs, so the output is linear in
users with a constant factor, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount, dsum, dsum_sql, dsum_where_sql, epoch_us, epoch_us_sql
from ..sources.tables import load_table
from .core import ORDERS_ANCHOR

# Events span [2024-01-01, 2024-01-31) (FIXTURES.md). The churn split
# gives a 23-day observation window and a 7-day label window.
CHURN_SPLIT = "2024-01-24 00:00:00"


def feat_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch attribution per channel.

    For every ``purchase`` event, the *last-touch* channel is the
    event_type of the most recent STRICTLY-earlier non-purchase event
    by the same user, and the *first-touch* channel is their earliest
    non-purchase event ever before the purchase; purchases with no
    prior touch attribute to ``direct``. One window pass (frame ends at
    -1 row, so a purchase never attributes to itself), then two
    channel-level aggregates outer-joined — the classic multi-touch
    attribution report in one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        epoch_us("ts").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    purchases = (
        ev.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .withColumn("first_touch", F.first(touch, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
            F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
            "value",
        )
    )
    # Unpivot (kind, channel) so ONE pass over the window output feeds
    # a single channel-keyed aggregate — the window is computed once
    # and there is no aggregate-vs-aggregate join at all (plan audit:
    # 5 exchanges + SortMergeJoin in the two-aggregate form, 3 and no
    # join here).
    long = purchases.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("last").alias("kind"),
                    F.col("last_touch").alias("channel"),
                    F.col("value"),
                ),
                F.struct(
                    F.lit("first").alias("kind"),
                    F.col("first_touch").alias("channel"),
                    F.col("value"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    is_last = F.col("kind") == "last"
    return (
        long.groupBy("channel")
        .agg(
            F.count(F.when(is_last, 1)).cast("long").alias("n_last_touch"),
            F.coalesce(dsum(F.when(is_last, F.col("value"))), F.lit(0.0)).alias(
                "rev_last_touch"
            ),
            F.count(F.when(~is_last, 1)).cast("long").alias("n_first_touch"),
            F.coalesce(dsum(F.when(~is_last, F.col("value"))), F.lit(0.0)).alias(
                "rev_first_touch"
            ),
        )
        .orderBy("channel")
    )


_ATTRIBUTION_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, value,
         {epoch_us_sql('ts')} AS ts_us
  FROM events),
touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS last_touch,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS) OVER w AS first_touch
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
p AS (
  SELECT COALESCE(last_touch, 'direct') AS last_touch,
         COALESCE(first_touch, 'direct') AS first_touch, value
  FROM touched WHERE event_type = 'purchase'),
la AS (
  SELECT last_touch AS channel, CAST(COUNT(*) AS BIGINT) AS n_last_touch,
         {dsum_sql('value')} AS rev_last_touch
  FROM p GROUP BY 1),
fa AS (
  SELECT first_touch AS channel, CAST(COUNT(*) AS BIGINT) AS n_first_touch,
         {dsum_sql('value')} AS rev_first_touch
  FROM p GROUP BY 1)
SELECT COALESCE(la.channel, fa.channel) AS channel,
       CAST(COALESCE(n_last_touch, 0) AS BIGINT) AS n_last_touch,
       COALESCE(rev_last_touch, 0.0) AS rev_last_touch,
       CAST(COALESCE(n_first_touch, 0) AS BIGINT) AS n_first_touch,
       COALESCE(rev_first_touch, 0.0) AS rev_first_touch
FROM la FULL OUTER JOIN fa ON la.channel = fa.channel
ORDER BY channel
"""


def feat_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn label + observation-period features.

    Events before ``CHURN_SPLIT`` are the observation window (features
    may only read these); events at/after it are the label window.
    ``churned = 1`` iff a user active in observation has ZERO label-
    window events. One conditional-aggregate scan — the observation/
    label split never becomes a self-join, so at 100 TB this costs
    exactly one shuffle of one row per user.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(CHURN_SPLIT).cast("timestamp")
    obs = F.col("ts") < split
    out = ev.groupBy("user_id").agg(
        F.count(F.when(obs, 1)).cast("long").alias("n_obs"),
        F.count(F.when(obs & (F.col("event_type") == "purchase"), 1))
        .cast("long")
        .alias("n_purchases_obs"),
        F.coalesce(dsum(F.when(obs, F.col("value"))), F.lit(0.0)).alias("v_obs"),
        F.countDistinct(F.when(obs, F.col("ts").cast("date"))).cast("long").alias(
            "active_days_obs"
        ),
        F.max(F.when(obs, epoch_us("ts"))).alias("last_seen_us"),
        F.when(F.count(F.when(~obs, 1)) == 0, 1).otherwise(0).cast("long").alias(
            "churned"
        ),
    )
    return out.where(F.col("n_obs") > 0)


def _churn_sql() -> str:
    cond = f"ts < TIMESTAMP '{CHURN_SPLIT}'"
    return f"""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT) AS n_obs,
       CAST(COUNT(*) FILTER (WHERE {cond} AND event_type = 'purchase') AS BIGINT)
         AS n_purchases_obs,
       {dsum_where_sql('value', cond)} AS v_obs,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) FILTER (WHERE {cond}) AS BIGINT)
         AS active_days_obs,
       MAX(CASE WHEN {cond} THEN {epoch_us_sql('ts')} END) AS last_seen_us,
       CAST(CASE WHEN COUNT(*) FILTER (WHERE NOT ({cond})) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS churned
FROM events
GROUP BY user_id
HAVING COUNT(*) FILTER (WHERE {cond}) > 0
"""


def feat_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event-type segments.

    For every unordered pair of event types (a < b): how many users did
    BOTH, and the Jaccard overlap of the two audiences. The self-join
    runs on the DISTINCT (user_id, event_type) table — |users| x 5 rows
    — and is keyed on user_id, so each user expands to at most
    C(5,2) = 10 pairs; the per-type audience sizes are a <= 5-row
    aggregate joined broadcast-style afterwards.
    """
    ev = load_table(spark, sf_dir, "events")
    # ONE scan: per-user sorted type set (collect_set is the distinct),
    # then a map-only combination expansion — no aud⋈aud self-join and
    # no recomputed distincts (the naive self-join plan executed the
    # events-distinct three times). The per-user set is <= 5 elements,
    # so the expansion is bounded at C(5,2) structs per user.
    # localCheckpoint: both the pair expansion and the audience sizes
    # read this users-cardinality frame; without it the events-scan
    # aggregate executes twice (once per consumer).
    sets = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("ts"))
        .localCheckpoint()
    )
    combos = F.flatten(
        F.transform(
            "ts",
            lambda x, i: F.transform(
                F.slice("ts", i + 2, F.greatest(F.size("ts") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    exploded = sets.select("user_id", F.explode(combos).alias("p"))
    pairs = exploded.groupBy(
        F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b")
    ).agg(bcount().alias("n_both"))
    sizes = (
        sets.select(F.explode("ts").alias("event_type"))
        .groupBy("event_type")
        .agg(bcount().alias("n_users"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


_AUDIENCE_SQL = """
WITH aud AS (SELECT DISTINCT user_id, event_type FROM events),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM aud GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM aud a JOIN aud b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, n_both,
       sa.n_users AS n_a, sb.n_users AS n_b,
       ROUND(n_both / (sa.n_users + sb.n_users - n_both), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""


def feat_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency per user: first ``view`` to first
    ``purchase`` STRICTLY after it (purchases before ever viewing do
    not count as view-driven conversions). Two aggregates and a join,
    all keyed on user_id — the exchange is planned once. Users who
    viewed but never converted keep a NULL latency (right-censored)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_view_us"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts_us") > F.col("first_view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_purchase_us"))
    )
    return fv.join(fp, "user_id", "left").select(
        "user_id",
        "first_view_us",
        "first_purchase_us",
        F.round(
            (F.col("first_purchase_us") - F.col("first_view_us")) / 3.6e9, 6
        ).alias("hours_to_convert"),
        F.when(F.col("first_purchase_us").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("converted"),
    )


_TIME_TO_CONVERT_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, {epoch_us_sql('ts')} AS ts_us FROM events),
fv AS (
  SELECT user_id, MIN(ts_us) AS first_view_us
  FROM e WHERE event_type = 'view' GROUP BY user_id),
fp AS (
  SELECT e.user_id, MIN(e.ts_us) AS first_purchase_us
  FROM e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > fv.first_view_us
  GROUP BY e.user_id)
SELECT fv.user_id, fv.first_view_us, fp.first_purchase_us,
       ROUND((fp.first_purchase_us - fv.first_view_us) / 3.6e9, 6)
         AS hours_to_convert,
       CAST(CASE WHEN fp.first_purchase_us IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS converted
FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id
"""


_WILSON_Z = 1.96  # 95% normal quantile, the conventional reporting level


def agg_conversion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-conversion rate per market segment with a Wilson 95%
    confidence interval — the experiment-readout aggregate. User-level
    conversion collapses first (one row per event-active user), joins
    the customer dim for the segment, then a 5-row segment aggregate;
    the CI arithmetic runs on that aggregate only. Both engines
    evaluate the identical IEEE expression tree on identical (n, k)
    integers, rounded at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    conv = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    seg = (
        conv.join(cust, conv.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            bcount().alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
    )
    z, n, k = F.lit(_WILSON_Z), F.col("n_users").cast("double"), F.col("n_converted")
    p = k / n
    denom = F.lit(1.0) + z * z / n
    center = (p + z * z / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
        / denom
    )
    return seg.select(
        "c_mktsegment",
        "n_users",
        "n_converted",
        F.round(p, 6).alias("conv_rate"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    ).orderBy("c_mktsegment")


_CONVERSION_CI_SQL = f"""
WITH conv AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id),
seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM conv JOIN customer ON user_id = c_custkey
  GROUP BY c_mktsegment)
SELECT c_mktsegment, n_users, n_converted,
       ROUND(n_converted / CAST(n_users AS DOUBLE), 6) AS conv_rate,
       ROUND((n_converted / CAST(n_users AS DOUBLE)
               + {_WILSON_Z} * {_WILSON_Z} / (2.0 * CAST(n_users AS DOUBLE)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / CAST(n_users AS DOUBLE))
             - {_WILSON_Z} * sqrt(
                 n_converted / CAST(n_users AS DOUBLE)
                   * (1.0 - n_converted / CAST(n_users AS DOUBLE))
                   / CAST(n_users AS DOUBLE)
                 + {_WILSON_Z} * {_WILSON_Z}
                   / (4.0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))
               / (1.0 + {_WILSON_Z} * {_WILSON_Z} / CAST(n_users AS DOUBLE)),
             6) AS ci_lo,
       ROUND((n_converted / CAST(n_users AS DOUBLE)
               + {_WILSON_Z} * {_WILSON_Z} / (2.0 * CAST(n_users AS DOUBLE)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / CAST(n_users AS DOUBLE))
             + {_WILSON_Z} * sqrt(
                 n_converted / CAST(n_users AS DOUBLE)
                   * (1.0 - n_converted / CAST(n_users AS DOUBLE))
                   / CAST(n_users AS DOUBLE)
                 + {_WILSON_Z} * {_WILSON_Z}
                   / (4.0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))
               / (1.0 + {_WILSON_Z} * {_WILSON_Z} / CAST(n_users AS DOUBLE)),
             6) AS ci_hi
FROM seg
ORDER BY c_mktsegment
"""


_AB_A, _AB_B = "BUILDING", "MACHINERY"


def agg_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test on order value between two market
    segments — the other half of the experiment-readout surface next
    to agg_conversion_ci. One conditional-aggregate pass over the
    orders⋈customer join produces (n, Σx, Σx²) per arm in exact
    DECIMAL; the t statistic and Welch–Satterthwaite df are then a
    fixed IEEE expression tree over identical doubles in both engines,
    rounded at 6 dp. Never two scans, never a per-arm subquery."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_totalprice"
    )
    x = F.col("o_totalprice")
    in_a = F.col("c_mktsegment") == _AB_A
    in_b = F.col("c_mktsegment") == _AB_B
    agg = j.agg(
        F.count(F.when(in_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(in_b, 1)).cast("long").alias("n_b"),
        dsum(F.when(in_a, x)).alias("s_a"),
        dsum(F.when(in_b, x)).alias("s_b"),
        dsum(F.when(in_a, x * x)).alias("ss_a"),
        dsum(F.when(in_b, x * x)).alias("ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma, mb = F.col("s_a") / na, F.col("s_b") / nb
    va = (F.col("ss_a") - na * ma * ma) / (na - F.lit(1.0))
    vb = (F.col("ss_b") - nb * mb * mb) / (nb - F.lit(1.0))
    se2a, se2b = va / na, vb / nb
    t = (ma - mb) / F.sqrt(se2a + se2b)
    df = (se2a + se2b) * (se2a + se2b) / (
        se2a * se2a / (na - F.lit(1.0)) + se2b * se2b / (nb - F.lit(1.0))
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df_welch"),
    )


def _ab_ttest_sql() -> str:
    def _arm(tag: str, seg: str) -> str:
        cond = f"c_mktsegment = '{seg}'"
        return (
            f"CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT) AS n_{tag},\n"
            f"       {dsum_where_sql('o_totalprice', cond)} AS s_{tag},\n"
            f"       {dsum_where_sql('o_totalprice * o_totalprice', cond)} AS ss_{tag}"
        )

    return f"""
WITH j AS (
  SELECT c_mktsegment, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey),
agg AS (
  SELECT {_arm('a', _AB_A)},
       {_arm('b', _AB_B)}
  FROM j),
c AS (
  SELECT n_a, n_b,
         s_a / CAST(n_a AS DOUBLE) AS ma, s_b / CAST(n_b AS DOUBLE) AS mb,
         (ss_a - CAST(n_a AS DOUBLE) * (s_a / CAST(n_a AS DOUBLE))
                 * (s_a / CAST(n_a AS DOUBLE))) / (CAST(n_a AS DOUBLE) - 1.0)
           / CAST(n_a AS DOUBLE) AS se2a,
         (ss_b - CAST(n_b AS DOUBLE) * (s_b / CAST(n_b AS DOUBLE))
                 * (s_b / CAST(n_b AS DOUBLE))) / (CAST(n_b AS DOUBLE) - 1.0)
           / CAST(n_b AS DOUBLE) AS se2b
  FROM agg)
SELECT n_a, n_b,
       ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
       ROUND((ma - mb) / sqrt(se2a + se2b), 6) AS t_stat,
       ROUND((se2a + se2b) * (se2a + se2b)
             / (se2a * se2a / (CAST(n_a AS DOUBLE) - 1.0)
                + se2b * se2b / (CAST(n_b AS DOUBLE) - 1.0)), 6) AS df_welch
FROM c
"""


_SURV_CENSOR_DAYS = 90


def feat_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve per market segment over
    customer engagement lifetime (days between first and last order).
    A customer whose last order is within _SURV_CENSOR_DAYS of the
    dataset horizon is right-CENSORED (still alive): they leave the
    risk set at their observed duration without contributing a death —
    the bookkeeping that makes naive churn averages wrong and survival
    estimators right. Everything is counting arithmetic: n_at_risk via
    a descending-duration running sum, per-time hazard d/n rounded at
    6 dp, and the cumulative hazard an exact DECIMAL running sum of
    those rounded increments (no product estimator, no exp/log — fully
    hash-stable cross-engine). Shuffles: one orders→customer aggregate,
    one segment-keyed window."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    horizon = F.lit(ORDERS_ANCHOR).cast("date")
    life = (
        orders.groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("long")
            .alias("t"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
        .withColumn(
            "event",
            (F.datediff(horizon, F.col("last_d")) > _SURV_CENSOR_DAYS)
            .cast("long"),
        )
    )
    seg = life.join(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "o_custkey",
    )
    per_t = seg.groupBy("c_mktsegment", "t").agg(
        bcount().alias("n_at_t"), F.sum("event").cast("long").alias("d_at_t")
    )
    w_desc = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = per_t.withColumn(
        "n_risk", F.sum("n_at_t").over(w_desc).cast("long")
    )
    hz = F.round(F.col("d_at_t") / F.col("n_risk").cast("double"), 6)
    w_asc = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        at_risk.where(F.col("d_at_t") > 0)
        .select(
            "c_mktsegment",
            "t",
            "n_risk",
            "d_at_t",
            hz.alias("hazard"),
            F.round(
                F.sum(hz.cast("decimal(30,6)")).over(w_asc).cast("double"), 6
            ).alias("cum_hazard"),
        )
    )


def _survival_sql() -> str:
    return f"""
WITH life AS (
  SELECT o_custkey,
         CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                        MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS t,
         CAST(CASE WHEN date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                                  DATE '{ORDERS_ANCHOR}') > {_SURV_CENSOR_DAYS}
                   THEN 1 ELSE 0 END AS BIGINT) AS event
  FROM orders GROUP BY o_custkey),
seg AS (
  SELECT c_mktsegment, t, event
  FROM life JOIN customer ON o_custkey = c_custkey),
per_t AS (
  SELECT c_mktsegment, t, CAST(COUNT(*) AS BIGINT) AS n_at_t,
         CAST(SUM(event) AS BIGINT) AS d_at_t
  FROM seg GROUP BY c_mktsegment, t),
risk AS (
  SELECT *, CAST(SUM(n_at_t) OVER (PARTITION BY c_mktsegment ORDER BY t DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
  FROM per_t),
hz AS (
  SELECT c_mktsegment, t, n_risk, d_at_t,
         ROUND(d_at_t / CAST(n_risk AS DOUBLE), 6) AS hazard
  FROM risk)
SELECT c_mktsegment, t, n_risk, d_at_t, hazard,
       ROUND(CAST(SUM(CAST(hazard AS DECIMAL(30,6)))
                  OVER (PARTITION BY c_mktsegment ORDER BY t ASC
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS cum_hazard
FROM hz
QUALIFY d_at_t > 0
"""


def agg_chisq_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of segment × purchase-conversion —
    "does conversion depend on segment?" in one row. The 5×2
    contingency table comes from the same user-collapse as
    agg_conversion_ci; observed/expected arithmetic then runs on the
    10-cell aggregate only. dof = (r-1)(c-1) = 4."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    conv = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    cells = (
        conv.join(cust, conv.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "converted")
        .agg(bcount().alias("o"))
    )
    tot = Window.partitionBy()
    row_t = Window.partitionBy("c_mktsegment")
    col_t = Window.partitionBy("converted")
    with_e = cells.select(
        "o",
        (
            F.sum("o").over(row_t).cast("double")
            * F.sum("o").over(col_t).cast("double")
            / F.sum("o").over(tot).cast("double")
        ).alias("e"),
    )
    chi = with_e.agg(
        F.round(
            F.sum(
                F.round(
                    (F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
                    / F.col("e"),
                    6,
                ).cast("decimal(30,6)")
            ).cast("double"),
            6,
        ).alias("chi2"),
        bcount().alias("n_cells"),
    )
    return chi.select(
        "chi2", "n_cells", F.lit(4).cast("long").alias("dof")
    )


_CHISQ_SQL = """
WITH conv AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id),
cells AS (
  SELECT c_mktsegment, converted, CAST(COUNT(*) AS BIGINT) AS o
  FROM conv JOIN customer ON user_id = c_custkey
  GROUP BY c_mktsegment, converted),
e AS (
  SELECT o,
         CAST(SUM(o) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
           * CAST(SUM(o) OVER (PARTITION BY converted) AS DOUBLE)
           / CAST(SUM(o) OVER () AS DOUBLE) AS e
  FROM cells)
SELECT ROUND(CAST(SUM(CAST(ROUND((o - e) * (o - e) / e, 6)
                          AS DECIMAL(30,6))) AS DOUBLE), 6) AS chi2,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(4 AS BIGINT) AS dof
FROM e
"""


def feat_next_best_offer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-best-action per user: the globally most popular event type
    the user has NOT done yet (popularity-ranked recommendation
    fallback — the cold-start baseline every recommender ships under
    the learned model). The global popularity ranking collapses to one
    broadcast array row; each user's recommendation is then a map-side
    array filter over their own collect_set — no per-user join against
    the popularity table at all. Users who have done everything get
    NULL."""
    ev = load_table(spark, sf_dir, "events")
    pop = ev.groupBy("event_type").agg(bcount().alias("n"))
    # one row: types sorted by (popularity desc, name asc) — the
    # sortable struct makes sort_array do the ordering JVM-side
    ranked = pop.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("n")).alias("neg_n"), "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("ranked_types")
    )
    seen = ev.groupBy("user_id").agg(F.collect_set("event_type").alias("seen"))
    return (
        seen.crossJoin(F.broadcast(ranked))
        .select(
            "user_id",
            F.size("seen").cast("long").alias("n_seen"),
            # F.get is null-on-out-of-bounds (ANSI-safe for the
            # seen-everything user whose filtered array is empty)
            F.get(
                F.filter(
                    "ranked_types",
                    lambda t: ~F.array_contains(F.col("seen"), t),
                ),
                0,
            ).alias("recommend"),
        )
    )


_NEXT_BEST_SQL = """
WITH pop AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
seen AS (
  SELECT DISTINCT user_id, event_type FROM events),
users AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_seen FROM seen GROUP BY 1),
cand AS (
  SELECT u.user_id, p.event_type,
         ROW_NUMBER() OVER (PARTITION BY u.user_id
                            ORDER BY p.n DESC, p.event_type ASC) AS rn
  FROM users u CROSS JOIN pop p
  WHERE NOT EXISTS (SELECT 1 FROM seen s
                    WHERE s.user_id = u.user_id
                      AND s.event_type = p.event_type))
SELECT u.user_id, u.n_seen, c.event_type AS recommend
FROM users u LEFT JOIN cand c ON u.user_id = c.user_id AND c.rn = 1
"""


def _global_ranked_cumsum(
    df: DataFrame, value_col: str, order_cols, checkpoint: bool = True
) -> DataFrame:
    """Global rank + running DECIMAL sum WITHOUT the single-partition
    collapse a partitionless window causes: range-repartition on the
    ordering, rank/accumulate LOCALLY per partition, then add the
    broadcast per-partition offsets (row counts and decimal sums of
    all preceding partitions — an n_partitions-row frame). Identical
    result to a global window; the data-sized sort stays distributed,
    and only the tiny offset table ever sees one partition. The
    ordering must be a total order (unique tiebreak) so ranks are
    boundary-independent."""
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    part = df.repartitionByRange(n_parts, *order_cols)
    wl = Window.partitionBy("pid").orderBy(*order_cols)
    local = (
        part.withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(wl).cast("long"))
        .withColumn(
            "lcum",
            F.sum(value_col).over(
                wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    # Pin pid ONCE: spark_partition_id depends on the physical range
    # exchange, and the offsets branch and the final join would
    # otherwise re-execute that exchange independently — an AQE replan
    # (or re-sampled range boundaries) between the two executions
    # would pair rows with offsets from a DIFFERENT partitioning and
    # silently corrupt the global ranks. (checkpoint=False exists only
    # so plan tests can inspect the pre-checkpoint exchange shape.)
    if checkpoint:
        local = local.localCheckpoint()
    totals = local.groupBy("pid").agg(
        F.max("lrn").alias("cnt"), F.sum(value_col).alias("psum")
    )
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid",
        F.coalesce(F.sum("cnt").over(wo), F.lit(0)).cast("long").alias("rn_off"),
        F.coalesce(
            F.sum("psum").over(wo), F.lit(0).cast("decimal(30,6)")
        ).alias("cum_off"),
    )
    return local.join(F.broadcast(offsets), "pid").select(
        *df.columns,
        (F.col("lrn") + F.col("rn_off")).cast("long").alias("rn"),
        (F.col("lcum") + F.col("cum_off")).cast("decimal(30,6)").alias("cum_dec"),
    )


def agg_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve at fixed percentile marks:
    what share of customers carries 50/80/90/95% of total revenue —
    the "how top-heavy is my business" readout. Customers aggregate
    first (one row each); the global revenue-descending rank + running
    sum uses the DISTRIBUTED ranking pattern (_global_ranked_cumsum —
    a partitionless window would drag every row into one partition);
    then four threshold lookups on the tiny marks frame. Cumulative
    shares are DECIMAL-exact so threshold crossings are engine-stable."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev_dec")
    )
    tot = per_cust.agg(
        F.sum("rev_dec").alias("tot_dec"), bcount().alias("n_cust")
    )
    ranked = _global_ranked_cumsum(
        per_cust,
        "rev_dec",
        [F.col("rev_dec").desc(), F.col("o_custkey").asc()],
    ).crossJoin(F.broadcast(tot))
    marks = [0.5, 0.8, 0.9, 0.95]
    outs = []
    for mk in marks:
        # first rank whose cumulative revenue reaches the mark
        hit = (
            ranked.where(
                F.col("cum_dec")
                >= (F.col("tot_dec") * F.lit(mk)).cast("decimal(30,6)")
            )
            .agg(F.min("rn").alias("n_top"), F.max("n_cust").alias("n_cust"))
            .select(
                F.lit(mk).alias("rev_share"),
                "n_top",
                "n_cust",
                F.round(F.col("n_top") / F.col("n_cust").cast("double"), 6).alias(
                    "cust_share"
                ),
            )
        )
        outs.append(hit)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _pareto_sql() -> str:
    marks_sql = []
    for mk in (0.5, 0.8, 0.9, 0.95):
        marks_sql.append(f"""
SELECT CAST({mk} AS DOUBLE) AS rev_share, MIN(rn) AS n_top,
       MAX(n_cust) AS n_cust,
       ROUND(MIN(rn) / CAST(MAX(n_cust) AS DOUBLE), 6) AS cust_share
FROM ranked
WHERE cum_dec >= CAST(tot_dec * {mk} AS DECIMAL(30,6))""")
    body = "\nUNION ALL\n".join(marks_sql)
    return f"""
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_dec
  FROM orders GROUP BY o_custkey),
tot AS (
  SELECT SUM(rev_dec) AS tot_dec, CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM per_cust),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev_dec DESC, o_custkey ASC)
              AS BIGINT) AS rn,
         SUM(rev_dec) OVER (ORDER BY rev_dec DESC, o_custkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum_dec,
         tot_dec, n_cust
  FROM per_cust CROSS JOIN tot)
{body}
"""


_CALIB_BINS = 10


def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration curve (model monitoring): bucket a
    deterministic churn-propensity proxy — the recency-decayed
    activity score squashed through a logistic — into deciles of its
    value range and compare mean predicted probability against the
    ACTUAL churn rate (feat_churn_label's leakage-safe label) per bin.
    The well-calibrated-model diagnostic, fully deterministic: no
    trained model, so the whole curve carries a DuckDB oracle. One
    user-collapse scan + a 10-row bin aggregate."""
    labels = feat_churn_label(spark, sf_dir).select("user_id", "churned", "v_obs")
    # logistic of (scaled obs-value): a monotone deterministic proxy
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(F.col("v_obs") / F.lit(-1000.0))), 6
    )
    binned = labels.select(
        "user_id",
        "churned",
        score.alias("p"),
        F.least(F.floor(score * _CALIB_BINS), F.lit(_CALIB_BINS - 1))
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            bcount().alias("n_users"),
            F.round(
                F.sum(F.col("p").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_predicted"),
            F.round(
                F.sum("churned").cast("double") / F.count(F.lit(1)), 6
            ).alias("actual_churn_rate"),
        )
        .orderBy("bin")
    )


def _calibration_sql() -> str:
    churn = _churn_sql().strip()
    return f"""
WITH churn AS ({churn}),
scored AS (
  SELECT user_id, churned,
         ROUND(1.0 / (1.0 + exp(v_obs / -1000.0)), 6) AS p
  FROM churn),
binned AS (
  SELECT user_id, churned, p,
         CAST(least(floor(p * {_CALIB_BINS}), {_CALIB_BINS - 1}) AS BIGINT)
           AS bin
  FROM scored)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(CAST(p AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_predicted,
       ROUND(SUM(churned) / CAST(COUNT(*) AS DOUBLE), 6) AS actual_churn_rate
FROM binned
GROUP BY bin
ORDER BY bin
"""


def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the single-number
    inequality complement to agg_pareto_revenue's curve:
    G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted revenue.
    Both Σ run in DECIMAL (i·xᵢ stays within DECIMAL(30,6) at any SF),
    so G is a single IEEE division of identical operands. Ranks come
    from the distributed ranking pattern (_global_ranked_cumsum), not
    a single-partition global window."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev_dec")
    )
    ranked = _global_ranked_cumsum(
        per_cust, "rev_dec", [F.col("rev_dec").asc(), F.col("o_custkey").asc()]
    ).withColumnRenamed("rn", "i")
    agg = ranked.agg(
        bcount().alias("n_cust"),
        F.sum("rev_dec").cast("double").alias("sum_x"),
        F.sum((F.col("i") * F.col("rev_dec")).cast("decimal(30,6)"))
        .cast("double")
        .alias("sum_ix"),
    )
    n = F.col("n_cust").cast("double")
    gini = (F.lit(2.0) * F.col("sum_ix") - (n + F.lit(1.0)) * F.col("sum_x")) / (
        n * F.col("sum_x")
    )
    return agg.select("n_cust", F.round(gini, 6).alias("gini"))


_GINI_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_dec
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT rev_dec,
         CAST(ROW_NUMBER() OVER (ORDER BY rev_dec ASC, o_custkey ASC)
              AS BIGINT) AS i
  FROM per_cust),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(rev_dec) AS DOUBLE) AS sum_x,
         CAST(SUM(CAST(i * rev_dec AS DECIMAL(30,6))) AS DOUBLE) AS sum_ix
  FROM ranked)
SELECT n_cust,
       ROUND((2.0 * sum_ix - (CAST(n_cust AS DOUBLE) + 1.0) * sum_x)
             / (CAST(n_cust AS DOUBLE) * sum_x), 6) AS gini
FROM agg
"""


def win_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per user: the share of their 30-min-gap sessions
    containing exactly ONE event (the classic engagement-quality
    metric). Same gaps-and-islands session ids as feat_sessionize
    (strict >30min starts a new session), then two aggregates on the
    same user key — the exchange is planned once."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    is_start = F.when(
        F.lag("ts_us").over(w).isNull()
        | (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us),
        1,
    ).otherwise(0)
    sessioned = ev.withColumn(
        "session_id",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sessioned.groupBy("user_id", "session_id").agg(
        bcount().alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        bcount().alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).cast("long").alias("n_bounces"),
        F.round(
            F.count(F.when(F.col("n_events") == 1, 1)) / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
    )


_BOUNCE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, {epoch_us_sql('ts')} AS ts_us FROM events),
flagged AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
numbered AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM numbered GROUP BY user_id, session_id)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
       ROUND(COUNT(*) FILTER (WHERE n_events = 1) / CAST(COUNT(*) AS DOUBLE), 6)
         AS bounce_rate
FROM per_session
GROUP BY user_id
"""


def feat_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity feature (0 = single-minded, ln 5 ≈ 1.609 = uniform over
    the five types). One (user, type) count aggregate, then the
    -Σ p·ln p fold per user with per-term 6-dp rounding into an exact
    DECIMAL sum (accumulation order can't wiggle the hash). Two
    aggregates on the same user key — one exchange."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(bcount().alias("n"))
    w_tot = Window.partitionBy("user_id")
    p = F.col("n") / F.sum("n").over(w_tot).cast("double")
    term = F.round(-p * F.log(p), 6)
    return (
        per_type.select("user_id", F.col("n"), term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            bcount().alias("n_types"),
            F.round(
                F.sum(F.col("term").cast("decimal(30,6)")).cast("double"), 6
            ).alias("entropy"),
        )
    )


_ENTROPY_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
terms AS (
  SELECT user_id, n,
         ROUND(-(n / CAST(SUM(n) OVER (PARTITION BY user_id) AS DOUBLE))
               * ln(n / CAST(SUM(n) OVER (PARTITION BY user_id) AS DOUBLE)),
               6) AS term
  FROM per_type)
SELECT user_id,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE), 6) AS entropy
FROM terms
GROUP BY user_id
"""


def feat_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week order seasonality per market segment: counts and
    within-segment revenue share by weekday — the basic calendar
    profile under staffing/campaign timing. One join + one aggregate;
    the weekday convention is pinned to DuckDB's 0=Sunday (Spark's
    dayofweek is 1=Sunday — the cross-engine trap NOTES.md records)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    per = j.groupBy(
        "c_mktsegment",
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).cast("long").alias(
            "dow"
        ),
    ).agg(bcount().alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    w = Window.partitionBy("c_mktsegment")
    return per.select(
        "c_mktsegment",
        "dow",
        "n_orders",
        "revenue",
        F.round(
            F.col("revenue") / F.sum("revenue").over(w), 6
        ).alias("rev_share"),
    )


_SEASONALITY_SQL = f"""
WITH per AS (
  SELECT c_mktsegment,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2)
SELECT c_mktsegment, dow, n_orders, revenue,
       ROUND(revenue / SUM(revenue) OVER (PARTITION BY c_mktsegment), 6)
         AS rev_share
FROM per
"""


_KFOLDS = 5


def ml_kfold_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation harness: users assign to
    5 folds by md5(user_id) (reproducible across engines/runs/retries —
    the split every leakage audit wants to re-derive), and each fold
    reports its test-side count and the mean squared error of the
    logistic churn proxy against the actual label. No randomness, no
    trained model — this pins the SPLIT and EVAL machinery, which is
    where CV pipelines actually go wrong at scale (skewed folds,
    train/test leakage). One user-collapse + one 5-row aggregate."""
    labels = feat_churn_label(spark, sf_dir).select("user_id", "churned", "v_obs")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _KFOLDS
    )
    p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(F.col("v_obs") / F.lit(-1000.0))), 6
    )
    err = F.round((p - F.col("churned")) * (p - F.col("churned")), 6)
    return (
        labels.select(fold.alias("fold"), err.alias("sq_err"), "churned")
        .groupBy("fold")
        .agg(
            bcount().alias("n_test"),
            F.sum("churned").cast("long").alias("n_churned"),
            F.round(
                F.sum(F.col("sq_err").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("test_mse"),
        )
        .orderBy("fold")
    )


def _kfold_sql() -> str:
    churn = _churn_sql().strip()
    return f"""
WITH churn AS ({churn}),
scored AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % {_KFOLDS} AS fold,
         churned,
         ROUND((ROUND(1.0 / (1.0 + exp(v_obs / -1000.0)), 6) - churned)
               * (ROUND(1.0 / (1.0 + exp(v_obs / -1000.0)), 6) - churned),
               6) AS sq_err
  FROM churn)
SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(churned) AS BIGINT) AS n_churned,
       ROUND(CAST(SUM(CAST(sq_err AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
         AS test_mse
FROM scored
GROUP BY fold
ORDER BY fold
"""


def feat_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical lag-feature block for sequence models: per event,
    the user's previous 1/2/3 values and the delta to lag-1 — one
    window pass over the same user_id exchange everything else uses.
    NULLs at each user's history head are the correct right answer
    (imputation is the model's decision, not the feature store's)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        F.lag("value", 3).over(w).alias("lag3"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("d1"),
    )


_LAG_FEATURES_SQL = f"""
SELECT event_id, user_id, {epoch_us_sql('ts')} AS ts_us, value,
       LAG(value, 1) OVER w AS lag1,
       LAG(value, 2) OVER w AS lag2,
       LAG(value, 3) OVER w AS lag3,
       ROUND(value - LAG(value, 1) OVER w, 6) AS d1
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {epoch_us_sql('ts')}, event_id)
"""


def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: is the extended-price
    distribution of returned lines (l_returnflag='R') the same as
    accepted ones ('A')? D = max over distinct values of
    |F_A(v) - F_R(v)| with ECDFs evaluated at value-block ends
    (tie-correct), against the large-sample 5% critical value
    c = 1.358·sqrt((n_A+n_R)/(n_A·n_R)).

    The global value order uses _global_ranked_cumsum (range
    partition + local rank/cumsum + broadcast offsets): rn gives the
    combined ECDF numerator and the decimal cumsum of the A-indicator
    gives F_A's — ONE distributed sort yields both, and the per-value
    block max makes the statistic independent of tie interleaving.
    Every count is exact-integer, so D is a division of identical
    operands in both engines; round 6 dp on the display values only."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_extendedprice").alias("v"),
            (F.col("l_returnflag") == "A")
            .cast("int")
            .cast("decimal(30,6)")
            .alias("is_a"),
            F.col("l_orderkey").alias("k1"),
            F.col("l_linenumber").alias("k2"),
        )
    )
    ranked = _global_ranked_cumsum(
        li, "is_a", [F.col("v").asc(), F.col("k1").asc(), F.col("k2").asc()]
    )
    blocks = ranked.groupBy("v").agg(
        F.max("rn").alias("cum_total"),
        F.max(F.col("cum_dec").cast("long")).alias("cum_a"),
    )
    totals = blocks.agg(
        F.max("cum_total").alias("n_total"), F.max("cum_a").alias("n_a")
    )
    j = blocks.crossJoin(F.broadcast(totals))
    n_a = F.col("n_a").cast("double")
    n_r = (F.col("n_total") - F.col("n_a")).cast("double")
    diff = F.abs(
        F.col("cum_a").cast("double") / n_a
        - (F.col("cum_total") - F.col("cum_a")).cast("double") / n_r
    )
    agg = j.groupBy("n_total", "n_a").agg(F.max(diff).alias("d"))
    c = F.lit(1.358) * F.sqrt(
        (n_a + n_r) / (n_a * n_r)
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        (F.col("n_total") - F.col("n_a")).cast("long").alias("n_r"),
        F.round("d", 6).alias("d_stat"),
        F.round(c, 6).alias("c_alpha05"),
        (F.col("d") > c).alias("reject_same_dist"),
    )


_KS_SQL = """
WITH li AS (
  SELECT l_extendedprice AS v,
         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_a,
         l_orderkey AS k1, l_linenumber AS k2
  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
ranked AS (
  SELECT v,
         ROW_NUMBER() OVER (ORDER BY v, k1, k2) AS rn,
         SUM(is_a) OVER (ORDER BY v, k1, k2
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a
  FROM li),
blocks AS (
  SELECT v, CAST(MAX(rn) AS BIGINT) AS cum_total,
         CAST(MAX(cum_a) AS BIGINT) AS cum_a
  FROM ranked GROUP BY v),
tot AS (
  SELECT MAX(cum_total) AS n_total, MAX(cum_a) AS n_a FROM blocks),
diffs AS (
  SELECT b.cum_total, b.cum_a, t.n_total, t.n_a,
         abs(CAST(b.cum_a AS DOUBLE) / CAST(t.n_a AS DOUBLE)
             - CAST(b.cum_total - b.cum_a AS DOUBLE)
               / CAST(t.n_total - t.n_a AS DOUBLE)) AS diff
  FROM blocks b CROSS JOIN tot t)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_total - n_a AS BIGINT) AS n_r,
       round(MAX(diff), 6) AS d_stat,
       round(1.358 * sqrt(CAST(n_total AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_total - n_a AS DOUBLE))), 6)
         AS c_alpha05,
       MAX(diff) > 1.358 * sqrt(CAST(n_total AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_total - n_a AS DOUBLE)))
         AS reject_same_dist
FROM diffs GROUP BY n_total, n_a
"""


QUERIES = {
    "agg_ks_test": agg_ks_test,
    "feat_attribution_touch": feat_attribution_touch,
    "ml_kfold_splits": ml_kfold_splits,
    "feat_lag_features": feat_lag_features,
    "feat_seasonality_dow": feat_seasonality_dow,
    "feat_behavior_entropy": feat_behavior_entropy,
    "agg_pareto_revenue": agg_pareto_revenue,
    "agg_gini_revenue": agg_gini_revenue,
    "win_session_bounce": win_session_bounce,
    "ml_calibration_bins": ml_calibration_bins,
    "feat_next_best_offer": feat_next_best_offer,
    "feat_survival_hazard": feat_survival_hazard,
    "agg_chisq_segments": agg_chisq_segments,
    "agg_ab_ttest": agg_ab_ttest,
    "feat_churn_label": feat_churn_label,
    "feat_audience_overlap": feat_audience_overlap,
    "feat_time_to_convert": feat_time_to_convert,
    "agg_conversion_ci": agg_conversion_ci,
}

ORACLE = {
    "agg_ks_test": _KS_SQL,
    "feat_attribution_touch": _ATTRIBUTION_SQL,
    "feat_behavior_entropy": _ENTROPY_SQL,
    "feat_seasonality_dow": _SEASONALITY_SQL,
    "ml_kfold_splits": _kfold_sql(),
    "feat_lag_features": _LAG_FEATURES_SQL,
    "agg_pareto_revenue": _pareto_sql(),
    "agg_gini_revenue": _GINI_SQL,
    "win_session_bounce": _BOUNCE_SQL,
    "ml_calibration_bins": _calibration_sql(),
    "feat_next_best_offer": _NEXT_BEST_SQL,
    "feat_survival_hazard": _survival_sql(),
    "agg_chisq_segments": _CHISQ_SQL,
    "agg_ab_ttest": _ab_ttest_sql(),
    "feat_churn_label": _churn_sql(),
    "feat_audience_overlap": _AUDIENCE_SQL,
    "feat_time_to_convert": _TIME_TO_CONVERT_SQL,
    "agg_conversion_ci": _CONVERSION_CI_SQL,
}


# ---------------------------------------------------------------------------
# Poisson bootstrap (round 4): the scalable bootstrap — per-row Poisson(1)
# resample weights instead of sampling n rows with replacement, so all B
# resamples compute in ONE distributed pass (the only bootstrap that
# works when n doesn't fit anywhere). Weights derive from md5, so every
# resample is reproducible AND the oracle replays it exactly.

_BOOT_B = 32
# floor(CDF_Poisson(1)(k) * 2^16) for k = 0..6; weight caps at 7. The
# 16-bit resolution (probabilities quantized to 1/65536, error < 2e-5
# per mass point) is what lets ONE md5 per row seed EIGHT replicate
# weights — 4 hashes per row total instead of 32, which is the entire
# cost of the op at scale. Integer thresholds shared by both engines:
# the inverse-CDF lookup is pure integer comparison, no libm anywhere.
_BOOT_CDF16 = [24109, 48218, 60273, 64291, 65296, 65497, 65530]


def _poisson_w16(h16: "F.Column") -> "F.Column":
    w = F.lit(7)
    for k in range(len(_BOOT_CDF16) - 1, -1, -1):
        w = F.when(h16 < _BOOT_CDF16[k], k).otherwise(w)
    return w.cast("long")


def stat_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B=32 Poisson-bootstrap replicates of mean order value: one row
    per replicate with its effective sample size and resample mean.

    Dataflow (the point of the Poisson bootstrap): all B resamples in
    ONE pass. Each row draws 4 md5s (hex slices of 4 digits give the
    32 16-bit uniforms — hashing is the dominant cost, so 4/row not
    32/row), then a 32x explode fans out (b, weight) pairs that
    partial-aggregate to B rows per task before the tiny shuffle. The
    explode keeps every expression inside whole-stage codegen — a
    64-column conditional-aggregate variant fell out of codegen
    (>100 fields) and ran 10x slower. The base is repartitioned to the
    session parallelism only when the scan arrives under-partitioned
    (single-file local reads); a real many-file table skips it.
    Resample means divide a DECIMAL-exact weighted sum by an exact
    integer count (one IEEE division, both engines)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Metadata-only under-partitioning probe: inputFiles() reads the scan's
    # file listing (no plan-to-RDD conversion, AQE untouched). A many-file
    # table at scale skips the repartition entirely.
    if len(orders.inputFiles()) < n_parts:
        orders = orders.repartition(n_parts)
    d = orders
    for grp in range(_BOOT_B // 8):
        d = d.withColumn(
            f"h{grp}", F.md5(F.concat_ws(":", "o_orderkey", F.lit(str(grp))))
        )
    fan = d.select(
        "o_totalprice",
        *[f"h{g}" for g in range(_BOOT_B // 8)],
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    h16 = F.conv(
        F.expr("substring(elt(b DIV 8 + 1, h0, h1, h2, h3), (b % 8) * 4 + 1, 4)"),
        16,
        10,
    ).cast("long")
    w = _poisson_w16(h16)
    agg = fan.withColumn("w", w).groupBy("b").agg(
        F.sum("w").cast("long").alias("n_eff"),
        dsum(F.col("w").cast("double") * F.col("o_totalprice")).alias("wsum"),
    )
    return agg.select(
        F.col("b").cast("long").alias("b"),
        "n_eff",
        F.round(F.col("wsum") / F.col("n_eff").cast("double"), 6).alias(
            "mean_resample"
        ),
    )


def _bootstrap_sql() -> str:
    cases = " ".join(
        f"WHEN h < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF16)
    )
    reps = []
    for b in range(_BOOT_B):
        grp, off = b // 8, (b % 8) * 4
        reps.append(f"""
SELECT CAST({b} AS BIGINT) AS b,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       round({dsum_sql('CAST(w AS DOUBLE) * o_totalprice')}
             / CAST(SUM(w) AS DOUBLE), 6) AS mean_resample
FROM (
  SELECT o_totalprice,
         CAST(CASE {cases} ELSE 7 END AS BIGINT) AS w
  FROM (
    SELECT o_totalprice,
           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':{grp}'),
                           {off + 1}, 4))::BIGINT AS h
    FROM orders))""")
    return "\nUNION ALL\n".join(reps)


QUERIES["stat_bootstrap_poisson"] = stat_bootstrap_poisson
ORACLE["stat_bootstrap_poisson"] = _bootstrap_sql()


# ---------------------------------------------------------------------------
# CUPED adjustment (round 4): Controlled-experiment Using Pre-Existing
# Data (Deng et al. 2013) — the industry-standard variance-reduction
# for A/B metrics: shrink each user's post-period metric by
# theta * (pre-period covariate - its mean) before comparing arms.

_CUPED_SPLIT = "2024-01-16"  # pre/post boundary (events span Jan 2024)


def stat_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm CUPED summary (arms = first-event-was-click, the same
    assignment as feat_ipw_ate): n, raw post-period mean, CUPED-
    adjusted mean, and the variance-reduction fraction.

    Everything derives from ONE user-level pass and exact sufficient
    statistics: theta and x-bar come from pooled (n, Sx, Sy, Sxy, Sxx)
    DECIMAL sums; Var(y - theta*(x - xbar)) expands in closed form to
    Syy - 2*theta*Sxy' + theta^2*Sxx' (no second data pass, the same
    trick ml_linreg_closed_form uses). Per-arm and pooled stats are
    grouped in the SAME aggregate; all the float math happens on
    driver-size rows with identical expressions in both engines."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (F.min_by("event_type", "event_id") == "click").cast("long").alias("treated"),
        dsum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp")),
                F.col("value"),
            ).otherwise(0.0)
        ).alias("x"),
        dsum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp")),
                F.col("value"),
            ).otherwise(0.0)
        ).alias("y"),
    )
    arms = users.groupBy("treated").agg(
        bcount().alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    tot = Window.partitionBy()
    n_t = F.sum("n").over(tot).cast("double")
    sx_t = F.sum(F.col("sx").cast(_DEC)).over(tot).cast("double")
    sy_t = F.sum(F.col("sy").cast(_DEC)).over(tot).cast("double")
    sxy_t = F.sum(F.col("sxy").cast(_DEC)).over(tot).cast("double")
    sxx_t = F.sum(F.col("sxx").cast(_DEC)).over(tot).cast("double")
    theta = (n_t * sxy_t - sx_t * sy_t) / (n_t * sxx_t - sx_t * sx_t)
    xbar = sx_t / n_t
    d = arms.select(
        "treated",
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        theta.alias("theta"),
        xbar.alias("xbar"),
    )
    n = F.col("n").cast("double")
    mean_y = F.col("sy") / n
    mean_cu = mean_y - F.col("theta") * (F.col("sx") / n - F.col("xbar"))
    var_y = F.col("syy") / n - mean_y * mean_y
    # E[(y - theta(x - xbar))^2] expanded from sufficient statistics
    e_cu2 = (
        F.col("syy")
        - 2.0 * F.col("theta") * (F.col("sxy") - F.col("xbar") * F.col("sy"))
        + F.col("theta")
        * F.col("theta")
        * (
            F.col("sxx")
            - 2.0 * F.col("xbar") * F.col("sx")
            + n * F.col("xbar") * F.col("xbar")
        )
    ) / n
    var_cu = e_cu2 - mean_cu * mean_cu
    return d.select(
        F.col("treated").cast("long").alias("treated"),
        "n",
        F.round("theta", 6).alias("theta"),
        F.round(mean_y, 6).alias("mean_post"),
        F.round(mean_cu, 6).alias("mean_cuped"),
        F.round(F.lit(1.0) - var_cu / var_y, 6).alias("var_reduction"),
    )


_CUPED_SQL = f"""
WITH u AS (
  SELECT user_id,
         CAST(arg_min(event_type, event_id) = 'click' AS BIGINT) AS treated,
         {dsum_sql("CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '" + _CUPED_SPLIT + "' THEN value ELSE 0.0 END")} AS x,
         {dsum_sql("CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '" + _CUPED_SPLIT + "' THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY user_id),
arms AS (
  SELECT treated, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy, {dsum_sql('x * x')} AS sxx,
         {dsum_sql('y * y')} AS syy
  FROM u GROUP BY treated),
g AS (
  SELECT *,
         CAST(SUM(CAST(n AS DECIMAL(30,6))) OVER () AS DOUBLE) AS n_t,
         CAST(SUM(CAST(sx AS DECIMAL(30,6))) OVER () AS DOUBLE) AS sx_t,
         CAST(SUM(CAST(sy AS DECIMAL(30,6))) OVER () AS DOUBLE) AS sy_t,
         CAST(SUM(CAST(sxy AS DECIMAL(30,6))) OVER () AS DOUBLE) AS sxy_t,
         CAST(SUM(CAST(sxx AS DECIMAL(30,6))) OVER () AS DOUBLE) AS sxx_t
  FROM arms),
p AS (
  SELECT *,
         (n_t * sxy_t - sx_t * sy_t) / (n_t * sxx_t - sx_t * sx_t) AS theta,
         sx_t / n_t AS xbar
  FROM g)
SELECT CAST(treated AS BIGINT) AS treated, n,
       round(theta, 6) AS theta,
       round(sy / CAST(n AS DOUBLE), 6) AS mean_post,
       round(sy / CAST(n AS DOUBLE)
             - theta * (sx / CAST(n AS DOUBLE) - xbar), 6) AS mean_cuped,
       round(1.0 - ((syy - 2.0 * theta * (sxy - xbar * sy)
                     + theta * theta
                       * (sxx - 2.0 * xbar * sx
                          + CAST(n AS DOUBLE) * xbar * xbar))
                    / CAST(n AS DOUBLE)
                    - (sy / CAST(n AS DOUBLE)
                       - theta * (sx / CAST(n AS DOUBLE) - xbar))
                      * (sy / CAST(n AS DOUBLE)
                         - theta * (sx / CAST(n AS DOUBLE) - xbar)))
                   / (syy / CAST(n AS DOUBLE)
                      - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))),
             6) AS var_reduction
FROM p
"""

QUERIES["stat_cuped_adjust"] = stat_cuped_adjust
ORACLE["stat_cuped_adjust"] = _CUPED_SQL


# ---------------------------------------------------------------------------
# Exact ROC AUC (round 5): the Mann-Whitney/Wilcoxon rank form of AUC
# — scoring how well a deterministic price-based propensity separates
# returned (l_returnflag = 'R') from kept line items, the model-eval
# companion to ml_calibration_bins. Tie-CORRECT by construction:
# scores are grouped (the 6-dp logistic has a hard <= 1e6+1 distinct
# values, so the ordered cumsum is bounded regardless of table size),
# and each group contributes its positives times the group's average
# rank, carried as the exact INTEGER 2*rank sum (2*cum_below + n_group
# + 1) — AUC is one double division of exact integer operands in both
# engines. No pairwise positive x negative join (the naive quadratic
# trap this formulation exists to avoid at 100 TB); a degenerate
# single-class input yields NULL, not a divide error, under ANSI mode.


def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    score = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(F.col("l_extendedprice") / F.lit(-20000.0))),
        6,
    )
    by_score = (
        li.select(
            score.alias("p"),
            (F.col("l_returnflag") == "R").cast("long").alias("y"),
        )
        .groupBy("p")
        .agg(bcount().alias("n_t"), F.sum("y").alias("pos_t"))
    )
    w = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_score.select(
        "n_t",
        "pos_t",
        F.coalesce(F.sum("n_t").over(w), F.lit(0)).alias("cum_below"),
    )
    agg = ranked.agg(
        F.sum("pos_t").cast("long").alias("n_pos"),
        (F.sum("n_t") - F.sum("pos_t")).cast("long").alias("n_neg"),
        F.sum(
            F.col("pos_t") * (F.lit(2) * F.col("cum_below") + F.col("n_t") + 1)
        )
        .cast("long")
        .alias("two_rank_sum"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (
                F.col("two_rank_sum").cast("double")
                - (F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            )
            / (F.lit(2.0) * (F.col("n_pos") * F.col("n_neg")).cast("double")),
            6,
        ),
    )
    return agg.select("n_pos", "n_neg", auc.alias("auc")).select(
        "n_pos",
        "n_neg",
        "auc",
        F.round(F.lit(2.0) * F.col("auc") - F.lit(1.0), 6).alias("gini"),
    )


_AUC_SQL = """
WITH scored AS (
  SELECT ROUND(1.0 / (1.0 + exp(l_extendedprice / -20000.0)), 6) AS p,
         CAST(l_returnflag = 'R' AS BIGINT) AS y
  FROM lineitem),
by_score AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_t, SUM(y) AS pos_t
  FROM scored GROUP BY p),
ranked AS (
  SELECT n_t, pos_t,
         COALESCE(SUM(n_t) OVER (ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
  FROM by_score),
agg AS (
  SELECT CAST(SUM(pos_t) AS BIGINT) AS n_pos,
         CAST(SUM(n_t) - SUM(pos_t) AS BIGINT) AS n_neg,
         CAST(SUM(pos_t * (2 * cum_below + n_t + 1)) AS BIGINT)
           AS two_rank_sum
  FROM ranked),
final AS (
  SELECT n_pos, n_neg,
         CASE WHEN n_pos > 0 AND n_neg > 0 THEN
           round((CAST(two_rank_sum AS DOUBLE)
                  - CAST(n_pos * (n_pos + 1) AS DOUBLE))
                 / (2.0 * CAST(n_pos * n_neg AS DOUBLE)), 6)
         END AS auc
  FROM agg)
SELECT n_pos, n_neg, auc, round(2.0 * auc - 1.0, 6) AS gini
FROM final
"""


QUERIES["ml_auc_roc"] = ml_auc_roc
ORACLE["ml_auc_roc"] = _AUC_SQL


# ---------------------------------------------------------------------------
# Sequential probability ratio test (round 5): Wald's SPRT per user
# over the time-ordered stream of high-value events — the
# EARLY-STOPPING sequential test that completes the A/B stats family
# (fixed-n t-test, Wilson CI, CUPED, and now the sequential decision).
# H0: P(value > 50) = 0.25 vs H1: = 0.35, alpha = beta = 0.05.
# Determinism: the four log constants are computed ONCE in Python and
# injected as double literals, so LLR_t = k1_t*LP1 + k0_t*LP0 is a
# two-term expression of exact integer cumulative counts times
# identical literals in both engines — no engine-side log() (whose
# last ulp could differ). The decision is the FIRST boundary crossing
# (min_by over the flagged rows), or 'continue' if the stream ends
# inside the band.

import math as _math

_SPRT_P0, _SPRT_P1 = 0.25, 0.35
_SPRT_LP1 = _math.log(_SPRT_P1 / _SPRT_P0)  # success term
_SPRT_LP0 = _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))  # failure term
_SPRT_A = _math.log((1.0 - 0.05) / 0.05)  # accept-H1 boundary
_SPRT_B = _math.log(0.05 / (1.0 - 0.05))  # accept-H0 boundary


def stat_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = (F.col("value") > 50).cast("long")
    seq = ev.select(
        "user_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
        F.sum(x).over(w).alias("k1"),
        (F.count(F.lit(1)).over(w) - F.sum(x).over(w)).alias("k0"),
    )
    llr = F.col("k1") * F.lit(_SPRT_LP1) + F.col("k0") * F.lit(_SPRT_LP0)
    flagged = seq.select(
        "user_id",
        "rn",
        llr.alias("llr"),
        F.when(llr >= _SPRT_A, F.lit("h1"))
        .when(llr <= _SPRT_B, F.lit("h0"))
        .alias("cross"),
    )
    first_cross = (
        flagged.where(F.col("cross").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("rn").alias("n_at_decision"),
            F.min_by("cross", "rn").alias("decision"),
            F.round(F.min_by("llr", "rn"), 9).alias("llr_at_decision"),
        )
    )
    totals = flagged.groupBy("user_id").agg(
        F.max("rn").alias("n_total"), F.round(F.max_by("llr", "rn"), 9).alias("llr_final")
    )
    return totals.join(first_cross, "user_id", "left").select(
        "user_id",
        "n_total",
        F.coalesce("decision", F.lit("continue")).alias("decision"),
        F.coalesce("n_at_decision", F.col("n_total")).cast("long").alias("n_at_decision"),
        F.coalesce("llr_at_decision", "llr_final").alias("llr_stop"),
    )


_SPRT_SQL = f"""
WITH seq AS (
  SELECT user_id,
         ROW_NUMBER() OVER w AS rn,
         SUM(CAST(value > 50 AS BIGINT)) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k1,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(CAST(value > 50 AS BIGINT)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k0
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
flagged AS (
  SELECT user_id, rn,
         k1 * {_SPRT_LP1!r} + k0 * {_SPRT_LP0!r} AS llr,
         CASE WHEN k1 * {_SPRT_LP1!r} + k0 * {_SPRT_LP0!r} >= {_SPRT_A!r}
              THEN 'h1'
              WHEN k1 * {_SPRT_LP1!r} + k0 * {_SPRT_LP0!r} <= {_SPRT_B!r}
              THEN 'h0' END AS crossed
  FROM seq),
fc AS (
  SELECT user_id, MIN(rn) AS n_at_decision,
         arg_min(crossed, rn) AS decision,
         round(arg_min(llr, rn), 9) AS llr_at_decision
  FROM flagged WHERE crossed IS NOT NULL GROUP BY user_id),
t AS (
  SELECT user_id, MAX(rn) AS n_total,
         round(arg_max(llr, rn), 9) AS llr_final
  FROM flagged GROUP BY user_id)
SELECT t.user_id,
       CAST(t.n_total AS BIGINT) AS n_total,
       COALESCE(fc.decision, 'continue') AS decision,
       CAST(COALESCE(fc.n_at_decision, t.n_total) AS BIGINT) AS n_at_decision,
       CAST(COALESCE(fc.llr_at_decision, t.llr_final) AS DOUBLE) AS llr_stop
FROM t LEFT JOIN fc USING (user_id)
"""

QUERIES["stat_sprt"] = stat_sprt
ORACLE["stat_sprt"] = _SPRT_SQL
