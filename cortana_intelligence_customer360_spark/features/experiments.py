"""Experimentation & attribution analytics (round-5 additions).

Reference parity note: the upstream Azure/cortana-intelligence-customer360
checkout is empty (SURVEY.md §0); SURVEY §2.8/§2.12 are the normative
inventory. This module extends the attribution/experimentation family
(features/attribution.py) with the two reports a Customer-360 marketing
analyst reaches for right after first/last-touch and the proportion CI:

- feat_shapley_channel   exact Shapley-value conversion credit per
                         marketing channel (the game-theoretic
                         multi-touch attribution model)
- agg_ratio_delta_ci     delta-method confidence interval for a RATIO
                         metric (revenue per order) per segment — the
                         correct CI when the denominator is itself
                         random, unlike agg_conversion_ci's proportion

Scale notes (100 TB posture): both operators collapse to sufficient
statistics in ONE shuffle. Shapley reduces events to a per-user channel
bitmask (groupBy user_id), then to <=16 coalition rows; every join after
that is on a <=16-row frame (broadcast, driver-trivial) and the Shapley
sum itself is exact integer arithmetic (x24 numerators) so no float
order-dependence exists anywhere. The ratio CI is the CUPED pattern:
per-customer order aggregates (one shuffle on custkey), then 5 segment
rows of DECIMAL-exact sums feeding one closed-form expression evaluated
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import _DEC, bcount, dsum, dsum_sql
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}

# The four non-purchase event types (FIXTURES.md: click, error, signup,
# view) in alphabetical order, each assigned a bitmask bit.
_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_N_CH = len(_CHANNELS)
# Shapley weight numerators x 24 (= 4!): w(|S|) = |S|!(3-|S|)!/4! for
# the coalition S NOT containing the channel; |S| in 0..3 -> 6,2,2,6.
_W24 = {0: 6, 1: 2, 2: 2, 3: 6}

_MASK_CASE = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"
)
def feat_shapley_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion attribution per channel.

    Data-driven attribution: each user contributes their SET of touched
    channels (distinct non-purchase event types, as a 4-bit mask) and a
    converted flag (>=1 purchase). The coalition worth v(S) counts
    conversions by users whose entire touch-set lies inside S, and each
    channel's credit is the exact Shapley value
    phi_i = sum_{S not ni i} |S|!(n-1-|S|)!/n! * (v(S u {i}) - v(S)).

    Distributed shape: ONE groupBy(user_id) with bit_or reduces events
    to user masks; a second groupBy(mask) leaves <=16 rows, and all
    coalition math happens on a generated 16-row mask frame (subset-sum
    join 16x16, then an 8-term Shapley sum per channel). The Shapley
    sum uses integer x24 weight numerators so it is EXACT (BIGINT)
    arithmetic — no float accumulation order anywhere; the single final
    division by 24 is deterministic. Efficiency property pinned in
    tests: sum(phi) = v(all) - v(empty).
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.expr(f"bit_or({_MASK_CASE})").alias("mask"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    exact = users.groupBy("mask").agg(
        F.sum("conv").cast("long").alias("conv"),
        bcount().alias("n_users"),
    )
    # <=16 coalition rows: materialize once (eager localCheckpoint) so
    # the v(S) and touched branches don't each re-scan/re-shuffle the
    # event table — the plan keeps exactly ONE user_id exchange.
    exact = exact.localCheckpoint()
    # v(S) = sum of conv(T) over exact masks T subseteq S, for all 16 S.
    s_masks = spark.range(1 << _N_CH).select(F.col("id").cast("int").alias("s"))
    v = (
        s_masks.join(
            F.broadcast(exact),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(_CHANNELS, "channel string, bit int")
    # Coalitions S excluding the channel, joined to v(S) and v(S|bit);
    # weight numerators x24 (_W24) selected by popcount(S).
    vs = v.select(F.col("s"), F.col("v").alias("v_s"))
    vsb = v.select(F.col("s").alias("sb"), F.col("v").alias("v_sb"))
    terms = (
        ch.join(F.broadcast(vs), F.col("s").bitwiseAND(F.col("bit")) == 0)
        .withColumn("sb", F.col("s").bitwiseOR(F.col("bit")))
        .join(F.broadcast(vsb), "sb")
        .select(
            "channel",
            "bit",
            (
                F.expr(
                    "CASE ((s >> 0) & 1) + ((s >> 1) & 1) + ((s >> 2) & 1)"
                    " + ((s >> 3) & 1) WHEN 0 THEN 6 WHEN 1 THEN 2"
                    " WHEN 2 THEN 2 WHEN 3 THEN 6 END"
                )
                * (F.col("v_sb") - F.col("v_s"))
            ).alias("num24"),
        )
    )
    touched = (
        exact.crossJoin(F.broadcast(ch))
        .where(F.col("mask").bitwiseAND(F.col("bit")) != 0)
        .groupBy("channel")
        .agg(
            F.sum("n_users").cast("long").alias("users_touched"),
            F.sum("conv").cast("long").alias("conv_touched"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(F.sum("num24").cast("long").alias("num24"))
        .join(F.broadcast(touched), "channel", "left")
        .select(
            "channel",
            F.round(F.col("num24").cast("double") / F.lit(24.0), 6).alias("shapley"),
            F.coalesce("users_touched", F.lit(0)).cast("long").alias("users_touched"),
            F.coalesce("conv_touched", F.lit(0)).cast("long").alias("conv_touched"),
        )
        .orderBy("channel")
    )


_SHAPLEY_SQL = f"""
WITH users AS (
  SELECT user_id,
         bit_or({_MASK_CASE}) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
exact AS (
  SELECT mask, CAST(SUM(conv) AS BIGINT) AS conv,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM users GROUP BY mask),
s_masks AS (SELECT CAST(range AS INT) AS s FROM range(0, 16)),
v AS (
  SELECT s, CAST(COALESCE(SUM(e.conv), 0) AS BIGINT) AS v
  FROM s_masks LEFT JOIN exact e ON (e.mask & s) = e.mask
  GROUP BY s),
ch(channel, bit) AS (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8)),
terms AS (
  SELECT ch.channel,
         (CASE ((v.s >> 0) & 1) + ((v.s >> 1) & 1) + ((v.s >> 2) & 1)
               + ((v.s >> 3) & 1)
            WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 6 END)
         * (vb.v - v.v) AS num24
  FROM ch
  JOIN v ON (v.s & ch.bit) = 0
  JOIN v vb ON vb.s = (v.s | ch.bit)),
touched AS (
  SELECT ch.channel,
         CAST(SUM(e.n_users) AS BIGINT) AS users_touched,
         CAST(SUM(e.conv) AS BIGINT) AS conv_touched
  FROM exact e JOIN ch ON (e.mask & ch.bit) <> 0
  GROUP BY ch.channel)
SELECT t.channel,
       round(CAST(CAST(SUM(t.num24) AS BIGINT) AS DOUBLE) / 24.0, 6) AS shapley,
       CAST(COALESCE(ANY_VALUE(tc.users_touched), 0) AS BIGINT) AS users_touched,
       CAST(COALESCE(ANY_VALUE(tc.conv_touched), 0) AS BIGINT) AS conv_touched
FROM terms t LEFT JOIN touched tc ON tc.channel = t.channel
GROUP BY t.channel
ORDER BY t.channel
"""

QUERIES["feat_shapley_channel"] = feat_shapley_channel
ORACLE["feat_shapley_channel"] = _SHAPLEY_SQL


def agg_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method 95% CI for revenue-per-order by market segment.

    The metric R = sum(y)/sum(x) (y = customer revenue, x = customer
    order count) has a random denominator, so the naive mean-of-ratios
    CI is wrong; the delta method gives
    Var(R) ~= (vary - 2 R covxy + R^2 varx) / (n * xbar^2)
    with population (co)variances over the per-customer pairs.

    Shape: per-customer aggregates (one shuffle on o_custkey), LEFT
    join back to customer so zero-order customers stay in the cohort,
    then 5 segment rows of DECIMAL-exact sufficient sums
    (n, Sx, Sy, Sxy, Sxx, Syy) feed one closed-form float expression
    written identically in both engines (identical operands -> identical
    IEEE doubles; the CUPED/linreg discipline from compat.py).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(bcount().alias("x"), dsum("o_totalprice").alias("y"))
    )
    joined = cust.join(per, cust.c_custkey == per.o_custkey, "left").select(
        "c_mktsegment",
        F.coalesce(F.col("x"), F.lit(0)).cast("double").alias("x"),
        F.coalesce(F.col("y"), F.lit(0.0)).alias("y"),
    )
    seg = joined.groupBy("c_mktsegment").agg(
        bcount().alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    xbar = F.col("sx") / n
    ybar = F.col("sy") / n
    r = F.col("sy") / F.col("sx")
    varx = F.col("sxx") / n - xbar * xbar
    vary = F.col("syy") / n - ybar * ybar
    covxy = F.col("sxy") / n - xbar * ybar
    var_r = (vary - 2.0 * r * covxy + r * r * varx) / (n * (xbar * xbar))
    se = F.sqrt(var_r)
    return seg.select(
        "c_mktsegment",
        "n",
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    ).orderBy("c_mktsegment")


_RATIO_SQL = f"""
WITH per AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x,
         {dsum_sql('o_totalprice')} AS y
  FROM orders GROUP BY o_custkey),
joined AS (
  SELECT c.c_mktsegment,
         CAST(COALESCE(p.x, 0) AS DOUBLE) AS x,
         COALESCE(p.y, 0.0) AS y
  FROM customer c LEFT JOIN per p ON c.c_custkey = p.o_custkey),
seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy, {dsum_sql('x * x')} AS sxx,
         {dsum_sql('y * y')} AS syy
  FROM joined GROUP BY c_mktsegment)
SELECT c_mktsegment, n,
       round(sy / sx, 6) AS ratio,
       round(sqrt((((syy / CAST(n AS DOUBLE))
                    - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   - 2.0 * (sy / sx)
                     * ((sxy / CAST(n AS DOUBLE))
                        - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   + (sy / sx) * (sy / sx)
                     * ((sxx / CAST(n AS DOUBLE))
                        - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
                  / (CAST(n AS DOUBLE)
                     * ((sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))),
             6) AS se,
       round((sy / sx) - 1.96 * sqrt((((syy / CAST(n AS DOUBLE))
                    - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   - 2.0 * (sy / sx)
                     * ((sxy / CAST(n AS DOUBLE))
                        - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   + (sy / sx) * (sy / sx)
                     * ((sxx / CAST(n AS DOUBLE))
                        - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
                  / (CAST(n AS DOUBLE)
                     * ((sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))),
             6) AS ci_lo,
       round((sy / sx) + 1.96 * sqrt((((syy / CAST(n AS DOUBLE))
                    - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   - 2.0 * (sy / sx)
                     * ((sxy / CAST(n AS DOUBLE))
                        - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   + (sy / sx) * (sy / sx)
                     * ((sxx / CAST(n AS DOUBLE))
                        - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
                  / (CAST(n AS DOUBLE)
                     * ((sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))),
             6) AS ci_hi
FROM seg
ORDER BY c_mktsegment
"""

QUERIES["agg_ratio_delta_ci"] = agg_ratio_delta_ci
ORACLE["agg_ratio_delta_ci"] = _RATIO_SQL


# ---------------------------------------------------------------------------
# Fisher randomization (permutation) test: the assumption-free p-value
# for the treated-vs-control difference in per-user purchase revenue.
# Draws are md5-deterministic (engine/run/partitioning-independent,
# the sample_hash_pct discipline), so the whole null distribution is
# reproducible and fully oracle-checkable.

_PERM_B = 200


def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the difference in mean per-user purchase
    revenue between treated (first event is a click — the same
    assignment as stat_cuped_adjust/feat_ipw_ate) and control.

    Null draws: for b = 1.._PERM_B each user is relabeled by the md5
    bit of (user_id, b) — Bernoulli(1/2) re-randomization, the standard
    approximate Fisher test. p = (1 + #{b : |T_b| >= |T_obs|}) /
    (B + 1), the add-one Monte-Carlo estimator.

    Shape: events reduce to one row per user (ONE shuffle); the user
    frame explodes x B and partially aggregates map-side, so the second
    shuffle moves only B x partitions sufficient-stat rows, never
    user-level data. T statistics are DECIMAL-exact sums divided as
    identical doubles (compat rule 2); the comparison count is exact
    integer arithmetic, so p is bit-stable across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (F.min_by("event_type", "event_id") == "click").cast("int").alias("treated"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("y"),
    )
    obs = users.groupBy().agg(
        bcount().alias("n_users"),
        (
            dsum(F.when(F.col("treated") == 1, F.col("y"))) /
            F.count(F.when(F.col("treated") == 1, 1))
        ).alias("mean_t"),
        (
            dsum(F.when(F.col("treated") == 0, F.col("y"))) /
            F.count(F.when(F.col("treated") == 0, 1))
        ).alias("mean_c"),
    )
    lab = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("user_id"), F.col("b"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    draws = (
        users.select(
            "user_id",
            "y",
            F.explode(F.sequence(F.lit(1), F.lit(_PERM_B))).alias("b"),
        )
        .withColumn("lab", lab)
        .groupBy("b")
        .agg(
            (
                dsum(F.when(F.col("lab") == 1, F.col("y"))) /
                F.count(F.when(F.col("lab") == 1, 1))
            ).alias("m1"),
            (
                dsum(F.when(F.col("lab") == 0, F.col("y"))) /
                F.count(F.when(F.col("lab") == 0, 1))
            ).alias("m0"),
        )
        .select((F.col("m1") - F.col("m0")).alias("t_b"))
    )
    return (
        draws.crossJoin(F.broadcast(obs))
        .groupBy()
        .agg(
            F.max("n_users").alias("n_users"),
            F.lit(_PERM_B).cast("long").alias("n_draws"),
            F.round(F.max(F.col("mean_t") - F.col("mean_c")), 6).alias("t_obs"),
            F.round(
                (
                    F.lit(1)
                    + F.count(
                        F.when(
                            F.abs(F.col("t_b"))
                            >= F.abs(F.col("mean_t") - F.col("mean_c")),
                            1,
                        )
                    )
                ).cast("double")
                / F.lit(float(_PERM_B + 1)),
                6,
            ).alias("p_value"),
        )
    )


_PERM_SQL = f"""
WITH users AS (
  SELECT user_id,
         CAST(arg_min(event_type, event_id) = 'click' AS INT) AS treated,
         {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY user_id),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         {dsum_sql('CASE WHEN treated = 1 THEN y END')}
           / COUNT(CASE WHEN treated = 1 THEN 1 END) AS mean_t,
         {dsum_sql('CASE WHEN treated = 0 THEN y END')}
           / COUNT(CASE WHEN treated = 0 THEN 1 END) AS mean_c
  FROM users),
draws AS (
  SELECT (({dsum_sql('CASE WHEN lab = 1 THEN y END')}
           / COUNT(CASE WHEN lab = 1 THEN 1 END))
          - ({dsum_sql('CASE WHEN lab = 0 THEN y END')}
             / COUNT(CASE WHEN lab = 0 THEN 1 END))) AS t_b
  FROM (
    SELECT u.y, b.b,
           ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'
                               || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT % 2 AS lab
    FROM users u, (SELECT CAST(range AS BIGINT) AS b
                   FROM range(1, {_PERM_B + 1})) b)
  GROUP BY b)
SELECT MAX(o.n_users) AS n_users,
       CAST({_PERM_B} AS BIGINT) AS n_draws,
       round(MAX(o.mean_t - o.mean_c), 6) AS t_obs,
       round(CAST(1 + COUNT(CASE WHEN abs(d.t_b)
                                      >= abs(o.mean_t - o.mean_c)
                            THEN 1 END) AS DOUBLE) / {float(_PERM_B + 1)},
             6) AS p_value
FROM draws d, obs o
"""

QUERIES["stat_permutation_test"] = stat_permutation_test
ORACLE["stat_permutation_test"] = _PERM_SQL


# ---------------------------------------------------------------------------
# Kaplan-Meier product-limit survival curve: the multiplicative sibling
# of feat_survival_hazard's Nelson-Aalen cumulative hazard (same
# lifetime/censoring construction, features/attribution.py:501). The
# product is computed in LOG space with each increment quantized to
# 9 dp before an exact DECIMAL running sum — the same
# round-then-decimal-cumsum discipline the hazard op uses, which makes
# the curve hash-stable across engines despite ln/exp being libm calls.

_KM_CENSOR_DAYS = 90
_KM_ANCHOR = "2001-08-01"


def feat_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate S(t) per market segment over
    customer engagement lifetime (days between first and last order;
    last order within _KM_CENSOR_DAYS of the horizon = right-censored).

    S(t) = prod_{t_i <= t} (1 - d_i/n_i), computed as
    exp(cumsum(round(ln(1 - h_i), 9))) with h_i the 6-dp hazard —
    every float step is either an identical-operand IEEE op or an exact
    DECIMAL sum, so both engines emit the identical curve. Shuffles:
    one orders->customer aggregate and one segment-keyed window, same
    budget as the hazard op."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    horizon = F.lit(_KM_ANCHOR).cast("date")
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
            (F.datediff(horizon, F.col("last_d")) > _KM_CENSOR_DAYS).cast("long"),
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
    at_risk = per_t.withColumn("n_risk", F.sum("n_at_t").over(w_desc).cast("long"))
    hz = F.round(F.col("d_at_t") / F.col("n_risk").cast("double"), 6)
    ln_inc = F.round(F.log(F.lit(1.0) - hz), 9)
    w_asc = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_ln = F.sum(ln_inc.cast("decimal(30,9)")).over(w_asc).cast("double")
    return at_risk.where(F.col("d_at_t") > 0).select(
        "c_mktsegment",
        "t",
        "n_risk",
        "d_at_t",
        F.round(F.exp(cum_ln), 6).alias("survival"),
    )


_KM_SQL = f"""
WITH life AS (
  SELECT o_custkey,
         CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                        MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS t,
         CAST(CASE WHEN date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                                  DATE '{_KM_ANCHOR}') > {_KM_CENSOR_DAYS}
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
inc AS (
  SELECT c_mktsegment, t, n_risk, d_at_t,
         ROUND(ln(1.0 - ROUND(d_at_t / CAST(n_risk AS DOUBLE), 6)), 9) AS ln_inc
  FROM risk)
SELECT c_mktsegment, t, n_risk, d_at_t,
       ROUND(exp(CAST(SUM(CAST(ln_inc AS DECIMAL(30,9)))
                      OVER (PARTITION BY c_mktsegment ORDER BY t ASC
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 6) AS survival
FROM inc
QUALIFY d_at_t > 0
"""

QUERIES["feat_kaplan_meier"] = feat_kaplan_meier
ORACLE["feat_kaplan_meier"] = _KM_SQL


# ---------------------------------------------------------------------------
# Caliper propensity matching: 1-nearest-control matching WITH
# replacement inside a 0.01-wide propensity caliper block, then the ATT
# over matched pairs. Blocking by the rounded score is what makes the
# match embarrassingly parallel (each block is an independent window —
# no global sort, no sequential greedy pass), the standard trade-off a
# distributed matcher makes (caliper matching): treated users whose
# block holds no control stay unmatched and are reported, never
# silently matched across the caliper.


def feat_propensity_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATT of first-event-click treatment on per-user purchase revenue
    via within-caliper nearest-neighbor matching.

    Propensity p = logistic(-1 + 0.8 ln(n_events+1) - 1.5 click_ratio)
    rounded to 6 dp; caliper block = floor(100 p). Within each block,
    ordered by (p, user_id), every treated user takes the nearer of the
    last preceding / first following control (ties prefer preceding);
    matching is with replacement so no sequential dependence exists.

    Shape: one groupBy(user_id) collapse, then ONE window partitioned
    by block (blocks are score-bounded slices, so no single partition
    sees the whole population), then a global 1-row aggregate with
    DECIMAL-exact sums. No self-join, no driver loop.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (F.min_by("event_type", "event_id") == "click").cast("int").alias("treated"),
        bcount().alias("n_ev"),
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("n_click"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("y"),
    )
    z = (
        F.lit(-1.0)
        + 0.8 * F.log(F.col("n_ev").cast("double") + 1.0)
        - 1.5 * (F.col("n_click").cast("double") / F.col("n_ev").cast("double"))
    )
    scored = users.select(
        "user_id",
        "treated",
        "y",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("p"),
    ).withColumn("block", F.floor(F.col("p") * 100).cast("int"))
    ctrl = F.col("treated") == 0
    cand = F.when(ctrl, F.struct(F.col("p").alias("cp"), F.col("y").alias("cy")))
    w = Window.partitionBy("block").orderBy("p", "user_id")
    prev_c = F.last(cand, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # "first following control" == "last preceding control under the
    # REVERSED total order": both windows are then growing frames,
    # which WindowExec evaluates incrementally in O(n) — an
    # UnboundedFollowing frame re-aggregates per row (O(n^2) per
    # block; 9x superlinear measured at 40x scale before this).
    w_rev = Window.partitionBy("block").orderBy(
        F.col("p").desc(), F.col("user_id").desc()
    )
    next_c = F.last(cand, ignorenulls=True).over(
        w_rev.rowsBetween(Window.unboundedPreceding, -1)
    )
    m = scored.select(
        "treated", "p", "y", prev_c.alias("prev_c"), next_c.alias("next_c")
    ).where(F.col("treated") == 1)
    use_prev = F.col("prev_c").isNotNull() & (
        F.col("next_c").isNull()
        | (
            (F.col("p") - F.col("prev_c.cp"))
            <= (F.col("next_c.cp") - F.col("p"))
        )
    )
    chosen = F.when(use_prev, F.col("prev_c")).otherwise(F.col("next_c"))
    paired = m.select("y", chosen.alias("c"))
    matched = F.col("c").isNotNull()
    return paired.groupBy().agg(
        bcount().alias("n_treated"),
        F.count(F.when(matched, 1)).cast("long").alias("n_matched"),
        F.round(
            dsum(F.when(matched, F.col("y") - F.col("c.cy")))
            / F.count(F.when(matched, 1)),
            6,
        ).alias("att"),
        F.round(
            dsum(F.when(matched, F.col("y"))) / F.count(F.when(matched, 1)), 6
        ).alias("mean_t_matched"),
        F.round(
            dsum(F.when(matched, F.col("c.cy"))) / F.count(F.when(matched, 1)), 6
        ).alias("mean_c_matched"),
    )


_PSM_SQL = f"""
WITH users AS (
  SELECT user_id,
         CAST(arg_min(event_type, event_id) = 'click' AS INT) AS treated,
         CAST(COUNT(*) AS BIGINT) AS n_ev,
         CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
         {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY user_id),
scored AS (
  SELECT user_id, treated, y,
         round(1.0 / (1.0 + exp(-(-1.0
                + 0.8 * ln(CAST(n_ev AS DOUBLE) + 1.0)
                - 1.5 * (CAST(n_click AS DOUBLE) / CAST(n_ev AS DOUBLE))))),
               6) AS p
  FROM users),
blocked AS (
  SELECT *, CAST(floor(p * 100) AS INT) AS block FROM scored),
cands AS (
  SELECT treated, p, y,
         last_value(CASE WHEN treated = 0
                         THEN struct_pack(cp := p, cy := y) END IGNORE NULLS)
           OVER (PARTITION BY block ORDER BY p, user_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_c,
         first_value(CASE WHEN treated = 0
                          THEN struct_pack(cp := p, cy := y) END IGNORE NULLS)
           OVER (PARTITION BY block ORDER BY p, user_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c
  FROM blocked),
paired AS (
  SELECT y,
         CASE WHEN prev_c IS NOT NULL
                   AND (next_c IS NULL
                        OR (p - prev_c.cp) <= (next_c.cp - p))
              THEN prev_c ELSE next_c END AS c
  FROM cands WHERE treated = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
       CAST(COUNT(CASE WHEN c IS NOT NULL THEN 1 END) AS BIGINT) AS n_matched,
       round({dsum_sql('CASE WHEN c IS NOT NULL THEN y - c.cy END')}
             / COUNT(CASE WHEN c IS NOT NULL THEN 1 END), 6) AS att,
       round({dsum_sql('CASE WHEN c IS NOT NULL THEN y END')}
             / COUNT(CASE WHEN c IS NOT NULL THEN 1 END), 6) AS mean_t_matched,
       round({dsum_sql('CASE WHEN c IS NOT NULL THEN c.cy END')}
             / COUNT(CASE WHEN c IS NOT NULL THEN 1 END), 6) AS mean_c_matched
FROM paired
"""

QUERIES["feat_propensity_matching"] = feat_propensity_matching
ORACLE["feat_propensity_matching"] = _PSM_SQL


# ---------------------------------------------------------------------------
# Weight of Evidence / Information Value: the credit-scoring-style
# predictor audit — how much does the account-balance band say about
# conversion? The canonical pre-model feature screen (IV < 0.02 =>
# useless, > 0.3 => strong) that belongs next to feat_target_encoding.


def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per acctbal band (fixed-width floor(c_acctbal/2000) buckets —
    engine-independent, unlike ntile on ties): event counts, WOE with
    +0.5 Laplace smoothing on the numerators, the band's IV term, and
    the total IV replicated per row.

    Shape: one user-collapse of events (conversion flag), a broadcast-
    sized join to customer bands, a <=10-row band aggregate, and
    window totals over those rows. Counts are exact integers; WOE's ln
    runs on identical-operand doubles and is 6-dp rounded; IV terms go
    back through DECIMAL for the exact total (compat rules 1/3)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    # Target: HEAVY purchaser (>= 14 purchase events). Every joined
    # user has some purchases in this corpus, so a has-any flag would
    # be constant-1 (zero bads, degenerate WOE); the count threshold
    # splits ~50/50 at every SF.
    conv = ev.groupBy("user_id").agg(
        (
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14
        ).cast("int").alias("converted")
    )
    banded = conv.join(
        cust.select(F.col("c_custkey").alias("user_id"), "c_acctbal"), "user_id"
    ).select(
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bucket"),
        "converted",
    )
    g = banded.groupBy("bucket").agg(
        bcount().alias("n"),
        F.sum("converted").cast("long").alias("good"),
        (bcount() - F.sum("converted")).cast("long").alias("bad"),
    )
    tot = Window.partitionBy()
    good_t = F.sum("good").over(tot).cast("double")
    bad_t = F.sum("bad").over(tot).cast("double")
    gr = (F.col("good").cast("double") + 0.5) / good_t
    br = (F.col("bad").cast("double") + 0.5) / bad_t
    woe = F.round(F.log(gr / br), 6)
    iv_term = F.round((gr - br) * F.log(gr / br), 6)
    d = g.select("bucket", "n", "good", "bad", woe.alias("woe"), iv_term.alias("iv_term"))
    return d.select(
        "bucket",
        "n",
        "good",
        "bad",
        "woe",
        "iv_term",
        F.round(
            F.sum(F.col("iv_term").cast(_DEC)).over(tot).cast("double"), 6
        ).alias("iv_total"),
    ).orderBy("bucket")


_WOE_SQL = """
WITH conv AS (
  SELECT user_id,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
              AS INT) AS converted
  FROM events GROUP BY user_id),
banded AS (
  SELECT CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bucket, converted
  FROM conv JOIN customer ON user_id = c_custkey),
g AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS good,
         CAST(COUNT(*) - SUM(converted) AS BIGINT) AS bad
  FROM banded GROUP BY bucket),
w AS (
  SELECT bucket, n, good, bad,
         round(ln(((CAST(good AS DOUBLE) + 0.5)
                   / CAST(SUM(good) OVER () AS DOUBLE))
                  / ((CAST(bad AS DOUBLE) + 0.5)
                     / CAST(SUM(bad) OVER () AS DOUBLE))), 6) AS woe,
         round(((CAST(good AS DOUBLE) + 0.5)
                 / CAST(SUM(good) OVER () AS DOUBLE)
                - (CAST(bad AS DOUBLE) + 0.5)
                  / CAST(SUM(bad) OVER () AS DOUBLE))
               * ln(((CAST(good AS DOUBLE) + 0.5)
                     / CAST(SUM(good) OVER () AS DOUBLE))
                    / ((CAST(bad AS DOUBLE) + 0.5)
                       / CAST(SUM(bad) OVER () AS DOUBLE))), 6) AS iv_term
  FROM g)
SELECT bucket, n, good, bad, woe, iv_term,
       round(CAST(SUM(CAST(iv_term AS DECIMAL(30,6))) OVER () AS DOUBLE), 6)
         AS iv_total
FROM w
ORDER BY bucket
"""

QUERIES["feat_woe_iv"] = feat_woe_iv
ORACLE["feat_woe_iv"] = _WOE_SQL


# ---------------------------------------------------------------------------
# Mutual information I(segment; heavy-purchaser) in nats — the
# information-theoretic counterpart of agg_chisq_segments: how many
# nats does knowing the segment buy about conversion? Uses the same
# 5x2 contingency collapse; all probabilities are exact integer ratios
# and each cell's ln runs on identical-operand doubles (6-dp rounded
# per-cell before the DECIMAL total, the feat_woe_iv discipline).


def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per contingency cell (segment x target) with the cell's
    MI contribution p_xy * ln(p_xy/(p_x p_y)), plus the exact MI total
    replicated per row; zero cells contribute 0 by convention."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    conv = ev.groupBy("user_id").agg(
        (
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14
        ).cast("int").alias("heavy")
    )
    cells = (
        conv.join(
            cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
            "user_id",
        )
        .groupBy("c_mktsegment", "heavy")
        .agg(bcount().alias("o"))
    )
    tot = Window.partitionBy()
    row_w = Window.partitionBy("c_mktsegment")
    col_w = Window.partitionBy("heavy")
    n = F.sum("o").over(tot).cast("double")
    p_xy = F.col("o").cast("double") / n
    p_x = F.sum("o").over(row_w).cast("double") / n
    p_y = F.sum("o").over(col_w).cast("double") / n
    term = F.round(p_xy * F.log(p_xy / (p_x * p_y)), 6)
    d = cells.select(
        "c_mktsegment",
        F.col("heavy").cast("long").alias("heavy"),
        "o",
        term.alias("mi_term"),
    )
    return d.select(
        "c_mktsegment",
        "heavy",
        "o",
        "mi_term",
        F.round(
            F.sum(F.col("mi_term").cast(_DEC)).over(tot).cast("double"), 6
        ).alias("mi_total"),
    ).orderBy("c_mktsegment", "heavy")


_MI_SQL = """
WITH conv AS (
  SELECT user_id,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
              AS INT) AS heavy
  FROM events GROUP BY user_id),
cells AS (
  SELECT c_mktsegment, heavy, CAST(COUNT(*) AS BIGINT) AS o
  FROM conv JOIN customer ON user_id = c_custkey
  GROUP BY c_mktsegment, heavy),
t AS (
  SELECT c_mktsegment, CAST(heavy AS BIGINT) AS heavy, o,
         round((CAST(o AS DOUBLE) / CAST(SUM(o) OVER () AS DOUBLE))
               * ln((CAST(o AS DOUBLE) / CAST(SUM(o) OVER () AS DOUBLE))
                    / ((CAST(SUM(o) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
                        / CAST(SUM(o) OVER () AS DOUBLE))
                       * (CAST(SUM(o) OVER (PARTITION BY heavy) AS DOUBLE)
                          / CAST(SUM(o) OVER () AS DOUBLE)))), 6) AS mi_term
  FROM cells)
SELECT c_mktsegment, heavy, o, mi_term,
       round(CAST(SUM(CAST(mi_term AS DECIMAL(30,6))) OVER () AS DOUBLE), 6)
         AS mi_total
FROM t
ORDER BY c_mktsegment, heavy
"""

QUERIES["agg_mutual_information"] = agg_mutual_information
ORACLE["agg_mutual_information"] = _MI_SQL


# ---------------------------------------------------------------------------
# Time-bound funnel: click -> view -> purchase where each stage must
# land within 24h of the PREVIOUS stage's completion (the windowed
# funnel semantics of ClickHouse windowFunnel / Amplitude, vs
# feat_funnel_conversion's unbounded strict-order funnel).

_FUNNEL_WIN_US = 86_400_000_000  # 24h in epoch-µs


def feat_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row funnel report: users entering at the earliest click,
    converting to the earliest view within 24h of it, then to the
    earliest purchase within 24h of THAT view; stage counts and
    conversion rates. All stage anchors are exact integer epoch-µs
    minima, so the per-stage membership is exactly reproducible.

    Shape: three user-keyed conditional aggregates over the SAME
    user_id exchange (AQE reuses the partitioning); no window over
    the raw event stream, no per-user event lists."""
    from ..compat import epoch_us

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us")
    )
    t1 = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "view")
        .join(t1, "user_id")
        .where((F.col("us") > F.col("t1")) & (F.col("us") <= F.col("t1") + _FUNNEL_WIN_US))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where((F.col("us") > F.col("t2")) & (F.col("us") <= F.col("t2") + _FUNNEL_WIN_US))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    n1 = t1.agg(bcount().alias("n_stage1"))
    n2 = t2.agg(bcount().alias("n_stage2"))
    n3 = t3.agg(bcount().alias("n_stage3"))
    return (
        n1.crossJoin(n2)
        .crossJoin(n3)
        .select(
            "n_stage1",
            "n_stage2",
            "n_stage3",
            F.round(
                F.col("n_stage2").cast("double") / F.col("n_stage1").cast("double"), 6
            ).alias("conv_12"),
            F.round(
                F.col("n_stage3").cast("double") / F.col("n_stage2").cast("double"), 6
            ).alias("conv_23"),
            F.round(
                F.col("n_stage3").cast("double") / F.col("n_stage1").cast("double"), 6
            ).alias("conv_13"),
        )
    )


_FUNNEL_WIN_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
t1 AS (
  SELECT user_id, MIN(us) AS t1 FROM ev
  WHERE event_type = 'click' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.us) AS t2
  FROM ev e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'view' AND e.us > t1.t1
    AND e.us <= t1.t1 + {_FUNNEL_WIN_US}
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.us) AS t3
  FROM ev e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.us > t2.t2
    AND e.us <= t2.t2 + {_FUNNEL_WIN_US}
  GROUP BY e.user_id)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n_stage1,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n_stage2,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS n_stage3,
       round((SELECT COUNT(*) FROM t2) * 1.0 / (SELECT COUNT(*) FROM t1), 6)
         AS conv_12,
       round((SELECT COUNT(*) FROM t3) * 1.0 / (SELECT COUNT(*) FROM t2), 6)
         AS conv_23,
       round((SELECT COUNT(*) FROM t3) * 1.0 / (SELECT COUNT(*) FROM t1), 6)
         AS conv_13
"""

QUERIES["feat_funnel_windowed"] = feat_funnel_windowed
ORACLE["feat_funnel_windowed"] = _FUNNEL_WIN_SQL
