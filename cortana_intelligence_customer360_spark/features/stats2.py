"""Second-wave hypothesis tests (SURVEY.md §2.12, round 8).

- ``stat_welch_anova`` — the unequal-variance one-way ANOVA (Welch
  1951), the test practitioners are told to reach for INSTEAD of
  stat_anova_oneway when stat_brown_forsythe rejects equal variances;
  with this op the package carries the complete canonical trio.
- ``stat_friedman_test`` — the nonparametric repeated-measures ANOVA
  (blocks = users, treatments = event types, ranks within block), the
  within-subject companion to stat_kruskal_wallis (which is
  between-subject).

Exactness scheme (the NOTES.md float discipline):

- Welch: the five market segments are pivoted into ONE row of
  DECIMAL-exact (n, Σx, Σx²) triples, and the entire F/df₂ closed form
  is a single shared SQL text evaluated by both engines over that row
  — every float op appears in one fixed textual order, so there is no
  accumulation-order hazard at all. Values are scaled to $K so the
  squared sums stay well inside DECIMAL(38,10).
- Friedman: within-block ranks are INTEGERS (row_number with a total
  tiebreak on the exact per-cell mean, then event_type), so the rank
  sums and their squares are exact integer aggregates and Q is one
  closed form over exact integers.

Scale: Welch is one fact-table pass collapsing to a single row;
Friedman is two hash aggregates (user×type cells, then per-type rank
sums) plus one 5-row-per-user window — all linear, no crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import EVENT_TYPES, load_table

QUERIES: dict = {}
ORACLE: dict = {}

_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_K = len(_SEGS)


def _welch_formula() -> tuple[str, str]:
    """(f_stat_expr, df2_expr) over columns n_i/s_i/ss_i, i=0..4 —
    one text, two engines. Sums are written term-by-term in fixed
    order; k is the literal 5."""
    m = [f"(s_{i} / n_{i})" for i in range(_K)]
    var = [f"((ss_{i} - s_{i} * s_{i} / n_{i}) / (n_{i} - 1))" for i in range(_K)]
    w = [f"(n_{i} / {var[i]})" for i in range(_K)]
    bigw = "(" + " + ".join(w) + ")"
    xw = "((" + " + ".join(f"{w[i]} * {m[i]}" for i in range(_K)) + f") / {bigw})"
    num = (
        "(("
        + " + ".join(f"{w[i]} * ({m[i]} - {xw}) * ({m[i]} - {xw})" for i in range(_K))
        + f") / {_K - 1})"
    )
    lam = (
        "(("
        + " + ".join(
            f"(1.0 - {w[i]} / {bigw}) * (1.0 - {w[i]} / {bigw}) / (n_{i} - 1)"
            for i in range(_K)
        )
        + "))"
    )
    f_stat = (
        f"({num} / (1.0 + (2.0 * {_K - 2} / ({_K} * {_K} - 1.0)) * {lam}))"
    )
    df2 = f"(({_K} * {_K} - 1.0) / (3.0 * {lam}))"
    return f_stat, df2


def stat_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA of order value ($K) across
    market segments: weights wⱼ=nⱼ/s²ⱼ, variance-weighted grand mean,
    F* and its Welch–Satterthwaite denominator df — all from one
    pivoted row of exact per-segment moments (see module docstring)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice") / 1000.0).alias("x"),
        )
    )
    dec = "decimal(38,10)"
    aggs = []
    for i, s in enumerate(_SEGS):
        cond = F.col("seg") == s
        aggs += [
            F.count(F.when(cond, 1)).cast("double").alias(f"n_{i}"),
            F.sum(F.when(cond, F.col("x").cast(dec)))
            .cast("double")
            .alias(f"s_{i}"),
            F.sum(F.when(cond, (F.col("x") * F.col("x")).cast(dec)))
            .cast("double")
            .alias(f"ss_{i}"),
        ]
    one = obs.agg(*aggs)
    f_stat, df2 = _welch_formula()
    return one.select(
        F.lit(_K).cast("long").alias("k"),
        sum(F.col(f"n_{i}") for i in range(_K)).cast("long").alias("nn"),
        F.round(F.expr(f_stat), 6).alias("f_stat"),
        F.round(F.expr(df2), 6).alias("df2"),
    )


def _welch_sql() -> str:
    cols = []
    for i, s in enumerate(_SEGS):
        cols += [
            f"CAST(COUNT(*) FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE)"
            f" AS n_{i}",
            f"CAST(SUM(CAST(o_totalprice / 1000.0 AS DECIMAL(38,10)))"
            f" FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE) AS s_{i}",
            f"CAST(SUM(CAST((o_totalprice / 1000.0) * (o_totalprice / 1000.0)"
            f" AS DECIMAL(38,10)))"
            f" FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE) AS ss_{i}",
        ]
    f_stat, df2 = _welch_formula()
    nn = " + ".join(f"n_{i}" for i in range(_K))
    return f"""
WITH one AS (
  SELECT {', '.join(cols)}
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT CAST({_K} AS BIGINT) AS k,
       CAST({nn} AS BIGINT) AS nn,
       round({f_stat}, 6) AS f_stat,
       round({df2}, 6) AS df2
FROM one
"""


QUERIES["stat_welch_anova"] = stat_welch_anova
ORACLE["stat_welch_anova"] = _welch_sql()


def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's rank test: does event value differ across the five
    event types, controlling for the user? Cells are per-(user, type)
    exact mean values; each complete block (user with all 5 types)
    ranks its cells 1..5; Q = 12/(n·k·(k+1))·ΣR²ⱼ − 3n(k+1) over the
    exact integer rank sums. Per-type rows carry the rank sum and mean
    rank; Q and n ride along (identical on every row)."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    cells = ev.groupBy("user_id", "event_type").agg(
        (F.sum(F.col("value").cast(dec)).cast("double") / F.count("value"))
        .alias("m")
    )
    complete = (
        cells.groupBy("user_id")
        .agg(bcount().alias("n_types"))
        .where(F.col("n_types") == len(EVENT_TYPES))
        .select("user_id")
    )
    ranked = (
        cells.join(complete, "user_id")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("m", "event_type")
            ),
        )
    )
    k = len(EVENT_TYPES)
    per_type = ranked.groupBy("event_type").agg(
        F.sum("r").cast("long").alias("rank_sum"),
        bcount().alias("n_blocks"),
    )
    tot = per_type.agg(
        F.sum(F.col("rank_sum") * F.col("rank_sum")).cast("long").alias("sr2"),
        F.max("n_blocks").cast("long").alias("n"),
    )
    return (
        per_type.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "rank_sum",
            F.round(
                F.col("rank_sum").cast("double") / F.col("n_blocks"), 6
            ).alias("mean_rank"),
            "n_blocks",
            F.round(
                F.lit(12.0)
                / (F.col("n") * F.lit(float(k * (k + 1))))
                * F.col("sr2")
                - F.lit(3.0) * F.col("n") * F.lit(float(k + 1)),
                6,
            ).alias("q_stat"),
        )
    )


_FRIEDMAN_SQL = f"""
WITH cells AS (
  SELECT user_id, event_type,
         CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / COUNT(value)
           AS m
  FROM events GROUP BY user_id, event_type),
complete AS (
  SELECT user_id FROM cells GROUP BY user_id
  HAVING COUNT(*) = {len(EVENT_TYPES)}),
ranked AS (
  SELECT c.user_id, c.event_type,
         ROW_NUMBER() OVER (PARTITION BY c.user_id
                            ORDER BY c.m, c.event_type) AS r
  FROM cells c JOIN complete USING (user_id)),
per_type AS (
  SELECT event_type,
         CAST(SUM(r) AS BIGINT) AS rank_sum,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM ranked GROUP BY event_type),
tot AS (
  SELECT CAST(SUM(rank_sum * rank_sum) AS BIGINT) AS sr2,
         CAST(MAX(n_blocks) AS BIGINT) AS n
  FROM per_type)
SELECT event_type, rank_sum,
       round(CAST(rank_sum AS DOUBLE) / n_blocks, 6) AS mean_rank,
       n_blocks,
       round(12.0 / (n * {float(len(EVENT_TYPES) * (len(EVENT_TYPES) + 1))})
             * sr2 - 3.0 * n * {float(len(EVENT_TYPES) + 1)}, 6) AS q_stat
FROM per_type, tot
"""

QUERIES["stat_friedman_test"] = stat_friedman_test
ORACLE["stat_friedman_test"] = _FRIEDMAN_SQL


_TOST_A, _TOST_B = "BUILDING", "MACHINERY"
_TOST_MARGIN = 10.0  # equivalence margin, $K
_TOST_ZCRIT = 1.645  # one-sided alpha=0.05, large-sample normal

# Shared closed-form text over the pivoted one-row moments (n_a, s_a,
# ss_a, n_b, s_b, ss_b), $K scale — same fixed-order discipline as
# stat_welch_anova.
_TOST_SE = (
    "sqrt(((ss_a - s_a * s_a / n_a) / (n_a - 1)) / n_a"
    " + ((ss_b - s_b * s_b / n_b) / (n_b - 1)) / n_b)"
)
_TOST_DIFF = "(s_a / n_a - s_b / n_b)"


def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided t-tests) on mean order
    value between two segments: unlike agg_ab_ttest (which can only
    FAIL to find a difference), TOST positively establishes that the
    means differ by LESS than the margin — the correct readout for
    "these two segments behave the same". t_lower tests diff > -δ,
    t_upper tests diff < +δ; equivalence holds iff BOTH exceed the
    one-sided critical value (large-sample z ≈ 1.645). Welch SE from
    one pivoted pass of exact decimal moments; every float in one
    shared fixed-order expression."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice") / 1000.0).alias("x"),
        )
    )
    dec = "decimal(38,10)"
    aggs = []
    for tag, s in (("a", _TOST_A), ("b", _TOST_B)):
        cond = F.col("seg") == s
        aggs += [
            F.count(F.when(cond, 1)).cast("double").alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("x").cast(dec)))
            .cast("double")
            .alias(f"s_{tag}"),
            F.sum(F.when(cond, (F.col("x") * F.col("x")).cast(dec)))
            .cast("double")
            .alias(f"ss_{tag}"),
        ]
    one = obs.agg(*aggs)
    t_lower = f"(({_TOST_DIFF}) - (-{_TOST_MARGIN})) / ({_TOST_SE})"
    t_upper = f"({_TOST_MARGIN} - ({_TOST_DIFF})) / ({_TOST_SE})"
    return one.select(
        F.round(F.expr(f"s_a / n_a"), 6).alias("mean_a"),
        F.round(F.expr(f"s_b / n_b"), 6).alias("mean_b"),
        F.round(F.expr(_TOST_DIFF), 6).alias("diff"),
        F.round(F.expr(_TOST_SE), 6).alias("se"),
        F.round(F.expr(t_lower), 6).alias("t_lower"),
        F.round(F.expr(t_upper), 6).alias("t_upper"),
        (
            (F.expr(t_lower) > _TOST_ZCRIT) & (F.expr(t_upper) > _TOST_ZCRIT)
        )
        .cast("long")
        .alias("equivalent"),
    )


def _tost_sql() -> str:
    cols = []
    for tag, s in (("a", _TOST_A), ("b", _TOST_B)):
        cols += [
            f"CAST(COUNT(*) FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE)"
            f" AS n_{tag}",
            f"CAST(SUM(CAST(o_totalprice / 1000.0 AS DECIMAL(38,10)))"
            f" FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE) AS s_{tag}",
            f"CAST(SUM(CAST((o_totalprice / 1000.0) * (o_totalprice / 1000.0)"
            f" AS DECIMAL(38,10)))"
            f" FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE) AS ss_{tag}",
        ]
    t_lower = f"(({_TOST_DIFF}) - (-{_TOST_MARGIN})) / ({_TOST_SE})"
    t_upper = f"({_TOST_MARGIN} - ({_TOST_DIFF})) / ({_TOST_SE})"
    return f"""
WITH one AS (
  SELECT {', '.join(cols)}
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT round(s_a / n_a, 6) AS mean_a,
       round(s_b / n_b, 6) AS mean_b,
       round({_TOST_DIFF}, 6) AS diff,
       round({_TOST_SE}, 6) AS se,
       round({t_lower}, 6) AS t_lower,
       round({t_upper}, 6) AS t_upper,
       CAST(CASE WHEN ({t_lower}) > {_TOST_ZCRIT}
                  AND ({t_upper}) > {_TOST_ZCRIT}
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
FROM one
"""


QUERIES["stat_tost_equivalence"] = stat_tost_equivalence
ORACLE["stat_tost_equivalence"] = _tost_sql()


_DID_TREAT = "BUILDING"  # treated segment
_DID_CTRL = "MACHINERY"  # control segment
_DID_SPLIT = "1998-01-01"  # promo-era cutover

# Shared closed-form text over the four pivoted cell moments
# (n/s/ss per {t,c}x{pre,post}), $K scale.
_DID_CELL = "{g}_{p}"


def stat_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on mean order value: treated segment
    (BUILDING) vs control (MACHINERY), pre vs post the 1998 cutover —
    DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre), the canonical
    quasi-experimental estimator when randomization isn't available
    (stat_cuped_adjust reduces variance WITHIN an experiment; DiD
    substitutes for one). The large-sample SE comes from the four cell
    variances; everything is one pivoted pass of exact decimal moments
    and a fixed-order expression tree (stat_welch_anova discipline)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_mktsegment").isin(_DID_TREAT, _DID_CTRL))
        .select(
            F.when(F.col("c_mktsegment") == _DID_TREAT, "t")
            .otherwise("c")
            .alias("g"),
            F.when(
                F.col("o_orderdate") >= F.lit(_DID_SPLIT).cast("timestamp"),
                "post",
            )
            .otherwise("pre")
            .alias("p"),
            (F.col("o_totalprice") / 1000.0).alias("x"),
        )
    )
    dec = "decimal(38,10)"
    aggs = []
    for g in ("t", "c"):
        for p in ("pre", "post"):
            cond = (F.col("g") == g) & (F.col("p") == p)
            tag = f"{g}_{p}"
            aggs += [
                F.count(F.when(cond, 1)).cast("double").alias(f"n_{tag}"),
                F.sum(F.when(cond, F.col("x").cast(dec)))
                .cast("double")
                .alias(f"s_{tag}"),
                F.sum(F.when(cond, (F.col("x") * F.col("x")).cast(dec)))
                .cast("double")
                .alias(f"ss_{tag}"),
            ]
    one = obs.agg(*aggs)
    mean = {t: f"(s_{t} / n_{t})" for t in ("t_pre", "t_post", "c_pre", "c_post")}
    var_over_n = {
        t: f"(((ss_{t} - s_{t} * s_{t} / n_{t}) / (n_{t} - 1)) / n_{t})"
        for t in mean
    }
    did = (
        f"(({mean['t_post']} - {mean['t_pre']})"
        f" - ({mean['c_post']} - {mean['c_pre']}))"
    )
    se = (
        "sqrt("
        + " + ".join(var_over_n[t] for t in ("t_pre", "t_post", "c_pre", "c_post"))
        + ")"
    )
    return one.select(
        F.round(F.expr(mean["t_pre"]), 6).alias("treat_pre"),
        F.round(F.expr(mean["t_post"]), 6).alias("treat_post"),
        F.round(F.expr(mean["c_pre"]), 6).alias("ctrl_pre"),
        F.round(F.expr(mean["c_post"]), 6).alias("ctrl_post"),
        F.round(F.expr(did), 6).alias("did"),
        F.round(F.expr(se), 6).alias("se"),
        F.round(F.expr(f"({did}) / ({se})"), 6).alias("z_stat"),
    )


def _did_sql() -> str:
    cols = []
    for g, seg in (("t", _DID_TREAT), ("c", _DID_CTRL)):
        for p, op in (("pre", "<"), ("post", ">=")):
            tag = f"{g}_{p}"
            cond = (
                f"c_mktsegment = '{seg}' AND CAST(o_orderdate AS TIMESTAMP)"
                f" {op} TIMESTAMP '{_DID_SPLIT} 00:00:00'"
            )
            cols += [
                f"CAST(COUNT(*) FILTER (WHERE {cond}) AS DOUBLE) AS n_{tag}",
                f"CAST(SUM(CAST(o_totalprice / 1000.0 AS DECIMAL(38,10)))"
                f" FILTER (WHERE {cond}) AS DOUBLE) AS s_{tag}",
                f"CAST(SUM(CAST((o_totalprice / 1000.0) * (o_totalprice"
                f" / 1000.0) AS DECIMAL(38,10)))"
                f" FILTER (WHERE {cond}) AS DOUBLE) AS ss_{tag}",
            ]
    mean = {t: f"(s_{t} / n_{t})" for t in ("t_pre", "t_post", "c_pre", "c_post")}
    var_over_n = {
        t: f"(((ss_{t} - s_{t} * s_{t} / n_{t}) / (n_{t} - 1)) / n_{t})"
        for t in mean
    }
    did = (
        f"(({mean['t_post']} - {mean['t_pre']})"
        f" - ({mean['c_post']} - {mean['c_pre']}))"
    )
    se = (
        "sqrt("
        + " + ".join(var_over_n[t] for t in ("t_pre", "t_post", "c_pre", "c_post"))
        + ")"
    )
    return f"""
WITH one AS (
  SELECT {', '.join(cols)}
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{_DID_TREAT}', '{_DID_CTRL}'))
SELECT round({mean['t_pre']}, 6) AS treat_pre,
       round({mean['t_post']}, 6) AS treat_post,
       round({mean['c_pre']}, 6) AS ctrl_pre,
       round({mean['c_post']}, 6) AS ctrl_post,
       round({did}, 6) AS did,
       round({se}, 6) AS se,
       round(({did}) / ({se}), 6) AS z_stat
FROM one
"""


QUERIES["stat_diff_in_diff"] = stat_diff_in_diff
ORACLE["stat_diff_in_diff"] = _did_sql()
