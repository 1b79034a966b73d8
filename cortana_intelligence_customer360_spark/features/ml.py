"""Model-ready encodings + the scoring pipeline (SURVEY.md §2.8 tail).

The reference solution's enrichment model is an offline-trained
multiclass classifier scored in batch over the engineered profile
(SURVEY.md §1.1/§3.1 [UPSTREAM, recalled]). Re-expressed with
pyspark.ml: Pipeline(VectorAssembler -> RandomForestClassifier), seeded
for determinism, trained on the per-user dominant event type and scored
over every customer profile row.

feat_onehot_bucketize is the pure-SQL (oracle-checkable) encoding;
feat_onehot_mllib is the same surface through MLlib transformers
(R-tier: vector outputs are not SQL-comparable, so it registers
rows-only and tests assert the encoding widths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount, dsum, dsum_sql
from ..sources.tables import EVENT_TYPES, MKT_SEGMENTS, load_table
from .core import profile_frame

FEATURE_COLS = [
    "c_acctbal",
    "recency_days",
    "frequency",
    "monetary",
    *[f"n_{t}" for t in EVENT_TYPES],
]


def feat_onehot_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-ready columns without MLlib: explicit one-hot per segment
    (the column set is a fixed contract, sources.tables.MKT_SEGMENTS)
    plus deterministic quartile buckets of balance (ntile with key
    tiebreak)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    onehots = [
        F.when(F.col("c_mktsegment") == s, 1).otherwise(0).cast("long").alias(
            f"seg_{s.lower()}"
        )
        for s in MKT_SEGMENTS
    ]
    return cust.select(
        "c_custkey",
        *onehots,
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


def _onehot_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS BIGINT) AS seg_{s.lower()}"
        for s in MKT_SEGMENTS
    )
    return f"""
SELECT c_custkey,
       {cols},
       CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bal_quartile
FROM customer
"""


def feat_onehot_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same encoding through MLlib transformers (StringIndexer +
    OneHotEncoder + QuantileDiscretizer) - the reference's
    'MLlib pipeline + DataFrame feature engineering' approach. Vector
    output is flattened through vector_to_array and stringified."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, QuantileDiscretizer, StringIndexer
    from pyspark.ml.functions import vector_to_array

    cust = load_table(spark, sf_dir, "customer")
    pipe = Pipeline(
        stages=[
            StringIndexer(
                inputCol="c_mktsegment", outputCol="seg_idx", stringOrderType="alphabetAsc"
            ),
            OneHotEncoder(inputCol="seg_idx", outputCol="seg_vec", dropLast=False),
            QuantileDiscretizer(
                inputCol="c_acctbal", outputCol="bal_bucket", numBuckets=4, relativeError=0.0
            ),
        ]
    )
    out = pipe.fit(cust).transform(cust)
    return out.select(
        "c_custkey",
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.array_join(
            F.transform(vector_to_array("seg_vec"), lambda x: x.cast("int").cast("string")),
            "",
        ).alias("seg_onehot"),
        F.col("bal_bucket").cast("long").alias("bal_bucket"),
    )


def _label_frame(events: DataFrame) -> DataFrame:
    """Per-user dominant event type (ties by event_type name) - the
    'next-purchase affinity' training label."""
    counts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("label_type"))
    )


def build_scoring_pipeline(seed: int = 42):
    """Assembler + seeded RandomForest over the profile feature block."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    return Pipeline(
        stages=[
            StringIndexer(
                inputCol="label_type",
                outputCol="label",
                stringOrderType="alphabetAsc",
                handleInvalid="keep",  # scoring set may carry labels absent from a small train split
            ),
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="features"),
            RandomForestClassifier(
                labelCol="label",
                featuresCol="features",
                numTrees=20,
                maxDepth=6,
                seed=seed,
            ),
        ]
    )


def ml_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on users that have events (10% of customers), score every
    customer profile. R-tier: model output has no SQL oracle; tests
    assert accuracy > majority-class baseline and save/load roundtrip."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    # localCheckpoint: the profile join chain is scanned by the
    # StringIndexer fit, the RF fit, AND the final scoring transform —
    # materialize it once (same rows, same layout, so the seeded fit
    # and predictions are unchanged).
    profile = profile_frame(customer, orders, events, nation).localCheckpoint()
    labels = _label_frame(events)
    train = profile.join(labels, profile.c_custkey == labels.user_id)
    model = build_scoring_pipeline().fit(train)
    scored = model.transform(
        profile.withColumn("label_type", F.lit("click"))  # dummy for indexer
    )
    return scored.select(
        "c_custkey",
        F.col("prediction").cast("long").alias("predicted_class"),
    )


def ml_linreg_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS per segment — linear regression trained the way
    it actually scales: ONE partial-aggregable pass accumulating the
    exact sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² as
    DECIMAL(30,6) — order-free, map-side-combinable), then
    slope/intercept/R² by arithmetic on the driver-size result. No
    iteration, no MLlib, no Python — and unlike gradient descent the
    answer is bit-reproducible, which is why this is the full-oracle
    ML entry (ml_train_score's RF stays the R-tier one).

    Fit: l_extendedprice ~ l_quantity within each l_returnflag.
    DECIMAL(30,6) bounds: Σy² terms are ~1e10; headroom to ~1e23 rows
    per group before precision-38 sum overflow — beyond any real SF.
    The final slope arithmetic runs in doubles from identical exact
    sums on both engines, so r6 emission hashes exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    g = li.groupBy("l_returnflag").agg(
        bcount().alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / varx_n
    return g.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "intercept"
        ),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias("r2"),
    ).orderBy("l_returnflag")


_LINREG_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity * l_extendedprice')} AS sxy,
         {dsum_sql('l_quantity * l_quantity')} AS sxx,
         {dsum_sql('l_extendedprice * l_extendedprice')} AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
ORDER BY l_returnflag
"""


def ml_ate_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect estimate — the causal-ish
    uplift table a Customer-360 team builds before an A/B test exists:
    treatment = "user ever signed up", outcome = total purchase value,
    stratified on an activity bucket (the observed confounder). Per
    stratum: propensity, treated/control outcome means, and the
    stratum's ATE term (n_b/N · mean-difference) — summing the terms
    gives the classic stratification estimator, equivalent to IPW with
    a discrete propensity.

    Scale: one user-level aggregate (shuffle moves a row per user),
    then a ≤10-row stratum aggregate; the grand total rides a window
    over those 10 rows. All float paths are exact decimal sums divided
    by exact counts — identical IEEE on both engines (compat rule 1)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        bcount().alias("n_ev"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        )
        .cast("long")
        .alias("treated"),
        dsum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0)
        ).alias("y"),
    )
    strata = (
        users.withColumn(
            "bucket", F.least(F.expr("n_ev DIV 5"), F.lit(9)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            bcount().alias("n_users"),
            F.sum("treated").cast("long").alias("n_treated"),
            dsum(F.when(F.col("treated") == 1, F.col("y"))).alias("sum_y_t"),
            dsum(F.when(F.col("treated") == 0, F.col("y"))).alias("sum_y_c"),
        )
    )
    w = Window.partitionBy()
    n_ctrl = F.col("n_users") - F.col("n_treated")
    ybar_t = F.when(
        F.col("n_treated") > 0, F.col("sum_y_t") / F.col("n_treated")
    )
    ybar_c = F.when(n_ctrl > 0, F.col("sum_y_c") / n_ctrl)
    return strata.withColumn("n_total", F.sum("n_users").over(w)).select(
        "bucket",
        "n_users",
        "n_treated",
        F.round(F.col("n_treated") / F.col("n_users"), 6).alias("propensity"),
        F.round(ybar_t, 6).alias("ybar_treated"),
        F.round(ybar_c, 6).alias("ybar_control"),
        F.round(
            (F.col("n_users") / F.col("n_total")) * (ybar_t - ybar_c), 6
        ).alias("ate_term"),
    )


_ATE_SQL = f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS treated,
         {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY user_id),
s AS (
  SELECT CAST(least(n_ev // 5, 9) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(treated) AS BIGINT) AS n_treated,
         CAST(SUM(CAST(CASE WHEN treated = 1 THEN y END AS DECIMAL(30,6)))
              AS DOUBLE) AS sum_y_t,
         CAST(SUM(CAST(CASE WHEN treated = 0 THEN y END AS DECIMAL(30,6)))
              AS DOUBLE) AS sum_y_c
  FROM u GROUP BY 1),
t AS (SELECT s.*, SUM(n_users) OVER () AS n_total FROM s)
SELECT bucket, n_users, n_treated,
       round(n_treated / n_users, 6) AS propensity,
       round(CASE WHEN n_treated > 0 THEN sum_y_t / n_treated END, 6)
         AS ybar_treated,
       round(CASE WHEN n_users - n_treated > 0
                  THEN sum_y_c / (n_users - n_treated) END, 6)
         AS ybar_control,
       round((n_users / n_total)
             * (CASE WHEN n_treated > 0 THEN sum_y_t / n_treated END
                - CASE WHEN n_users - n_treated > 0
                       THEN sum_y_c / (n_users - n_treated) END), 6)
         AS ate_term
FROM t
"""


def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes, trained and scored entirely as
    relational aggregates — no MLlib, no iteration, full DuckDB
    oracle. Class = c_mktsegment, features = the user's event-type
    count vector, deterministic train/test split on user_id % 5.

    Laplace-smoothed log-likelihoods ln((n_ct+1)/(n_c+V)) and log
    priors are rounded to 6 dp at the TERM level (the repo's libm
    discipline — see text_unigram_logprob), so the per-(user, class)
    decimal sum is exact and order-independent, and the argmax
    (score desc, segment asc tiebreak) is bit-stable across engines.

    Scale posture: the model (|segments| x |event types| + priors,
    ~35 rows) is broadcast; scoring is one shuffle keyed by
    (user, class) with map-side combine, then a per-user window over
    |classes| rows. Events never move twice; the 100 TB cost is the
    one groupBy(user_id, event_type)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("seg"),
    )
    # Materialized once: train stats, the prior, AND test scoring all
    # read this frame — without the checkpoint the events join would
    # re-execute four times (the plan-audit finding that motivated the
    # same fix in feat_audience_overlap).
    counts = (
        ev.join(cust, "user_id")
        .groupBy("user_id", "seg", "event_type")
        .agg(bcount().alias("n_ut"))
        .localCheckpoint()
    )
    is_test = F.col("user_id") % 5 == 0
    train = counts.where(~is_test)
    test = counts.where(is_test)

    # --- model: priors + smoothed per-class token log-likelihoods ---
    v = train.select("event_type").distinct().count()  # vocabulary size
    class_tok = train.groupBy("seg", "event_type").agg(
        F.sum("n_ut").cast("long").alias("n_ct")
    )
    class_tot = class_tok.groupBy("seg").agg(
        F.sum("n_ct").cast("long").alias("n_c")
    )
    loglik = (
        class_tok.join(class_tot, "seg")
        .select(
            F.col("seg").alias("cls"),
            "event_type",
            F.round(
                F.log(
                    (F.col("n_ct") + 1).cast("double")
                    / (F.col("n_c") + F.lit(v)).cast("double")
                ),
                6,
            ).alias("ll"),
        )
    )
    tr_users = train.select("user_id", "seg").distinct()
    n_train = tr_users.count()
    prior = tr_users.groupBy("seg").agg(
        F.round(
            F.log(bcount().cast("double") / F.lit(float(n_train))), 6
        ).alias("log_prior")
    ).select(F.col("seg").alias("cls"), "log_prior")

    # --- score: test token counts x every class's log-likelihood ---
    terms = test.join(F.broadcast(loglik), "event_type").select(
        "user_id",
        F.col("seg").alias("actual"),
        "cls",
        (F.col("n_ut") * F.col("ll").cast(_DEC)).alias("term"),
    )
    scores = (
        terms.groupBy("user_id", "actual", "cls")
        .agg(F.sum("term").cast("double").alias("sum_ll"))
        .join(F.broadcast(prior), "cls")
        .select(
            "user_id",
            "actual",
            "cls",
            F.round(F.col("sum_ll") + F.col("log_prior"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("cls").alias("predicted"),
            "actual",
            "score",
            (F.col("cls") == F.col("actual")).alias("hit"),
        )
    )


_NB_SQL = """
WITH counts AS (
  SELECT e.user_id, c.c_mktsegment AS seg, e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_ut
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2, 3),
train AS (SELECT * FROM counts WHERE user_id % 5 <> 0),
test AS (SELECT * FROM counts WHERE user_id % 5 = 0),
v AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS v FROM train),
ct AS (
  SELECT seg AS cls, event_type, CAST(SUM(n_ut) AS BIGINT) AS n_ct
  FROM train GROUP BY 1, 2),
tot AS (SELECT cls, CAST(SUM(n_ct) AS BIGINT) AS n_c FROM ct GROUP BY 1),
loglik AS (
  SELECT ct.cls, ct.event_type,
         round(ln(CAST(n_ct + 1 AS DOUBLE) / CAST(n_c + v.v AS DOUBLE)), 6)
           AS ll
  FROM ct JOIN tot USING (cls) CROSS JOIN v),
tru AS (SELECT DISTINCT user_id, seg FROM train),
prior AS (
  SELECT seg AS cls,
         round(ln(CAST(COUNT(*) AS DOUBLE)
                  / (SELECT CAST(COUNT(*) AS DOUBLE) FROM tru)), 6)
           AS log_prior
  FROM tru GROUP BY 1),
terms AS (
  SELECT t.user_id, t.seg AS actual, l.cls,
         t.n_ut * CAST(l.ll AS DECIMAL(30,6)) AS term
  FROM test t JOIN loglik l USING (event_type)),
scores AS (
  SELECT user_id, actual, cls,
         round(CAST(SUM(term) AS DOUBLE) + ANY_VALUE(p.log_prior), 6)
           AS score
  FROM terms JOIN prior p USING (cls)
  GROUP BY user_id, actual, cls),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY score DESC, cls ASC) AS rk
  FROM scores)
SELECT user_id, cls AS predicted, actual, score,
       cls = actual AS hit
FROM ranked WHERE rk = 1
"""


QUERIES = {
    "ml_naive_bayes": ml_naive_bayes,
    "feat_onehot_bucketize": feat_onehot_bucketize,
    "feat_onehot_mllib": feat_onehot_mllib,
    "ml_ate_stratified": ml_ate_stratified,
    "ml_linreg_closed_form": ml_linreg_closed_form,
    "ml_train_score": ml_train_score,
}

ORACLE = {
    "ml_naive_bayes": _NB_SQL,
    "feat_onehot_bucketize": _onehot_sql(),
    "ml_ate_stratified": _ATE_SQL,
    "ml_linreg_closed_form": _LINREG_SQL,
    # feat_onehot_mllib, ml_train_score: R-tier (MLlib outputs).
}


# ---------------------------------------------------------------------------
# Exact decision stump (round 4): the best single split — the CART/
# boosting building block — found by exhaustive threshold search with
# exact integer sufficient statistics.


def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best gini split per feature for predicting returned lineitems
    (l_returnflag = 'R'), over three integerized features: quantity,
    discount (cents), tax (cents).

    Exactness discipline: all candidate-split statistics (pos/neg
    counts left and right of each threshold) are exact BIGINT prefix
    sums over ONE per-(feature, value) aggregate — integerizing the
    features first keeps the candidate-threshold table tiny (~70 rows
    total) regardless of data volume, which is precisely how you'd bin
    continuous features for a stump at 100 TB. The split criterion
    maximizes sum_side (pos^2 + neg^2)/n_side (equivalent to minimizing
    weighted gini); each score is two IEEE divisions and one add on
    identical exact-integer operands in both engines, so the argmax is
    bit-deterministic. Ties break toward the smaller threshold.

    Scale shape: one lineitem scan, a 3x stack fan-out, one hash
    aggregate down to feature-value cardinality; everything after is
    window work on ~70 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    fv = li.select(
        F.expr(
            "stack(3, 'quantity', qty, 'discount_c', disc_c, 'tax_c', tax_c)"
        ).alias("feature", "value"),
        "y",
    )
    agg = fv.groupBy("feature", "value").agg(
        F.sum("y").cast("long").alias("pos"),
        (bcount() - F.sum("y")).cast("long").alias("neg"),
    )
    w = Window.partitionBy("feature").orderBy("value")
    tot = Window.partitionBy("feature")
    cand = agg.select(
        "feature",
        F.col("value").alias("threshold"),
        F.sum("pos").over(w).alias("pos_l"),
        F.sum("neg").over(w).alias("neg_l"),
        (F.sum("pos").over(tot) - F.sum("pos").over(w)).alias("pos_r"),
        (F.sum("neg").over(tot) - F.sum("neg").over(w)).alias("neg_r"),
    ).where((F.col("pos_r") + F.col("neg_r")) > 0)
    n_l = (F.col("pos_l") + F.col("neg_l")).cast("double")
    n_r = (F.col("pos_r") + F.col("neg_r")).cast("double")
    score = (
        (F.col("pos_l") * F.col("pos_l") + F.col("neg_l") * F.col("neg_l")).cast("double") / n_l
        + (F.col("pos_r") * F.col("pos_r") + F.col("neg_r") * F.col("neg_r")).cast("double") / n_r
    )
    scored = cand.withColumn("score", score)
    best = Window.partitionBy("feature").orderBy(
        F.col("score").desc(), F.col("threshold").asc()
    )
    per_feat = (
        scored.withColumn("rk", F.row_number().over(best))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    top = Window.partitionBy().orderBy(F.col("score").desc(), F.col("feature").asc())
    return per_feat.select(
        "feature",
        "threshold",
        (F.col("pos_l") + F.col("neg_l")).cast("long").alias("n_left"),
        (F.col("pos_r") + F.col("neg_r")).cast("long").alias("n_right"),
        F.round("score", 6).alias("score_r"),
        (F.row_number().over(top) == 1).alias("is_best"),
    )


_STUMP_SQL = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_c,
         CAST(l_returnflag = 'R' AS BIGINT) AS y
  FROM lineitem),
fv AS (
  SELECT 'quantity' AS feature, qty AS value, y FROM li
  UNION ALL SELECT 'discount_c', disc_c, y FROM li
  UNION ALL SELECT 'tax_c', tax_c, y FROM li),
agg AS (
  SELECT feature, value,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
  FROM fv GROUP BY feature, value),
cand AS (
  SELECT feature, value AS threshold,
         SUM(pos) OVER (PARTITION BY feature ORDER BY value) AS pos_l,
         SUM(neg) OVER (PARTITION BY feature ORDER BY value) AS neg_l,
         SUM(pos) OVER (PARTITION BY feature)
           - SUM(pos) OVER (PARTITION BY feature ORDER BY value) AS pos_r,
         SUM(neg) OVER (PARTITION BY feature)
           - SUM(neg) OVER (PARTITION BY feature ORDER BY value) AS neg_r
  FROM agg),
scored AS (
  SELECT *, CAST(pos_l*pos_l + neg_l*neg_l AS DOUBLE)
              / CAST(pos_l + neg_l AS DOUBLE)
          + CAST(pos_r*pos_r + neg_r*neg_r AS DOUBLE)
              / CAST(pos_r + neg_r AS DOUBLE) AS score
  FROM cand WHERE pos_r + neg_r > 0),
per_feat AS (
  SELECT *, row_number() OVER (PARTITION BY feature
                               ORDER BY score DESC, threshold ASC) AS rk
  FROM scored)
SELECT feature, threshold,
       CAST(pos_l + neg_l AS BIGINT) AS n_left,
       CAST(pos_r + neg_r AS BIGINT) AS n_right,
       round(score, 6) AS score_r,
       row_number() OVER (ORDER BY score DESC, feature ASC) = 1 AS is_best
FROM per_feat WHERE rk = 1
"""

QUERIES["ml_decision_stump"] = ml_decision_stump
ORACLE["ml_decision_stump"] = _STUMP_SQL


# ---------------------------------------------------------------------------
# IPW average treatment effect (round 4): the inverse-propensity twin
# of ml_ate_stratified — same treatment/outcome/confounder frame, the
# Horvitz-Thompson and Hajek weighted estimators instead of the
# stratification sum.


def feat_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE with a discrete (bucketed)
    propensity: treatment = "user's FIRST event (by event_id, a total
    order) was a click" — the acquired-via-ad-click cohort; outcome =
    purchase value; propensity e(b) = treated share of the user's
    activity bucket. ("Ever signed up", the stratified op's treatment,
    saturates on this fixture — every sf0.01 user signs up eventually —
    which leaves IPW with an empty control arm; first-touch acquisition
    splits 27/123 there.)

    The key exactness move: e(b) is CONSTANT within a bucket, so the
    per-user weighted sums factor — sum_i T_i y_i / e(b_i) =
    sum_buckets (n_users_b / n_treated_b) * sum_y_treated_b — and the
    user-level pass never computes a float weight at all. Each bucket
    term is one multiply-divide on exact operands, quantized to 6 dp
    DECIMAL before the cross-bucket sum (order-independent, the
    pagerank discipline), so both engines produce identical bits.
    Hajek normalizers collapse the same way: sum_i T_i/e(b_i) =
    sum_buckets n_users_b over buckets with a treated user. Scale: one
    user-level aggregate, then arithmetic on <= 10 bucket rows."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        bcount().alias("n_ev"),
        (F.min_by("event_type", "event_id") == "click").cast("long").alias("treated"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("y"),
    )
    b = users.withColumn(
        "bucket", F.least(F.expr("n_ev DIV 5"), F.lit(9)).cast("long")
    ).groupBy("bucket").agg(
        bcount().alias("n_users"),
        F.sum("treated").cast("long").alias("n_treated"),
        dsum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0.0)).alias("sum_y_t"),
        dsum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0.0)).alias("sum_y_c"),
    )
    n_ctrl = F.col("n_users") - F.col("n_treated")
    term_t = F.when(
        F.col("n_treated") > 0,
        F.round(
            F.col("sum_y_t") * F.col("n_users").cast("double") / F.col("n_treated").cast("double"),
            6,
        ),
    ).otherwise(0.0)
    term_c = F.when(
        n_ctrl > 0,
        F.round(F.col("sum_y_c") * F.col("n_users").cast("double") / n_ctrl.cast("double"), 6),
    ).otherwise(0.0)
    terms = b.select(
        "bucket",
        "n_users",
        "n_treated",
        term_t.cast(_DEC).alias("wt"),
        term_c.cast(_DEC).alias("wc"),
        F.when(F.col("n_treated") > 0, F.col("n_users")).otherwise(0).cast("long").alias("den_t"),
        F.when(n_ctrl > 0, F.col("n_users")).otherwise(0).cast("long").alias("den_c"),
    )
    agg = terms.groupBy().agg(
        F.sum("n_users").cast("long").alias("n_total"),
        F.sum("wt").cast("double").alias("sw_t"),
        F.sum("wc").cast("double").alias("sw_c"),
        F.sum("den_t").cast("long").alias("d_t"),
        F.sum("den_c").cast("long").alias("d_c"),
    )
    mu_t = F.col("sw_t") / F.col("d_t").cast("double")
    mu_c = F.col("sw_c") / F.col("d_c").cast("double")
    return agg.select(
        "n_total",
        F.round(mu_t, 6).alias("mu_treated_hajek"),
        F.round(mu_c, 6).alias("mu_control_hajek"),
        F.round(mu_t - mu_c, 6).alias("ate_hajek"),
        F.round(
            F.col("sw_t") / F.col("n_total").cast("double")
            - F.col("sw_c") / F.col("n_total").cast("double"),
            6,
        ).alias("ate_ht"),
    )


_IPW_SQL = f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         CAST(arg_min(event_type, event_id) = 'click' AS BIGINT) AS treated,
         {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY user_id),
b AS (
  SELECT CAST(least(n_ev // 5, 9) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(treated) AS BIGINT) AS n_treated,
         {dsum_sql("CASE WHEN treated = 1 THEN y ELSE 0.0 END")} AS sum_y_t,
         {dsum_sql("CASE WHEN treated = 0 THEN y ELSE 0.0 END")} AS sum_y_c
  FROM u GROUP BY 1),
terms AS (
  SELECT bucket, n_users, n_treated,
         CAST(CASE WHEN n_treated > 0
              THEN round(sum_y_t * CAST(n_users AS DOUBLE)
                         / CAST(n_treated AS DOUBLE), 6)
              ELSE 0.0 END AS DECIMAL(30,6)) AS wt,
         CAST(CASE WHEN n_users - n_treated > 0
              THEN round(sum_y_c * CAST(n_users AS DOUBLE)
                         / CAST(n_users - n_treated AS DOUBLE), 6)
              ELSE 0.0 END AS DECIMAL(30,6)) AS wc,
         CAST(CASE WHEN n_treated > 0 THEN n_users ELSE 0 END AS BIGINT) AS den_t,
         CAST(CASE WHEN n_users - n_treated > 0 THEN n_users ELSE 0 END
              AS BIGINT) AS den_c
  FROM b),
agg AS (
  SELECT CAST(SUM(n_users) AS BIGINT) AS n_total,
         CAST(SUM(wt) AS DOUBLE) AS sw_t,
         CAST(SUM(wc) AS DOUBLE) AS sw_c,
         CAST(SUM(den_t) AS BIGINT) AS d_t,
         CAST(SUM(den_c) AS BIGINT) AS d_c
  FROM terms)
SELECT n_total,
       round(sw_t / CAST(d_t AS DOUBLE), 6) AS mu_treated_hajek,
       round(sw_c / CAST(d_c AS DOUBLE), 6) AS mu_control_hajek,
       round(sw_t / CAST(d_t AS DOUBLE) - sw_c / CAST(d_c AS DOUBLE), 6)
         AS ate_hajek,
       round(sw_t / CAST(n_total AS DOUBLE) - sw_c / CAST(n_total AS DOUBLE), 6)
         AS ate_ht
FROM agg
"""

QUERIES["feat_ipw_ate"] = feat_ipw_ate
ORACLE["feat_ipw_ate"] = _IPW_SQL


# ---------------------------------------------------------------------------
# Gradient-boosted stumps (round 4): TWO boosting rounds of exact
# regression stumps on squared loss — the minimal real GBM, distributed
# the way XGBoost actually distributes it (per-feature-value gradient
# histograms, argmax split, broadcast model back).


def _stump_stats(rows: DataFrame, resid_col: str) -> DataFrame:
    """Per-candidate-split prefix stats for a regression stump on
    ``resid_col``: for every (feature, threshold), exact BIGINT counts
    and DECIMAL residual sums left/right. One stack fan-out + one hash
    aggregate (collapses to feature-value cardinality via map-side
    combine), then windows over ~70 rows."""
    fv = rows.select(
        F.expr(
            "stack(3, 'quantity', qty, 'discount_c', disc_c, 'tax_c', tax_c)"
        ).alias("feature", "value"),
        F.col(resid_col).alias("r"),
    )
    agg = fv.groupBy("feature", "value").agg(
        bcount().alias("n"),
        F.sum(F.col("r").cast(_DEC)).alias("s"),
    )
    w = Window.partitionBy("feature").orderBy("value")
    tot = Window.partitionBy("feature")
    return agg.select(
        "feature",
        F.col("value").alias("threshold"),
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("s").over(w).cast("double").alias("s_l"),
        (F.sum("n").over(tot) - F.sum("n").over(w)).cast("long").alias("n_r"),
        (F.sum("s").over(tot) - F.sum("s").over(w)).cast("double").alias("s_r"),
    ).where(F.col("n_r") > 0)


def _stump_best(cand: DataFrame) -> DataFrame:
    """argmax of the variance-reduction score s_l^2/n_l + s_r^2/n_r
    (exact-decimal sums cast once to double; identical single-op
    expression in the oracle). Ties: smaller feature name, then
    smaller threshold."""
    score = (
        F.col("s_l") * F.col("s_l") / F.col("n_l").cast("double")
        + F.col("s_r") * F.col("s_r") / F.col("n_r").cast("double")
    )
    w = Window.partitionBy().orderBy(
        score.desc(), F.col("feature").asc(), F.col("threshold").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "feature",
            "threshold",
            (F.col("s_l") / F.col("n_l").cast("double")).alias("gamma_l"),
            (F.col("s_r") / F.col("n_r").cast("double")).alias("gamma_r"),
            score.alias("score"),
            "n_l",
            "n_r",
        )
    )


def _leaf_gamma(best_prefix: str) -> "F.Column":
    fval = (
        F.when(F.col(f"{best_prefix}feature") == "quantity", F.col("qty"))
        .when(F.col(f"{best_prefix}feature") == "discount_c", F.col("disc_c"))
        .otherwise(F.col("tax_c"))
    )
    return F.when(
        fval <= F.col(f"{best_prefix}threshold"), F.col(f"{best_prefix}gamma_l")
    ).otherwise(F.col(f"{best_prefix}gamma_r"))


def ml_gbm_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two boosting rounds predicting l_extendedprice from (quantity,
    discount cents, tax cents): F0 = global mean, then each round fits
    a regression stump to the current residuals and steps with
    learning rate 1. Emits one row per round (chosen split, leaf
    values, score) plus a final row with the DECIMAL-quantized SSE of
    the boosted model — the training-loss audit.

    Model scalars (F0, each round's split) travel as broadcast 1-row
    cross-joins, never a driver collect, so the whole model fit is one
    lazy plan: scan -> histogram -> argmax -> broadcast back, twice.
    Residual sums are DECIMAL-exact; every division is a single IEEE
    op on identical operands in both engines; per-row squared errors
    are quantized to DECIMAL(30,6) before the final sum (the pagerank
    discipline) so the SSE is order-independent."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
        F.col("l_extendedprice").alias("y"),
    )
    f0 = li.groupBy().agg(
        (dsum("y") / bcount().cast("double")).alias("f0")
    )
    # Checkpoint each residual frame: it feeds BOTH the next round's
    # histogram and the later residual update, and without a
    # materialization the lineage re-reads the parquet + re-broadcasts
    # per consumer (measured 2.6x the wall at the 10x smoke). This is
    # the cache-the-training-frame step every distributed GBM performs.
    r1 = (
        li.join(F.broadcast(f0))
        .withColumn("r1", F.col("y") - F.col("f0"))
        .select("qty", "disc_c", "tax_c", "r1")  # checkpoint only live cols
        .localCheckpoint(eager=False)
    )
    # Each round's 1-row winner is read TWICE (the next round's
    # residual lineage and the final rounds join); without the 1-row
    # checkpoint the whole histogram pass re-runs per consumer
    # (adaboost's one_pass discipline, round 11).
    best1 = _stump_best(_stump_stats(r1, "r1")).select(
        *[F.col(c).alias(f"b1_{c}") for c in
          ("feature", "threshold", "gamma_l", "gamma_r", "score", "n_l", "n_r")]
    ).localCheckpoint()
    r2 = (
        r1.join(F.broadcast(best1))
        .withColumn("r2", F.col("r1") - _leaf_gamma("b1_"))
        .select("qty", "disc_c", "tax_c", "r2")
        .localCheckpoint(eager=False)
    )
    best2 = _stump_best(_stump_stats(r2, "r2")).select(
        *[F.col(c).alias(f"b2_{c}") for c in
          ("feature", "threshold", "gamma_l", "gamma_r", "score", "n_l", "n_r")]
    ).localCheckpoint()
    final = r2.join(F.broadcast(best2)).withColumn(
        "r3", F.col("r2") - _leaf_gamma("b2_")
    )
    sse = final.groupBy().agg(
        dsum(F.col("r3") * F.col("r3")).alias("sse"),
        bcount().alias("n"),
    )
    rounds = best1.join(best2).join(F.broadcast(sse)).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("long").alias("round"),
                    F.col("b1_feature").alias("feature"),
                    F.col("b1_threshold").cast("long").alias("threshold"),
                    F.round("b1_gamma_l", 6).alias("gamma_l"),
                    F.round("b1_gamma_r", 6).alias("gamma_r"),
                    F.col("b1_n_l").alias("n_l"),
                    F.col("b1_n_r").alias("n_r"),
                    F.round("b1_score", 4).alias("score_r"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("round"),
                    F.col("b2_feature").alias("feature"),
                    F.col("b2_threshold").cast("long").alias("threshold"),
                    F.round("b2_gamma_l", 6).alias("gamma_l"),
                    F.round("b2_gamma_r", 6).alias("gamma_r"),
                    F.col("b2_n_l").alias("n_l"),
                    F.col("b2_n_r").alias("n_r"),
                    F.round("b2_score", 4).alias("score_r"),
                ),
                F.struct(
                    F.lit(3).cast("long").alias("round"),
                    F.lit("__sse__").alias("feature"),
                    F.col("n").alias("threshold"),
                    F.lit(None).cast("double").alias("gamma_l"),
                    F.lit(None).cast("double").alias("gamma_r"),
                    F.lit(0).cast("long").alias("n_l"),
                    F.lit(0).cast("long").alias("n_r"),
                    F.round(F.col("sse") / F.lit(1e6), 4).alias("score_r"),
                ),
            )
        ).alias("row")
    ).select("row.*")
    return rounds


def _gbm_sql() -> str:
    stats = """
  SELECT feature, value AS threshold,
         CAST(SUM(n) OVER (PARTITION BY feature ORDER BY value) AS BIGINT)
           AS n_l,
         CAST(SUM(s) OVER (PARTITION BY feature ORDER BY value) AS DOUBLE)
           AS s_l,
         CAST(SUM(n) OVER (PARTITION BY feature)
              - SUM(n) OVER (PARTITION BY feature ORDER BY value) AS BIGINT)
           AS n_r,
         CAST(SUM(s) OVER (PARTITION BY feature)
              - SUM(s) OVER (PARTITION BY feature ORDER BY value) AS DOUBLE)
           AS s_r
  FROM {src}"""
    best = """
  SELECT feature, threshold,
         s_l / CAST(n_l AS DOUBLE) AS gamma_l,
         s_r / CAST(n_r AS DOUBLE) AS gamma_r,
         s_l * s_l / CAST(n_l AS DOUBLE) + s_r * s_r / CAST(n_r AS DOUBLE)
           AS score,
         n_l, n_r,
         row_number() OVER (
           ORDER BY s_l * s_l / CAST(n_l AS DOUBLE)
                    + s_r * s_r / CAST(n_r AS DOUBLE) DESC,
                    feature ASC, threshold ASC) AS rk
  FROM {src} WHERE n_r > 0"""
    return f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_c,
         l_extendedprice AS y
  FROM lineitem),
f0 AS (
  SELECT {dsum_sql('y')} / CAST(COUNT(*) AS DOUBLE) AS f0 FROM li),
r1 AS (SELECT li.*, li.y - f0.f0 AS r1 FROM li, f0),
fv1 AS (
  SELECT 'quantity' AS feature, qty AS value, r1 AS r FROM r1
  UNION ALL SELECT 'discount_c', disc_c, r1 FROM r1
  UNION ALL SELECT 'tax_c', tax_c, r1 FROM r1),
agg1 AS (
  SELECT feature, value, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(r AS DECIMAL(30,6))) AS s
  FROM fv1 GROUP BY feature, value),
cand1 AS ({stats.format(src='agg1')}),
best1 AS (SELECT * FROM ({best.format(src='cand1')}) WHERE rk = 1),
r2 AS (
  SELECT r1.*, r1.r1 - CASE WHEN (CASE b.feature
              WHEN 'quantity' THEN r1.qty
              WHEN 'discount_c' THEN r1.disc_c
              ELSE r1.tax_c END) <= b.threshold
         THEN b.gamma_l ELSE b.gamma_r END AS r2
  FROM r1, best1 b),
fv2 AS (
  SELECT 'quantity' AS feature, qty AS value, r2 AS r FROM r2
  UNION ALL SELECT 'discount_c', disc_c, r2 FROM r2
  UNION ALL SELECT 'tax_c', tax_c, r2 FROM r2),
agg2 AS (
  SELECT feature, value, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(r AS DECIMAL(30,6))) AS s
  FROM fv2 GROUP BY feature, value),
cand2 AS ({stats.format(src='agg2')}),
best2 AS (SELECT * FROM ({best.format(src='cand2')}) WHERE rk = 1),
final AS (
  SELECT r2.r2 - CASE WHEN (CASE b.feature
              WHEN 'quantity' THEN r2.qty
              WHEN 'discount_c' THEN r2.disc_c
              ELSE r2.tax_c END) <= b.threshold
         THEN b.gamma_l ELSE b.gamma_r END AS r3
  FROM r2, best2 b),
sse AS (
  SELECT {dsum_sql('r3 * r3')} AS sse, CAST(COUNT(*) AS BIGINT) AS n
  FROM final)
SELECT CAST(1 AS BIGINT) AS round, feature, CAST(threshold AS BIGINT) AS threshold,
       round(gamma_l, 6) AS gamma_l, round(gamma_r, 6) AS gamma_r,
       n_l, n_r, round(score, 4) AS score_r
FROM best1
UNION ALL
SELECT 2, feature, threshold, round(gamma_l, 6), round(gamma_r, 6),
       n_l, n_r, round(score, 4)
FROM best2
UNION ALL
SELECT 3, '__sse__', n, NULL, NULL, 0, 0, round(sse / 1e6, 4)
FROM sse
"""

QUERIES["ml_gbm_stumps"] = ml_gbm_stumps
ORACLE["ml_gbm_stumps"] = _gbm_sql()


def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form RIDGE regression per segment — ml_linreg_closed_form
    extended to two features with an L2 penalty (lambda = 0.1 n, the
    population-objective scaling), still trained in ONE
    partial-aggregable pass of exact DECIMAL sufficient statistics.

    Fit: l_extendedprice ~ l_quantity + l_discount per l_returnflag,
    intercept unpenalized via feature centering; the 2x2 system
    (X'X_c + lambda I) beta = X'y_c inverts in closed form on the
    3-row aggregate. Every float op runs on identical exact-sum
    operands in both engines, so the 6-dp emission hashes exactly —
    the same discipline that makes the OLS op full-oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("double")
    x2 = F.col("l_discount").cast("double")
    y = F.col("l_extendedprice").cast("double")
    g = li.groupBy("l_returnflag").agg(
        bcount().alias("n"),
        dsum(x1).alias("sx1"),
        dsum(x2).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * x2).alias("s12"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
    )
    n = F.col("n").cast("double")
    s11c = F.col("s11") - F.col("sx1") * F.col("sx1") / n
    s22c = F.col("s22") - F.col("sx2") * F.col("sx2") / n
    s12c = F.col("s12") - F.col("sx1") * F.col("sx2") / n
    s1yc = F.col("s1y") - F.col("sx1") * F.col("sy") / n
    s2yc = F.col("s2y") - F.col("sx2") * F.col("sy") / n
    a11 = s11c + 0.1 * n
    a22 = s22c + 0.1 * n
    det = a11 * a22 - s12c * s12c
    b1 = (s1yc * a22 - s2yc * s12c) / det
    b2 = (a11 * s2yc - s12c * s1yc) / det
    icpt = F.col("sy") / n - b1 * (F.col("sx1") / n) - b2 * (F.col("sx2") / n)
    return g.select(
        "l_returnflag",
        "n",
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round(icpt, 6).alias("intercept"),
    ).orderBy("l_returnflag")


_RIDGE_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('l_quantity')} AS sx1,
         {dsum_sql('l_discount')} AS sx2,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity * l_quantity')} AS s11,
         {dsum_sql('l_discount * l_discount')} AS s22,
         {dsum_sql('l_quantity * l_discount')} AS s12,
         {dsum_sql('l_quantity * l_extendedprice')} AS s1y,
         {dsum_sql('l_discount * l_extendedprice')} AS s2y
  FROM lineitem GROUP BY l_returnflag),
c AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd, sx1, sx2, sy,
         s11 - sx1 * sx1 / CAST(n AS DOUBLE) AS s11c,
         s22 - sx2 * sx2 / CAST(n AS DOUBLE) AS s22c,
         s12 - sx1 * sx2 / CAST(n AS DOUBLE) AS s12c,
         s1y - sx1 * sy / CAST(n AS DOUBLE) AS s1yc,
         s2y - sx2 * sy / CAST(n AS DOUBLE) AS s2yc
  FROM s),
m AS (
  SELECT *, s11c + 0.1 * nd AS a11, s22c + 0.1 * nd AS a22
  FROM c),
d AS (
  SELECT *, a11 * a22 - s12c * s12c AS det,
         (s1yc * a22 - s2yc * s12c) / (a11 * a22 - s12c * s12c) AS b1,
         (a11 * s2yc - s12c * s1yc) / (a11 * a22 - s12c * s12c) AS b2
  FROM m)
SELECT l_returnflag, n,
       round(b1, 6) AS beta_qty,
       round(b2, 6) AS beta_disc,
       round(sy / nd - b1 * (sx1 / nd) - b2 * (sx2 / nd), 6) AS intercept
FROM d
ORDER BY l_returnflag
"""

QUERIES["ml_ridge_closed_form"] = ml_ridge_closed_form
ORACLE["ml_ridge_closed_form"] = _RIDGE_SQL


# ---------------------------------------------------------------------------
# Grid-blocked DBSCAN (round 5): density clustering — the non-convex
# complement to ml_kmeans_lloyd. Neighborhoods come from a 9-cell grid
# join (cell = eps-sized square), so pair generation is blocked the
# same way join_spatial_grid/dedup ops are — never all-pairs. Core
# points (>= minPts eps-neighbors, self included) cluster by exact
# hash-min label propagation to FIXPOINT (the connected-components
# machinery); border points adopt the MIN neighboring core label
# (deterministic variant of DBSCAN's "any core" assignment); the rest
# are noise (-1).

_DBSCAN_EPS = 0.02
_DBSCAN_MINPTS = 5
_DBSCAN_MAX_ROUNDS = 64
_DBSCAN_ORACLE_ROUNDS = 32  # >= measured fixpoint (17 @ sf0.01, 22 @
# sf0.1) with headroom; min-labels are monotone so extra rounds no-op.


def ml_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, n_neighbors, is_core, cluster) over the first two
    embedding dims; cluster = min core vec_id of the density-connected
    component, -1 for noise.

    Scale shape: candidate pairs are bounded by 9-cell occupancy (grid
    blocking), the core-core edge list partitions on src and persists
    through the fixpoint loop (only node-cardinality label tables move
    per round), and every float comparison is the identical IEEE
    dist^2 <= eps^2 on float->double widened operands — the labels
    themselves are exact integers, so the oracle's unrolled hash-min
    replay matches bit-for-bit."""
    from pyspark import StorageLevel

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    eps = F.lit(_DBSCAN_EPS)
    a = pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") / eps).cast("long").alias("cx"),
        F.floor(F.col("y") / eps).cast("long").alias("cy"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    b = a.crossJoin(F.broadcast(offs)).select(
        F.col("id").alias("bid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    pairs = (
        a.join(b, ["cx", "cy"])
        .where(d2 <= eps * eps)
        .select("id", "bid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs.count()
    nb = pairs.groupBy("id").agg(bcount().alias("n_nb"))
    core = nb.where(F.col("n_nb") >= _DBSCAN_MINPTS).select("id")
    ce = (
        pairs.join(core.withColumnRenamed("id", "cid"), F.col("id") == F.col("cid"))
        .drop("cid")
        .join(core.withColumnRenamed("id", "cid"), F.col("bid") == F.col("cid"))
        .drop("cid")
        .where(F.col("id") != F.col("bid"))
        .repartition(F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ce.count()
    labels = core.select(F.col("id").alias("node"), F.col("id").alias("lbl"))
    labels = labels.localCheckpoint(eager=False)
    prev = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(_DBSCAN_MAX_ROUNDS):
        prop = ce.join(labels.withColumnRenamed("node", "id"), "id").select(
            F.col("bid").alias("node"), "lbl"
        )
        labels = (
            prop.unionByName(labels)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        s = labels.agg(F.sum("lbl")).collect()[0][0]
        if s == prev:
            break
        prev = s
    border = (
        pairs.where(F.col("id") != F.col("bid"))
        .join(labels.withColumnRenamed("node", "bid"), "bid")
        .groupBy("id")
        .agg(F.min("lbl").alias("border_lbl"))
    )
    out = (
        nb.join(labels.withColumnRenamed("node", "id"), "id", "left")
        .join(border, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("n_nb").alias("n_neighbors"),
            F.col("lbl").isNotNull().cast("long").alias("is_core"),
            F.coalesce("lbl", "border_lbl", F.lit(-1)).cast("long").alias("cluster"),
        )
    )
    out = out.localCheckpoint()
    pairs.unpersist()
    ce.unpersist()
    return out


def _dbscan_sql() -> str:
    e = _DBSCAN_EPS
    parts = [
        f"""
pts AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings),
cells AS MATERIALIZED (
  SELECT *, CAST(floor(x / {e}) AS BIGINT) AS cx,
         CAST(floor(y / {e}) AS BIGINT) AS cy
  FROM pts),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
pairs AS MATERIALIZED (
  SELECT a.id, b.id AS bid
  FROM cells a
  JOIN (SELECT c.id, c.x, c.y, c.cx + o.dx AS cx, c.cy + o.dy AS cy
        FROM cells c, offs o) b
    ON a.cx = b.cx AND a.cy = b.cy
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {e} * {e}),
nb AS MATERIALIZED (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_nb FROM pairs GROUP BY id),
core AS MATERIALIZED (SELECT id FROM nb WHERE n_nb >= {_DBSCAN_MINPTS}),
ce AS MATERIALIZED (
  SELECT p.id AS src, p.bid AS dst FROM pairs p
  JOIN core c1 ON c1.id = p.id
  JOIN core c2 ON c2.id = p.bid
  WHERE p.id <> p.bid),
l0 AS MATERIALIZED (SELECT id AS node, id AS lbl FROM core)"""
    ]
    for i in range(1, _DBSCAN_ORACLE_ROUNDS + 1):
        parts.append(
            f"""
l{i} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT e.dst AS node, l.lbl FROM ce e JOIN l{i - 1} l ON l.node = e.src
    UNION ALL SELECT node, lbl FROM l{i - 1})
  GROUP BY node)"""
        )
    n = _DBSCAN_ORACLE_ROUNDS
    return f"""
WITH {",".join(parts)},
border AS (
  SELECT p.id, MIN(l.lbl) AS border_lbl
  FROM pairs p JOIN l{n} l ON l.node = p.bid
  WHERE p.id <> p.bid
  GROUP BY p.id)
SELECT nb.id AS vec_id, nb.n_nb AS n_neighbors,
       CAST(CASE WHEN l.lbl IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_core,
       CAST(COALESCE(l.lbl, b.border_lbl, -1) AS BIGINT) AS cluster
FROM nb
LEFT JOIN l{n} l ON l.node = nb.id
LEFT JOIN border b ON b.id = nb.id
"""


QUERIES["ml_dbscan_grid"] = ml_dbscan_grid
ORACLE["ml_dbscan_grid"] = _dbscan_sql()
