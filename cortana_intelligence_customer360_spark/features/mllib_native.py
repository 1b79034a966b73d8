"""MLlib-native model selection, recommendation, and persistence
(SURVEY.md §1.1 "model artifacts" row; verdict-8 item 3).

The engine's fully-deterministic ML entries (closed-form OLS/ridge,
Newton GLMs, stumps/boosting) carry DuckDB oracles; this module covers
the OTHER half of what the reference's "MLlib pipeline" approach means
in practice [UPSTREAM, recalled — the solution guide trains its
enrichment model through Spark ML abstractions]: hyperparameter search
with ``CrossValidator``/``ParamGridBuilder``, a native ``ALS``
recommender, and the PipelineModel save/load round-trip a production
scoring job depends on. All three are R-tier (MLlib internals are not
SQL-expressible); tests/test_round9.py asserts semantic bounds —
CV accuracy >= the majority-class baseline, ALS train-RMSE under both
the global-mean predictor and the hand-rolled one-half-step baseline
(features/inference.py ml_als_user_step), and bit-equal predictions
from the reloaded pipeline.

Determinism discipline: MLlib's seeded randomness (CV fold assignment
via rand(seed), ALS factor init) is seeded PER PARTITION, so results
are reproducible only on a reproducible physical layout. Every frame
entering a fit is therefore repartition(N, key) +
sortWithinPartitions(key) — content-addressed placement and ordering,
independent of how many cores the caller's session has or how the
parquet scan happened to split. That is also the 100 TB posture: a fit
that depends on incidental input layout is not reproducible on ANY
cluster, so you pin the layout where determinism matters.

Scale notes: CV trains grid x folds models — each fit is one
data-parallel pass per tree over the feature frame; the grid rows
returned are metadata. ALS shuffles the ratings matrix into
numUserBlocks x numItemBlocks blocks; block count is the scale knob
(set explicitly here, never defaulted). Pipeline persistence writes
model metadata + per-stage parquet — KB-sized regardless of training
data volume.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table
from .core import profile_frame
from .ml import _label_frame, build_scoring_pipeline

QUERIES: dict = {}
ORACLE: dict = {}


def _training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile ⋈ dominant-event-type label, pinned to a deterministic
    physical layout (see module docstring) so seeded fold splits and
    tree subsampling reproduce across sessions and core counts."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    profile = profile_frame(customer, orders, events, nation)
    labels = _label_frame(events)
    return (
        profile.join(labels, profile.c_custkey == labels.user_id)
        .repartition(8, "c_custkey")
        .sortWithinPartitions("c_custkey")
    )


_CV_GRID_TREES = [5, 10]
_CV_GRID_DEPTH = [3, 5]
_CV_FOLDS = 2


def ml_cv_rf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded k-fold cross-validated grid search over the scoring
    pipeline's RandomForest: numTrees x maxDepth (2x2), 2 folds,
    multiclass accuracy — the model-selection step between feature
    engineering and ml_train_score's final fit. Emits one row per grid
    point with its cross-validated accuracy and the is_best flag
    (ties: MLlib keeps the first grid index, which this ordering makes
    deterministic).

    Scale: trains folds x grid = 8 small forests; each fit is
    data-parallel over the feature frame and the returned frame is
    grid-sized metadata. CrossValidator(parallelism=4) fits the whole
    grid of one fold concurrently (guide §2.6 — each small fit
    underutilizes the cluster; the thread pool back-fills the idle
    cores, and MLlib's fold split/seeds are independent of thread
    count, so metrics are byte-identical to a sequential fit). The
    input frame is persisted here because CV only caches the per-fold
    SPLITS internally: without it, each fold filter and the final
    best-model refit re-run the profile-join lineage (3 recomputes
    measured as ~40% of the op's wall at sf0.1)."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    train = _training_frame(spark, sf_dir).persist()
    pipe = build_scoring_pipeline(seed=42)
    rf = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, _CV_GRID_TREES)
        .addGrid(rf.maxDepth, _CV_GRID_DEPTH)
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        ),
        numFolds=_CV_FOLDS,
        seed=42,
        parallelism=4,
    )
    try:
        model = cv.fit(train)
    finally:
        train.unpersist()
    best = max(range(len(grid)), key=lambda i: model.avgMetrics[i])
    rows = [
        (
            int(pm[rf.numTrees]),
            int(pm[rf.maxDepth]),
            float(round(model.avgMetrics[i], 6)),
            i == best,
        )
        for i, pm in enumerate(grid)
    ]
    return spark.createDataFrame(
        rows, "num_trees int, max_depth int, cv_accuracy double, is_best boolean"
    ).orderBy("num_trees", "max_depth")


QUERIES["ml_cv_rf_grid"] = ml_cv_rf_grid
# R-tier: CV accuracies are MLlib-internal (fold splits + tree RNG).


_ALS_RANK = 2
_ALS_ITERS = 5
_ALS_REG = 0.1
# Train-RMSE scoring samples the ratings matrix once it exceeds this
# row count (verdict-10 item 2): sf0.01 (~29k) and the test scales
# score the FULL matrix (unchanged semantics); sf0.1 (~290k) and the
# 100x blow-up (29M) score a deterministic md5 10% sample.
_ALS_SCORE_FULL_MAX = 100_000
_ALS_SCORE_SAMPLE_PCT = 10


def ratings_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, brand_id, r): implicit purchase counts per customer
    x brand — the same ratings matrix ml_als_user_step factorizes,
    with brands densely integer-coded by name order (deterministic,
    no StringIndexer fit needed for a 25-value dimension)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    brands = (
        part.select("p_brand")
        .distinct()
        .select(
            "p_brand",
            (F.dense_rank().over(Window.orderBy("p_brand")) - 1)
            .cast("int")
            .alias("brand_id"),
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "p_brand")
        .agg(bcount().alias("r"))
        .join(F.broadcast(brands), "p_brand")
        .select(
            F.col("o_custkey").cast("int").alias("user"),
            "brand_id",
            F.col("r").cast("float").alias("rating"),
        )
        .repartition(8, "user")
        .sortWithinPartitions("user", "brand_id")
    )


def ml_als_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib-native ALS factorization of the customer x brand count
    matrix (rank 2, 5 alternating iterations, lambda = 0.1 — the same
    problem ml_als_user_step solves one exact half-step of, now run to
    a fitted model). Emits the training-fit summary: user/item counts
    and train RMSE. Tests pin RMSE under BOTH the global-mean
    predictor and the hand-rolled half-step baseline — a model that
    can't beat one frozen least-squares update isn't converging.

    Scale: ALS shuffles ratings into numUserBlocks x numItemBlocks
    block pairs (set explicitly: defaulting block counts to input
    partitions is how ALS plans go sideways at 100 TB); each iteration
    is two block-local normal-equation sweeps. The 4x4 grid was
    RE-ADJUDICATED at the 100x blow-up (29M ratings) in round 10 and
    kept, on measurement: an order-controlled session showed the fit
    itself costs 13-16 s warm at EITHER 4x4 or 16x16 (cold-vs-warm
    moves it 6x, the grid ~1.2x), and a same-hour full-op A/B read
    4x4 = 646 s vs 16x16 = 808 s — the wall is the ratings build,
    the cold first iteration, and the 29M-row transform+RMSE scoring,
    all grid-independent, and a finer grid only adds task overhead at
    this matrix shape (25 items: the item dimension can't use more
    item blocks than items have mass for). A first experiment that
    "showed" 16x16 winning 2.6x was confounded by run order
    (SCALE_SMOKE.md round-10 section). coldStartStrategy=drop so the
    RMSE aggregate never sees NaN.

    Scoring (round 11, verdict-10 item 2): the round-10 adjudication
    proved the 100x wall (379 s floor) is grid-independent — ratings
    build + cold pass + the full 29M-row transform/RMSE. The one code
    lever is the scoring term, so train RMSE is computed on a
    DETERMINISTIC md5 sample of the ratings (same pure-function-of-key
    discipline as operators/graph.py sample_hash_pct — reproducible
    across engines, layouts, and retries, unlike rand()/TABLESAMPLE)
    once the matrix exceeds _ALS_SCORE_FULL_MAX rows; below that the
    full matrix is scored, so correctness-scale (sf0.001/sf0.01) runs
    and the beats-both-baselines test semantics are byte-identical to
    round 10. The emitted n_scored column makes the sample size part
    of the record."""
    from pyspark.ml.recommendation import ALS

    ratings = ratings_frame(spark, sf_dir).localCheckpoint()
    als = ALS(
        rank=_ALS_RANK,
        maxIter=_ALS_ITERS,
        regParam=_ALS_REG,
        userCol="user",
        itemCol="brand_id",
        ratingCol="rating",
        seed=42,
        numUserBlocks=4,
        numItemBlocks=4,
        coldStartStrategy="drop",
        implicitPrefs=False,
    )
    model = als.fit(ratings)
    summary = ratings.agg(
        F.countDistinct("user").cast("long").alias("n_users"),
        F.countDistinct("brand_id").cast("long").alias("n_items"),
        bcount().alias("n_ratings"),
    ).first()
    if int(summary.n_ratings) > _ALS_SCORE_FULL_MAX:
        # md5-keyed 10% sample: pure function of (user, brand_id), so
        # the scored subset is identical on any layout/retry; map-only
        # filter on the checkpointed frame — prunes at scan speed.
        bucket = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("user"), F.col("brand_id"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        to_score = ratings.where(bucket % 100 < _ALS_SCORE_SAMPLE_PCT)
    else:
        to_score = ratings
    # One aggregate instead of RegressionEvaluator: same rmse math
    # (coldStartStrategy=drop already removed NaN rows), plus the
    # scored-row count in the same pass.
    scored = (
        model.transform(to_score)
        .agg(
            F.sqrt(
                F.avg(F.pow(F.col("rating") - F.col("prediction"), 2))
            ).alias("rmse"),
            bcount().alias("n_scored"),
        )
        .first()
    )
    return spark.createDataFrame(
        [
            (
                int(summary.n_users),
                int(summary.n_items),
                int(summary.n_ratings),
                int(scored.n_scored),
                _ALS_RANK,
                float(round(scored.rmse, 6)),
            )
        ],
        "n_users long, n_items long, n_ratings long, n_scored long,"
        " rank int, train_rmse double",
    )


QUERIES["ml_als_native"] = ml_als_native
# R-tier: factor values are MLlib-internal (seeded block init + solver).


def ml_pipeline_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PipelineModel persistence round-trip: fit the scoring pipeline,
    save it, load it back, and score the full profile with BOTH
    models. The op ASSERTS the reloaded model's per-class prediction
    counts equal the in-memory model's — a silent save/load drift
    (lost params, re-randomized trees) fails the query, not just a
    test. Emits the per-class counts from the RELOADED model.

    Scale: the artifact is model metadata + per-stage parquet (KB,
    independent of training volume); both scoring passes are map-only
    over the profile. This is the §1.1 "model artifacts" row — train
    once, persist, score from the artifact elsewhere."""
    from pyspark.ml import PipelineModel

    # localCheckpoint: the pipeline fit scans train twice (StringIndexer
    # fit + RF fit) — materialize the profile-join lineage once.
    train = _training_frame(spark, sf_dir).localCheckpoint()
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    # localCheckpoint: the profile join chain is scanned by BOTH
    # scoring passes (in-memory model and reloaded model) — compute it
    # once; and the two map-only passes are independent, so overlap
    # them from a thread pool (guide §2.6). The per-class counts are
    # exact integers either way, so the round-trip assertion is
    # untouched.
    profile = (
        profile_frame(customer, orders, events, nation)
        .withColumn("label_type", F.lit("click"))  # dummy for indexer
        .localCheckpoint()
    )
    model = build_scoring_pipeline(seed=42).fit(train)
    path = tempfile.mkdtemp(prefix="c360_pipeline_model_")
    try:
        model.write().overwrite().save(path)
        reloaded = PipelineModel.load(path)

        def _class_counts(m) -> dict:
            return {
                int(r.p): int(r.n)
                for r in m.transform(profile)
                .groupBy(F.col("prediction").cast("long").alias("p"))
                .agg(bcount().alias("n"))
                .collect()
            }

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            counts_mem, counts_loaded = pool.map(
                _class_counts, [model, reloaded]
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    if counts_mem != counts_loaded:
        raise AssertionError(
            f"reloaded PipelineModel diverged: {counts_loaded} != {counts_mem}"
        )
    rows = sorted(counts_loaded.items())
    return spark.createDataFrame(
        rows, "predicted_class long, n_customers long"
    ).orderBy("predicted_class")


QUERIES["ml_pipeline_persist"] = ml_pipeline_persist
# R-tier: predictions are model-dependent; the round-trip equality is
# asserted inside the op and in tests.


def ml_fpgrowth_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining through MLlib's distributed FP-Growth (the
    PFP algorithm: per-group projected FP-trees, no candidate
    generation) over order x brand baskets — and, unlike the rest of
    this module, FULL-ORACLE: frequent-itemset supports are exact
    integer counts, so DuckDB can replay sizes 1-2 with GROUP BYs.

    Boundary discipline: MLlib turns minSupport into a minCount via a
    float multiply + ceil, so an itemset sitting exactly ON the
    support boundary could flip with rounding. The op therefore runs
    FP-Growth with a LOW floor (0.1%) and both engines post-filter to
    the integer threshold k = (n_baskets + 199) // 200 (exact 0.5%
    ceiling by integer arithmetic) — every emitted itemset clears
    MLlib's floor by 5x, so its ceil semantics can't matter. Output is
    capped at pair itemsets because the SQL replay is a self-join per
    size; FP-Growth itself found the larger ones too (same floor), we
    just don't emit what the oracle can't check.

    Scale: baskets collapse to (orderkey, brand-set) — one distinct +
    one collect_set shuffle; the item dimension (25 brands) bounds the
    FP-tree at any corpus size, which is exactly the regime where
    PFP's group-projection cost is trivial."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    # localCheckpoint: the basket frame is consumed by the count, by
    # FP-Growth's two passes (freq-item scan + tree projection), and by
    # the freqItemsets action — without it each consumer re-runs the
    # distinct + collect_set shuffles (MLlib itself warns "Input data
    # is not cached" here). Integer supports are unchanged.
    baskets = (
        ob.groupBy("ok").agg(F.collect_set("b").alias("items")).localCheckpoint()
    )
    n_baskets = baskets.count()
    k = (n_baskets + 199) // 200
    model = FPGrowth(
        itemsCol="items", minSupport=0.001, minConfidence=0.5
    ).fit(baskets)
    fi = model.freqItemsets.where(
        (F.size("items") <= 2) & (F.col("freq") >= k)
    )
    s = F.array_sort("items")
    return fi.select(
        F.size("items").cast("int").alias("k_items"),
        F.element_at(s, 1).alias("item_a"),
        F.when(F.size("items") == 2, F.element_at(s, 2)).alias("item_b"),
        F.col("freq").cast("long").alias("freq"),
    ).orderBy("k_items", "item_a", "item_b")


_FPGROWTH_SQL = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
thresh AS (
  SELECT (COUNT(DISTINCT ok) + 199) // 200 AS k FROM ob),
singles AS (
  SELECT b AS item_a, CAST(NULL AS VARCHAR) AS item_b,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM ob GROUP BY b
  HAVING COUNT(*) >= (SELECT k FROM thresh)),
pairs AS (
  SELECT a.b AS item_a, c.b AS item_b, CAST(COUNT(*) AS BIGINT) AS freq
  FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
  GROUP BY 1, 2
  HAVING COUNT(*) >= (SELECT k FROM thresh))
SELECT CAST(1 AS INT) AS k_items, item_a, item_b, freq FROM singles
UNION ALL
SELECT CAST(2 AS INT) AS k_items, item_a, item_b, freq FROM pairs
"""

QUERIES["ml_fpgrowth_pairs"] = ml_fpgrowth_pairs
ORACLE["ml_fpgrowth_pairs"] = _FPGROWTH_SQL


# ---------------------------------------------------------------------------
# pyspark.ml.stat surface: Correlation / ChiSquareTest / Summarizer.
# These ride the SAME 6-dp compat class as agg_corr_matrix's F.corr
# (co-moment aggregation in doubles on both engines, rounded where
# cancellation amplifies): full oracles, with the caveat documented
# there. Spearman's rank transform is replayed in SQL via midranks.
# ---------------------------------------------------------------------------

_STAT_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
_SPEARMAN_MOD = 20  # deterministic 1-in-20 sample for the rank pass


def _assembled_lineitem(
    spark: SparkSession, sf_dir: str, keep_key: bool = False
) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    key = ["l_orderkey"] if keep_key else []
    li = load_table(spark, sf_dir, "lineitem").select(
        *key, *[F.col(c).cast("double").alias(c) for c in _STAT_COLS]
    )
    return VectorAssembler(inputCols=_STAT_COLS, outputCol="features").transform(li)


def ml_mllib_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml.stat.Correlation over the assembled lineitem vector:
    Pearson over the FULL table (one co-moment treeAggregate pass,
    ~1.5 s warm at sf0.1) and Spearman over a deterministic 1-in-20
    orderkey sample — MLlib's Spearman ranks each column through an
    RDD sort/zip pipeline that measured 18 s at sf0.1 on the full
    table, a diagnostics-class cost, so it follows the
    emb_cosine_histogram precedent: fixed deterministic sample, the
    sample predicate IS part of the op's contract (the column is named
    spearman_sampled to keep that visible). The SQL replay uses corr()
    for Pearson and corr() over tie-averaged midranks for Spearman —
    midrank = rank + (ties-1)/2, exactly MLlib's average-rank policy.

    Scale: Pearson stays one pass whatever the table size; the
    Spearman sample keeps the rank sort bounded to sample volume."""
    from pyspark.ml.stat import Correlation

    df = _assembled_lineitem(spark, sf_dir, keep_key=True)

    # The Pearson treeAggregate and the sampled-Spearman rank pipeline
    # are independent jobs over different projections — overlap them
    # (guide §2.6); each matrix is a deterministic function of its own
    # input, so values are unchanged.
    def _pearson():
        return Correlation.corr(df, "features", "pearson").first()[0].toArray()

    def _spearman():
        return (
            Correlation.corr(
                df.where(F.col("l_orderkey") % _SPEARMAN_MOD == 0),
                "features",
                "spearman",
            )
            .first()[0]
            .toArray()
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_pm, f_sm = pool.submit(_pearson), pool.submit(_spearman)
        pm, sm = f_pm.result(), f_sm.result()
    rows = []
    for i in range(len(_STAT_COLS)):
        for j in range(i + 1, len(_STAT_COLS)):
            rows.append(
                (
                    _STAT_COLS[i],
                    _STAT_COLS[j],
                    float(round(pm[i][j], 6)),
                    float(round(sm[i][j], 6)),
                )
            )
    return spark.createDataFrame(
        rows,
        "col_a string, col_b string, pearson double, spearman_sampled double",
    ).orderBy("col_a", "col_b")


def _corr_pair_sql(a: str, b: str) -> str:
    return f"""
SELECT '{a}' AS col_a, '{b}' AS col_b,
       (SELECT round(corr({a}, {b}), 6) FROM lineitem) AS pearson,
       round(corr(r_{a}, r_{b}), 6) AS spearman_sampled
FROM ranked"""


_MLLIB_CORR_SQL = (
    f"""
WITH ranked AS (
  SELECT l_quantity, l_extendedprice, l_discount,
"""
    + ",\n".join(
        f"         RANK() OVER (ORDER BY {c})"
        f" + (COUNT(*) OVER (PARTITION BY {c}) - 1) / 2.0 AS r_{c}"
        for c in _STAT_COLS
    )
    + f"""
  FROM lineitem WHERE l_orderkey % {_SPEARMAN_MOD} = 0)
"""
    + "\nUNION ALL\n".join(
        _corr_pair_sql(_STAT_COLS[i], _STAT_COLS[j])
        for i in range(len(_STAT_COLS))
        for j in range(i + 1, len(_STAT_COLS))
    )
)

QUERIES["ml_mllib_correlation"] = ml_mllib_correlation
ORACLE["ml_mllib_correlation"] = _MLLIB_CORR_SQL


def ml_chisq_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml.stat.ChiSquareTest: independence of (a) market
    segment and (b) nation against the has-ordered label, emitting the
    statistic and dof per feature (the p-value needs the chi2 CDF,
    which the SQL engine lacks — the statistic is the checkable part;
    tests assert the MLlib p-value is consistent with dof bounds).
    Oracle: exact integer contingency counts, expected = row*col/n,
    chi2 = SUM((o-e)^2/e) — cell count is category-cardinality (10 and
    50 cells), so the double sum is tiny and order drift dies in the
    6-dp rounding.

    Scale: the test collapses to the contingency table in one
    aggregate; everything after is cell-cardinality arithmetic."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import ChiSquareTest

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    seg_codes = cust.select("c_mktsegment").distinct().orderBy("c_mktsegment")
    seg_map = {
        r.c_mktsegment: float(i) for i, r in enumerate(seg_codes.collect())
    }
    mapping = F.create_map(
        *[x for k, v in sorted(seg_map.items()) for x in (F.lit(k), F.lit(v))]
    )
    df = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .select(
            mapping[F.col("c_mktsegment")].alias("seg"),
            F.col("c_nationkey").cast("double").alias("nat"),
            F.when(F.col("o_custkey").isNotNull(), 1.0).otherwise(0.0).alias(
                "label"
            ),
        )
    )
    vec = VectorAssembler(inputCols=["seg", "nat"], outputCol="features").transform(df)
    r = ChiSquareTest.test(vec, "features", "label").first()
    rows = [
        ("c_mktsegment", float(round(r.statistics[0], 6)), int(r.degreesOfFreedom[0])),
        ("c_nationkey", float(round(r.statistics[1], 6)), int(r.degreesOfFreedom[1])),
    ]
    return spark.createDataFrame(
        rows, "feature string, chi2_stat double, dof long"
    ).orderBy("feature")


def _chisq_feature_sql(fname: str, fexpr: str) -> str:
    return f"""
SELECT '{fname}' AS feature,
       round(SUM((o - e) * (o - e) / e), 6) AS chi2_stat,
       CAST((MAX(nf) - 1) * (MAX(nl) - 1) AS BIGINT) AS dof
FROM (
  SELECT CAST(c.n AS DOUBLE) AS o,
         CAST(f.nf_rows AS DOUBLE) * CAST(l.nl_rows AS DOUBLE)
           / (SELECT CAST(COUNT(*) AS DOUBLE) FROM base) AS e,
         (SELECT COUNT(DISTINCT {fexpr}) FROM base) AS nf,
         (SELECT COUNT(DISTINCT label) FROM base) AS nl
  FROM (SELECT {fexpr} AS fv, label, COUNT(*) AS n FROM base GROUP BY 1, 2) c
  JOIN (SELECT {fexpr} AS fv, COUNT(*) AS nf_rows FROM base GROUP BY 1) f
    ON c.fv = f.fv
  JOIN (SELECT label, COUNT(*) AS nl_rows FROM base GROUP BY 1) l
    ON c.label = l.label)"""


_CHISQ_SQL = (
    """
WITH base AS (
  SELECT c.c_mktsegment, c.c_nationkey,
         CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS label
  FROM customer c
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
    ON c.c_custkey = o.o_custkey)
"""
    + _chisq_feature_sql("c_mktsegment", "c_mktsegment")
    + "\nUNION ALL\n"
    + _chisq_feature_sql("c_nationkey", "c_nationkey")
)

QUERIES["ml_chisq_native"] = ml_chisq_native
ORACLE["ml_chisq_native"] = _CHISQ_SQL


def ml_summarizer_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml.stat.Summarizer: one fused pass computing mean /
    sample variance / min / max / count / numNonZeros over the
    assembled lineitem vector, exploded to a row per column — the
    MLlib-native profile sibling of dq_profile_summary. R-tier, and
    HERE is why this one can't ride the 6-dp class corr/chi2 use: a
    mean of fixed-2-dp data is an exact rational on the 1/(100n) grid,
    which lands ON 6-dp half-ties systematically (measured: sf0.01
    l_discount mean = 0.0499185 exactly; DuckDB's accumulation drift
    crossed the tie upward while the treeAggregate stayed below).
    Ratio statistics (corr, chi2) are generically off-grid; gridded
    means are not. tests/test_round9.py instead asserts the summarizer
    lands within 1e-9 of exact-decimal-sum references.

    Scale: Summarizer is a single treeAggregate over the vector column
    — the one-pass profile you run on a 100 TB feature table instead
    of six separate scans."""
    from pyspark.ml.stat import Summarizer

    df = _assembled_lineitem(spark, sf_dir)
    s = df.select(
        Summarizer.metrics(
            "mean", "variance", "min", "max", "count", "numNonZeros"
        ).summary(F.col("features")).alias("s")
    ).first()["s"]
    rows = [
        (
            c,
            float(s["mean"][i]),
            float(s["variance"][i]),
            float(s["min"][i]),
            float(s["max"][i]),
            int(s["count"]),
            int(s["numNonZeros"][i]),
        )
        for i, c in enumerate(_STAT_COLS)
    ]
    return spark.createDataFrame(
        rows,
        "col string, mean double, variance double, vmin double, vmax double,"
        " n long, n_nonzero long",
    ).orderBy("col")


QUERIES["ml_summarizer_native"] = ml_summarizer_native
# R-tier: gridded means tie at every rounding precision (docstring);
# 1e-9 parity vs exact decimal sums asserted in tests/test_round9.py.


# ---------------------------------------------------------------------------
# Round-10 estimator tail (verdict-9 item 3): native GBT beside the
# exact ml_adaboost_stumps, TrainValidationSplit beside ml_cv_rf_grid,
# and native Poisson GLM beside the exact ml_poisson_irls. Same
# contract as the r9 additions: R-tier (solver internals), seeded,
# layout-pinned, each with a beats-or-matches-the-exact-baseline test
# in tests/test_round10.py.
# ---------------------------------------------------------------------------

_GBT_ITERS = 5
_GBT_DEPTH = 3


def _returns_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ml_adaboost_stumps problem (features/inference.py:694) as an
    MLlib frame: predict returned lineitems (l_returnflag = 'R') from
    quantity / discount / tax. label in {0,1}; layout pinned on the
    composite lineitem key so GBT's seeded subsampling reproduces."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias(
                "label"
            ),
            F.col("l_quantity").cast("double").alias("q"),
            F.col("l_discount").cast("double").alias("dc"),
            F.col("l_tax").cast("double").alias("tx"),
        )
        .repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


def ml_gbt_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib-native gradient-boosted trees on the EXACT problem
    ml_adaboost_stumps solves by hand (returned-lineitem prediction
    from quantity/discount/tax): 5 logistic-loss boosting stages of
    depth-3 regression trees vs the baseline's 3 rounds of depth-1
    stumps from a fixed 18-candidate grid. Emits one row per boosting
    stage (tree weight, node count, depth) plus the ensemble's 0/1
    training error — tests/test_round10.py asserts it BEATS the
    adaboost ensemble's final training error, the whole reason to pay
    for deeper trees.

    Scale: each stage is one data-parallel tree fit (histogram
    aggregation per split level — maxBins=32 sufficient statistics,
    not row sorts); stages are inherently sequential, so wall clock is
    iterations x one-pass cost, the same law as the hand-rolled
    booster. Scoring is map-only."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    df = _returns_frame(spark, sf_dir)
    # localCheckpoint: the assembled frame is scanned by the GBT fit's
    # input conversion and again by the ensemble-error transform pass —
    # materialize the repartitioned lineitem lineage once (same rows,
    # same pinned layout, so the seeded fit is unchanged).
    vec = (
        VectorAssembler(inputCols=["q", "dc", "tx"], outputCol="features")
        .transform(df)
        .localCheckpoint()
    )
    model = GBTClassifier(
        labelCol="label",
        featuresCol="features",
        maxIter=_GBT_ITERS,
        maxDepth=_GBT_DEPTH,
        seed=42,
        stepSize=0.1,
    ).fit(vec)
    train_err = (
        model.transform(vec)
        .agg(
            (
                F.sum(
                    F.when(F.col("prediction") != F.col("label"), 1).otherwise(0)
                )
                / bcount()
            ).alias("e")
        )
        .first()["e"]
    )
    rows = [
        (
            t,
            float(round(model.treeWeights[t], 6)),
            int(model.trees[t].numNodes),
            int(model.trees[t].depth),
            float(round(train_err, 6)),
        )
        for t in range(len(model.trees))
    ]
    return spark.createDataFrame(
        rows,
        "stage int, tree_weight double, n_nodes int, depth int,"
        " ensemble_train_err double",
    ).orderBy("stage")


QUERIES["ml_gbt_native"] = ml_gbt_native
# R-tier: tree structure is MLlib-internal (seeded histogram splits);
# beats-the-exact-adaboost-baseline + determinism in tests/test_round10.py.


def ml_tvs_rf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrainValidationSplit over the SAME pipeline x grid as
    ml_cv_rf_grid — the single-split alternative that fits grid x 1
    models instead of grid x folds, i.e. what you actually run first
    at 100 TB where each fold pass is hours. Emits one row per grid
    point with its held-out (25%) validation accuracy and the is_best
    flag. Seeded split + layout-pinned input (module docstring) makes
    the row values reproducible; tests assert the chosen point's
    accuracy clears the majority-class baseline and that two fits
    agree exactly.

    Scale: trainRatio splits via seeded rand() — one pass; each grid
    fit is data-parallel; parallelism=4 overlaps the whole grid."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit

    # Persist + parallelism=4: same rationale (and same byte-identical
    # guarantee) as ml_cv_rf_grid — TVS only caches its train/validation
    # SPLITS, so the split filters and the final refit would otherwise
    # re-run the profile-join lineage; the whole grid fits concurrently.
    train = _training_frame(spark, sf_dir).persist()
    pipe = build_scoring_pipeline(seed=42)
    rf = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, _CV_GRID_TREES)
        .addGrid(rf.maxDepth, _CV_GRID_DEPTH)
        .build()
    )
    tvs = TrainValidationSplit(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        ),
        trainRatio=0.75,
        seed=42,
        parallelism=4,
    )
    try:
        model = tvs.fit(train)
    finally:
        train.unpersist()
    best = max(range(len(grid)), key=lambda i: model.validationMetrics[i])
    rows = [
        (
            int(pm[rf.numTrees]),
            int(pm[rf.maxDepth]),
            float(round(model.validationMetrics[i], 6)),
            i == best,
        )
        for i, pm in enumerate(grid)
    ]
    return spark.createDataFrame(
        rows, "num_trees int, max_depth int, val_accuracy double, is_best boolean"
    ).orderBy("num_trees", "max_depth")


QUERIES["ml_tvs_rf_grid"] = ml_tvs_rf_grid
# R-tier: validation metrics are MLlib-internal (seeded split + tree RNG).


_GLM_ITERS = 25


def ml_glm_poisson_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native GeneralizedLinearRegression (family=poisson, link=log)
    on the EXACT feature frame ml_poisson_irls (features/value.py:1013)
    solves by hand-rolled Newton/IRLS: order count ~ acctbal band.
    Emits the fitted intercept/slope plus the model deviance and AIC
    from the training summary. tests/test_round10.py asserts the
    native coefficients MATCH the exact IRLS's converged (iteration-6)
    values within 1e-3 — both solvers maximize the same likelihood, so
    agreement is the correctness claim, and divergence would flag
    either a feature drift or an MLlib behavior change.

    Scale: MLlib's GLM IRLS is the same law as the hand-rolled op —
    one treeAggregate (X'WX, X'Wz) per iteration over the feature
    frame, a p x p driver-side solve (p=2 here); iteration count caps
    the sequential depth. For p beyond ~4096 MLlib refuses IRLS and
    you switch to LBFGS-based regression — documented boundary, not
    hit here."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    from .value import _poisson_features

    feats = (
        _poisson_features(spark, sf_dir)
        .select(
            "custkey",
            F.col("x").cast("double").alias("x"),
            F.col("y").cast("double").alias("y"),
        )
        .repartition(8, "custkey")
        .sortWithinPartitions("custkey")
    )
    vec = VectorAssembler(inputCols=["x"], outputCol="features").transform(feats)
    model = GeneralizedLinearRegression(
        family="poisson",
        link="log",
        labelCol="y",
        featuresCol="features",
        maxIter=_GLM_ITERS,
        tol=1e-9,
        regParam=0.0,
    ).fit(vec)
    s = model.summary
    return spark.createDataFrame(
        [
            (
                float(round(model.intercept, 6)),
                float(round(model.coefficients[0], 6)),
                float(round(s.deviance, 4)),
                float(round(s.aic, 4)),
                int(s.numIterations),
            )
        ],
        "b0 double, b1 double, deviance double, aic double, n_iters int",
    )


QUERIES["ml_glm_poisson_native"] = ml_glm_poisson_native
# R-tier: solver internals; 1e-3 parity vs the exact ml_poisson_irls
# asserted in tests/test_round10.py.


_TE_SMOOTHING = 10.0


def feat_target_encode_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 ml.feature.TargetEncoder (new API in 4.0) over the
    nation category with a continuous target (lifetime order count),
    smoothing=10 — supervised categorical encoding, the
    high-cardinality alternative to feat_onehot_bucketize. Emits one
    row per category with its size and smoothed encoding, and — unlike
    the rest of this module — FULL-ORACLE: the fitted encoding is
    blend = (n/(n+s))*cat_mean + (s/(n+s))*global_mean over
    integer-valued labels, every sum exact in doubles, so DuckDB
    replays it textually. Both engines round to 6 dp because Spark's
    internal blend order differs from the documented formula by 1 ulp
    on ~1/3 of categories (measured; the r8 verdict's
    cancellation-rounding rule).

    Scale: fit is one groupBy over the feature frame (category
    cardinality out); transform is a broadcast map — the exact shape
    you want when the category column has 10^6 levels at 100 TB."""
    from pyspark.ml.feature import TargetEncoder

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    oc = orders.groupBy("o_custkey").agg(
        bcount().cast("double").alias("y")
    )
    df = cust.join(oc, cust.c_custkey == oc.o_custkey, "left").select(
        F.col("c_nationkey").cast("double").alias("nat"),
        F.coalesce("y", F.lit(0.0)).alias("y"),
    )
    te = TargetEncoder(
        inputCols=["nat"],
        outputCols=["nat_enc"],
        labelCol="y",
        targetType="continuous",
        smoothing=_TE_SMOOTHING,
    )
    out = te.fit(df).transform(df)
    return (
        out.groupBy(F.col("nat").cast("int").alias("nationkey"))
        .agg(
            bcount().alias("n_customers"),
            F.round(F.first("nat_enc"), 6).alias("encoded"),
        )
        .orderBy("nationkey")
    )


_TARGET_ENCODE_SQL = f"""
WITH base AS (
  SELECT c.c_nationkey AS nat,
         CAST(COALESCE(o.y, 0) AS DOUBLE) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS y FROM orders GROUP BY 1) o
    ON c.c_custkey = o.o_custkey),
g AS (SELECT SUM(y) / COUNT(*) AS gmean FROM base)
SELECT CAST(nat AS INT) AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(
         (COUNT(*) / (COUNT(*) + {_TE_SMOOTHING}))
           * (SUM(y) / COUNT(*))
         + ({_TE_SMOOTHING} / (COUNT(*) + {_TE_SMOOTHING}))
           * (SELECT gmean FROM g),
         6) AS encoded
FROM base GROUP BY nat
"""

QUERIES["feat_target_encode_native"] = feat_target_encode_native
ORACLE["feat_target_encode_native"] = _TARGET_ENCODE_SQL


_IDF_MIN_DF = 2


def text_idf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.CountVectorizer + IDF over the documents corpus
    (space-split tokens, the llmops/text.py convention): fit the
    vocabulary (terms in >= 2 docs), fit IDF on the count vectors, and
    emit (term, doc_freq, idf) by zipping the model's vocabulary with
    its idf/docFreq arrays — the native sibling of the hand-rolled
    text_bm25_search idf. FULL-ORACLE: Spark's idf is
    ln((m+1)/(df+1)) with m = corpus size and df = docs containing the
    term, exact integers both, replayed in SQL over unnested tokens
    (rounded 6 dp — one ln each side).

    Determinism note: CountVectorizer orders its vocabulary by count
    with arbitrary tie order, so the OUTPUT is sorted by term and the
    vocabulary cap is left at its 2^18 default with minDF doing the
    bounding — a top-K cap would make membership tie-dependent.

    Scale: the fit is one doc-term distinct + count shuffle; idf is
    array arithmetic on the driver at vocabulary (not corpus)
    cardinality."""
    from pyspark.ml.feature import IDF, CountVectorizer

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="tf", minDF=float(_IDF_MIN_DF)
    ).fit(docs)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(cv.transform(docs))
    idf = idf_model.idf.toArray()
    dfreq = idf_model.docFreq
    rows = sorted(
        (term, int(dfreq[i]), float(round(idf[i], 6)))
        for i, term in enumerate(cv.vocabulary)
    )
    return spark.createDataFrame(rows, "term string, doc_freq long, idf double")


_IDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
m AS (SELECT COUNT(*) AS n_docs FROM documents),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM toks GROUP BY term
  HAVING COUNT(DISTINCT doc_id) >= {_IDF_MIN_DF})
SELECT term, doc_freq,
       round(ln((CAST((SELECT n_docs FROM m) AS DOUBLE) + 1.0)
                / (CAST(doc_freq AS DOUBLE) + 1.0)), 6) AS idf
FROM df
"""

QUERIES["text_idf_native"] = text_idf_native
ORACLE["text_idf_native"] = _IDF_SQL


def text_ngram_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.RegexTokenizer + NGram over documents: lowercase,
    split on whitespace runs (minTokenLength=1 drops the empties a
    leading/trailing space produces), emit corpus bigram counts above
    a corpus-relative floor (n_docs/50, integer division — the same
    absolute selectivity at every SF). FULL-ORACLE: DuckDB rebuilds
    the bigram list per document with list_transform over the token
    positions and replays the same exact-integer counts.

    The hand-rolled shingle/ngram ops (llmops/dedup.py, text.py) build
    n-grams in raw column expressions; this id covers the NATIVE
    transformer pair a pyspark.ml user would put in a Pipeline.

    Scale: tokenize + gram expansion are map-only; the count is one
    hash aggregate on the exploded bigrams — word-pair cardinality,
    bounded by vocabulary² but in practice Zipf-thin."""
    from pyspark.ml.feature import NGram, RegexTokenizer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    floor = n_docs // 50
    tok = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern="\\s+", toLowercase=True
    )
    ng = NGram(n=2, inputCol="toks", outputCol="bigrams")
    grams = ng.transform(tok.transform(docs))
    return (
        grams.select(F.explode("bigrams").alias("bigram"))
        .groupBy("bigram")
        .agg(bcount().alias("n"))
        .where(F.col("n") >= floor)
    )


_NGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> length(x) >= 1) AS l
  FROM documents),
grams AS (
  SELECT unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS bigram
  FROM toks)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY bigram
HAVING COUNT(*) >= (SELECT COUNT(*) // 50 FROM documents)
"""

QUERIES["text_ngram_native"] = text_ngram_native
ORACLE["text_ngram_native"] = _NGRAM_SQL


def ml_pca_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.PCA over the assembled lineitem stat vector
    (quantity / extendedprice / discount): emits one row per principal
    component with its explained-variance PROPORTION — the
    sign-unambiguous part of the decomposition (component loadings
    flip sign freely between LAPACK builds, so they are deliberately
    not emitted; the proportions are the spectrum, unique). R-tier:
    SQL has no eigensolver — tests/test_round10.py instead rebuilds
    the exact 3x3 covariance matrix from DECIMAL moment sums and
    asserts numpy's eigenvalue proportions match within 1e-6, plus
    sum-to-1 and descending order.

    Scale: the fit is one treeAggregate building the p x p Gram/
    covariance (p=3), then a driver-side p x p eigensolve — the
    covariance path holds to p ~ a few thousand; beyond that you
    switch to randomized/iterative SVD, a documented boundary."""
    from pyspark.ml.feature import PCA

    df = _assembled_lineitem(spark, sf_dir)
    model = PCA(k=3, inputCol="features", outputCol="pc").fit(df)
    ev = model.explainedVariance.toArray()
    rows = [(i + 1, float(round(ev[i], 6))) for i in range(len(ev))]
    return spark.createDataFrame(
        rows, "component int, explained_var double"
    ).orderBy("component")


QUERIES["ml_pca_native"] = ml_pca_native
# R-tier: no SQL eigensolver; eigen parity vs the exact covariance
# asserted in tests/test_round10.py.


def ml_kstest_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.stat.KolmogorovSmirnovTest — the fourth and last member of
    the pyspark.ml.stat family (Correlation / ChiSquareTest /
    Summarizer live above): one-sample KS of l_quantity against a
    normal with the column's own EXACT moments (mean/std rebuilt from
    DECIMAL sums so the reference distribution is reproducible, not a
    float-accumulated fit). Emits the statistic and p-value, 6 dp.
    R-tier: the normal CDF needs erf, which the SQL oracle lacks;
    tests/test_round10.py replays the statistic with math.erf over the
    sorted sample and asserts 1e-9 agreement, plus p-value bounds.

    Scale: MLlib computes the KS distance with a sort + one pass of
    per-partition ecdf offsets — the same distributed-sort law as
    sort_multikey; the moments are one aggregate."""
    import math

    from pyspark.ml.stat import KolmogorovSmirnovTest

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x")
    )
    dec = "decimal(38,6)"
    m = li.agg(
        F.sum(F.col("x").cast(dec)).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("ss"),
        bcount().alias("n"),
    ).first()
    n = int(m.n)
    # round the reference moments BEFORE the test so the emitted row
    # fully determines the null distribution (the replay test recomputes
    # the KS distance from exactly these two values)
    mean = round(float(m.s) / n, 6)
    var = (float(m.ss) - float(m.s) * float(m.s) / n) / (n - 1)
    std = round(math.sqrt(var), 6)
    r = KolmogorovSmirnovTest.test(li, "x", "norm", mean, std).first()
    return spark.createDataFrame(
        [
            (
                n,
                mean,
                std,
                float(round(r.statistic, 6)),
                float(round(r.pValue, 6)),
            )
        ],
        "n long, mean double, std double, ks_stat double, p_value double",
    )


QUERIES["ml_kstest_native"] = ml_kstest_native
# R-tier: normal CDF needs erf (absent in the SQL engine); math.erf
# replay parity asserted in tests/test_round10.py.


_KMN_K = 4
_KMN_ITERS = 20


def _km_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact ml_kmeans_lloyd feature frame (balance cents x order
    count) as assembled doubles, layout-pinned per module docstring.
    localCheckpointed: both callers scan it twice (the clustering fit
    and the per-cluster summary transform), and the checkpoint freezes
    exactly the pinned layout the seeded fits depend on."""
    from pyspark.ml.feature import VectorAssembler

    from .value import _km_points

    pts = (
        _km_points(spark, sf_dir)
        .select(
            "custkey",
            F.col("x1").cast("double").alias("x1"),
            F.col("x2").cast("double").alias("x2"),
        )
        .repartition(8, "custkey")
        .sortWithinPartitions("custkey")
    )
    return (
        VectorAssembler(inputCols=["x1", "x2"], outputCol="features")
        .transform(pts)
        .localCheckpoint()
    )


def _cluster_summary(spark: SparkSession, model, df: DataFrame) -> DataFrame:
    """Per-cluster (size, center, SSE) rows keyed by the CENTER'S RANK
    under (c1, c2) ordering — native cluster indices are
    permutation-unstable across builds, so no MLlib label ever reaches
    the output. One aggregate over the assigned frame; centers enter
    as k broadcast literals via a chained when()."""
    centers = {
        i: (float(c[0]), float(c[1]))
        for i, c in enumerate(model.clusterCenters())
    }
    order = sorted(centers, key=lambda i: centers[i])
    rank_of = {lbl: r + 1 for r, lbl in enumerate(order)}
    pred = model.transform(df).select(
        F.col("prediction").alias("lbl"), "x1", "x2"
    )
    cexp1, cexp2 = F.lit(0.0), F.lit(0.0)
    for lbl, (a, b) in centers.items():
        cexp1 = F.when(F.col("lbl") == lbl, F.lit(a)).otherwise(cexp1)
        cexp2 = F.when(F.col("lbl") == lbl, F.lit(b)).otherwise(cexp2)
    stats = (
        pred.select(
            "lbl",
            (
                (F.col("x1") - cexp1) * (F.col("x1") - cexp1)
                + (F.col("x2") - cexp2) * (F.col("x2") - cexp2)
            ).alias("d2"),
        )
        .groupBy("lbl")
        .agg(bcount().alias("n_points"), F.sum("d2").alias("sse"))
        .collect()
    )
    by_lbl = {r.lbl: r for r in stats}
    rows = []
    for lbl in order:
        r = by_lbl.get(lbl)
        rows.append(
            (
                rank_of[lbl],
                int(r.n_points) if r else 0,
                float(round(centers[lbl][0], 6)),
                float(round(centers[lbl][1], 6)),
                float(round(r.sse, 4)) if r else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "cluster_rank int, n_points long, c1 double, c2 double, sse double",
    ).orderBy("cluster_rank")


def ml_kmeans_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.clustering.KMeans over the SAME 2-D integer feature frame
    ml_kmeans_lloyd (features/value.py) clusters exactly — account
    balance in cents x lifetime order count — k=4, seed=42, 20
    iterations of k-means|| init + Lloyd updates. Emits one row per
    cluster with its size, center, and within-cluster SSE; MLlib's
    cluster indices are permutation-unstable across builds, so rows
    are keyed by the CENTER'S RANK under (c1, c2) ordering, never by
    the native label. R-tier (init and tie-breaking are MLlib
    internals): tests/test_round11.py evaluates both models with one
    shared WCSS function and asserts the native fit's total
    within-cluster SSE <= the exact 2-iteration Lloyd baseline's —
    a 20-iteration native fit that loses to two hand-rolled
    iterations isn't converging.

    Determinism discipline (module docstring): the feature frame is
    repartition(8, custkey) + sortWithinPartitions before the fit, so
    the seeded k-means|| sample draws from a content-addressed layout.

    Scale: each Lloyd iteration is one map-side-combined aggregate
    over the point frame against k broadcast centers (identical law
    to the exact op); the per-cluster stats here are one more
    aggregate over the assigned frame."""
    from pyspark.ml.clustering import KMeans

    df = _km_feature_frame(spark, sf_dir)
    model = KMeans(
        k=_KMN_K, seed=42, maxIter=_KMN_ITERS, featuresCol="features"
    ).fit(df)
    return _cluster_summary(spark, model, df)


QUERIES["ml_kmeans_native"] = ml_kmeans_native
# R-tier: k-means|| init and label assignment are MLlib internals;
# WCSS <= the exact ml_kmeans_lloyd baseline asserted in
# tests/test_round11.py with a shared evaluation function.


def ml_bkm_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.clustering.BisectingKMeans over the same frame — the
    divisive-hierarchical sibling: start from one cluster, repeatedly
    bisect the heaviest leaf until k=4. Same ranked-center output
    contract as ml_kmeans_native. R-tier: tests/test_round11.py
    asserts its WCSS (shared evaluator) is <= the exact Lloyd
    baseline's FIRST-iteration WCSS — bisecting trades a little final
    WCSS for hierarchical structure, so the flat 20-iteration bound
    would be unfair, but losing to a single Lloyd step from md5 init
    means the bisection collapsed.

    Scale: each bisection runs k-means with k=2 on ONE leaf's points —
    total work is O(depth) linear passes, and the divisible frame
    never gathers to the driver."""
    from pyspark.ml.clustering import BisectingKMeans

    df = _km_feature_frame(spark, sf_dir)
    model = BisectingKMeans(
        k=_KMN_K, seed=42, maxIter=_KMN_ITERS, featuresCol="features"
    ).fit(df)
    return _cluster_summary(spark, model, df)


QUERIES["ml_bkm_native"] = ml_bkm_native
# R-tier: bisection order and leaf k-means internals; WCSS bound vs
# the exact Lloyd iteration-1 baseline in tests/test_round11.py.


_GMN_K = 2
_GMN_ITERS = 60
# Multi-restart seed list: EM's monotone-likelihood law holds WITHIN
# one run, not across initializations — a single random init can land
# in a degenerate basin (measured at sf0.001: seed 42 collapses to
# two near-identical components, mean LL 0.5127, while seeds 7/101
# find the real bimodal split at 0.598). The standard mitigation is
# n_init restarts with max-likelihood selection; the list is fixed so
# the op stays deterministic.
_GMN_SEEDS = (7, 13, 42, 101)


def ml_gmm_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.clustering.GaussianMixture over the SAME scaled 1-D
    observations ml_gmm_em_1d (features/inference.py) fits exactly —
    o_totalprice in price-millions — k=2, multi-restart over the
    fixed _GMN_SEEDS list (max-likelihood fit kept), 60 EM
    iterations each. Emits one row per component keyed by the
    component MEAN'S RANK (native component order is
    permutation-unstable), with weight, mean, variance, and the best
    fit's mean per-row log-likelihood (identical in both rows — it
    is a property of the mixture).
    R-tier: tests/test_round11.py computes the log-likelihood of the
    exact op's final 3-iteration parameters with one aggregate and
    asserts the best restart's summary log-likelihood is >= it minus
    epsilon — the restart sweep is exactly what makes that bound
    robust to any one seed's local optimum.

    Scale: each EM iteration aggregates per-component responsibility
    moments against k broadcast (weight, mean, cov) triples — one
    linear scan per iteration, the identical law as the exact op; the
    observation frame (cached — len(_GMN_SEEDS) fits re-read it) is
    a single double per row."""
    from pyspark.ml.clustering import GaussianMixture
    from pyspark.ml.feature import VectorAssembler

    obs = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_totalprice") / F.lit(1000000.0)).alias("x"),
        )
        .repartition(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    df = VectorAssembler(inputCols=["x"], outputCol="features").transform(obs)
    df = df.persist()
    try:
        n_rows = df.count()

        # The restarts are INDEPENDENT fits over the same cached frame,
        # so run them from a thread pool (optimization guide §2.6 —
        # overlap independent jobs): each EM iteration of one fit is an
        # 8-task aggregate that leaves most cores idle, and the
        # scheduler back-fills them with the other seeds' iterations.
        # Selection stays byte-identical to the sequential loop: fits
        # are keyed by seed and the strict-> max is applied in
        # _GMN_SEEDS order (earliest seed wins ties), so threading
        # changes wall clock only, never the chosen model.
        from concurrent.futures import ThreadPoolExecutor

        def _fit(seed: int):
            m = GaussianMixture(
                k=_GMN_K,
                seed=seed,
                maxIter=_GMN_ITERS,
                featuresCol="features",
            ).fit(df)
            return m, float(m.summary.logLikelihood)

        with ThreadPoolExecutor(max_workers=len(_GMN_SEEDS)) as pool:
            by_seed = dict(zip(_GMN_SEEDS, pool.map(_fit, _GMN_SEEDS)))
        model, best_total_ll = None, None
        for seed in _GMN_SEEDS:
            m, ll = by_seed[seed]
            if best_total_ll is None or ll > best_total_ll:
                model, best_total_ll = m, ll
    finally:
        df.unpersist()
    # summary.logLikelihood is the TOTAL over rows; emit the mean so
    # the value is SF-comparable
    mean_ll = best_total_ll / float(n_rows)
    comps = []
    for i in range(_GMN_K):
        g = model.gaussians[i]
        comps.append(
            (
                float(model.weights[i]),
                float(g.mean[0]),
                float(g.cov.toArray()[0][0]),
            )
        )
    comps.sort(key=lambda t: t[1])  # rank by mean
    rows = [
        (
            r + 1,
            float(round(w, 6)),
            float(round(mu, 6)),
            float(round(var, 6)),
            float(round(mean_ll, 6)),
        )
        for r, (w, mu, var) in enumerate(comps)
    ]
    return spark.createDataFrame(
        rows,
        "component_rank int, weight double, mu double, var double,"
        " mean_ll double",
    ).orderBy("component_rank")


QUERIES["ml_gmm_native"] = ml_gmm_native
# R-tier: EM init/iteration internals; log-likelihood >= the exact
# 3-iteration ml_gmm_em_1d parameters asserted in tests/test_round11.py.


_W2V_SIZE = 16
_W2V_MIN_COUNT = 5
_W2V_TOP_TERMS = 5


def ml_word2vec_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.Word2Vec over the documents corpus (space-split
    tokens, the llmops/text.py convention): skip-gram embeddings,
    vectorSize=16, seed=42, numPartitions=1 (>1 trades determinism
    for speed — the documented Word2Vec contract; the corpus vocab is
    tiny so one training partition is not a bottleneck). Emits, for
    the _W2V_TOP_TERMS most frequent tokens (frequency desc, token
    asc — an exact, SQL-derivable selection), the nearest synonym by
    cosine over the fitted vectors, plus the model's vocab size.
    R-tier: vector values are trainer internals; tests/test_round11.py
    asserts (a) same-seed same-layout refit reproduces the output
    bit-for-bit, (b) exact-duplicate documents transform to identical
    doc vectors, (c) vocab_size equals the exact count of tokens with
    corpus frequency >= minCount.

    Scale: Word2Vec broadcasts the (vocab x size) matrix per
    iteration and trains on numPartitions partitions — vocab-bounded
    driver state, corpus-linear work; synonym lookup here is driver
    math over the top-5 terms only."""
    from pyspark.ml.feature import Word2Vec

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # layout pin (module docstring): seeded sampling must see a
    # content-addressed partitioning, not the incidental scan split.
    # localCheckpoint: the tokenized frame is scanned by Word2Vec's
    # vocab pass, its training pass, and the top-terms frequency
    # aggregate — materialize the split+repartition once.
    docs = (
        docs.repartition(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .localCheckpoint()
    )
    model = Word2Vec(
        vectorSize=_W2V_SIZE,
        minCount=_W2V_MIN_COUNT,
        seed=42,
        numPartitions=1,
        maxIter=1,
        inputCol="toks",
        outputCol="vec",
    ).fit(docs)
    vecs = model.getVectors()  # (word, vector) DataFrame, vocab-sized
    vocab_size = vecs.count()
    top = [
        r.word
        for r in (
            docs.select(F.explode("toks").alias("w"))
            .groupBy("w")
            .agg(bcount().alias("n"))
            .where(F.col("n") >= _W2V_MIN_COUNT)
            .orderBy(F.desc("n"), F.asc("w"))
            .limit(_W2V_TOP_TERMS)
            .select(F.col("w").alias("word"))
            .collect()
        )
    ]
    rows = []
    for w in top:
        syn = model.findSynonymsArray(w, 1)
        rows.append(
            (
                w,
                syn[0][0] if syn else None,
                float(round(syn[0][1], 6)) if syn else None,
                int(vocab_size),
            )
        )
    return spark.createDataFrame(
        rows,
        "term string, nearest string, cos_sim double, vocab_size long",
    ).orderBy("term")


QUERIES["ml_word2vec_native"] = ml_word2vec_native
# R-tier: embedding values are trainer internals; seeded-refit
# reproducibility, dup-doc vector equality, and the exact vocab-size
# bound asserted in tests/test_round11.py.


_CVN_MIN_DF = 2


def text_countvec_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.CountVectorizer + ml.stat.Summarizer over the SAME
    3-gram word shingles the dedup lattice banding hashes
    (llmops/dedup.py shingle_frame, here WITHOUT the within-doc
    array_distinct so counts are true term frequencies): fit the
    vocab-bounded vectorizer (shingles present in >= 2 docs — exactly
    the shingles that can ever generate a dedup candidate pair), then
    ONE Summarizer pass computes the corpus total count (sum) and
    document frequency (numNonZeros) per vocabulary slot. FULL-ORACLE
    on integer counts: DuckDB rebuilds the 3-gram lists per document
    and replays both counts with the same >= 2-docs bound.

    Determinism note (text_idf_native precedent): CountVectorizer's
    vocabulary is ordered by count with arbitrary tie order, so
    output is keyed by the shingle STRING and the vocabulary is
    bounded by minDF, never by a top-K cap (membership would be
    tie-dependent).

    Scale: the fit is one doc-shingle count shuffle at vocabulary
    cardinality; the Summarizer pass is a treeAggregate of sparse
    vectors — driver state is 2 x vocab doubles. The boundary: a
    vocabulary beyond ~10^7 slots moves this to the pair of plain
    exploded-count aggregates (same results, no vector state), which
    is what the hand-rolled dedup lattice already does."""
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.stat import Summarizer

    n = 3
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    # localCheckpoint: the shingle build (a higher-order transform per
    # row) is scanned by the CountVectorizer fit AND by the
    # transform+Summarizer pass — materialize it once.
    sh = docs.select(
        "doc_id",
        F.when(F.size(toks) >= n, grams)
        .otherwise(F.array().cast("array<string>"))
        .alias("shingles"),
    ).localCheckpoint()
    cv = CountVectorizer(
        inputCol="shingles", outputCol="tf", minDF=float(_CVN_MIN_DF)
    ).fit(sh)
    agg = (
        cv.transform(sh)
        .select("tf")
        .agg(
            Summarizer.sum(F.col("tf")).alias("total"),
            Summarizer.numNonZeros(F.col("tf")).alias("dfreq"),
        )
        .first()
    )
    total = agg.total.toArray()
    dfreq = agg.dfreq.toArray()
    rows = sorted(
        (term, int(dfreq[i]), int(total[i]))
        for i, term in enumerate(cv.vocabulary)
    )
    return spark.createDataFrame(
        rows, "shingle string, doc_freq long, total_tf long"
    )


_COUNTVEC_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS l FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))
           AS shingle
  FROM toks
  WHERE len(l) >= 3)
SELECT shingle,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(COUNT(*) AS BIGINT) AS total_tf
FROM grams GROUP BY shingle
HAVING COUNT(DISTINCT doc_id) >= {_CVN_MIN_DF}
"""

QUERIES["text_countvec_native"] = text_countvec_native
ORACLE["text_countvec_native"] = _COUNTVEC_SQL
