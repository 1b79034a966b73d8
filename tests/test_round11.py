"""Round-11 additions: native clustering handles (KMeans / GMM) with
matches-or-beats parity against the exact hand-rolled baselines, the
native Word2Vec handle, the CountVectorizer shingle vectorizer feeding
the dedup lattice vocabulary, and the pandas-API index round-trip.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _wcss(spark, pts_df, centers) -> float:
    """Total within-cluster SSE of pts (x1, x2 doubles) against the
    given centers under nearest-center assignment — ONE shared
    evaluation function so the native-vs-exact comparison can't be
    skewed by mismatched metrics."""
    dists = [
        (F.col("x1") - F.lit(c1)) * (F.col("x1") - F.lit(c1))
        + (F.col("x2") - F.lit(c2)) * (F.col("x2") - F.lit(c2))
        for c1, c2 in centers
    ]
    return pts_df.agg(F.sum(F.least(*dists))).first()[0]


def test_kmeans_native_beats_lloyd_wcss(spark):
    """The reason to pay for the native handle: 20 k-means|| +Lloyd
    iterations must reach a within-cluster SSE <= the exact 2-iteration
    md5-init baseline's, both scored by the same WCSS function over the
    same points."""
    from cortana_intelligence_customer360_spark.features.mllib_native import (
        ml_kmeans_native,
    )
    from cortana_intelligence_customer360_spark.features.value import (
        _KM_ITERS,
        _km_points,
    )
    from cortana_intelligence_customer360_spark.features.value import (
        ml_kmeans_lloyd,
    )

    pts = (
        _km_points(spark, SF_DIR)
        .select(
            F.col("x1").cast("double").alias("x1"),
            F.col("x2").cast("double").alias("x2"),
        )
        .localCheckpoint()
    )
    native_rows = ml_kmeans_native(spark, SF_DIR).collect()
    assert len(native_rows) == 4
    assert sum(r.n_points for r in native_rows) == pts.count()
    native_centers = [(r.c1, r.c2) for r in native_rows]
    lloyd_final = [
        (r.c1, r.c2)
        for r in ml_kmeans_lloyd(spark, SF_DIR)
        .where(F.col("iter") == _KM_ITERS)
        .collect()
    ]
    native = _wcss(spark, pts, native_centers)
    lloyd = _wcss(spark, pts, lloyd_final)
    assert native <= lloyd * (1 + 1e-9), (
        f"native KMeans WCSS {native} worse than exact Lloyd {lloyd}"
    )
    # emitted per-cluster sse must sum to the same WCSS (native
    # assignment = nearest center after convergence)
    emitted = sum(r.sse for r in native_rows)
    assert abs(emitted - native) / max(native, 1.0) < 1e-4


def test_gmm_native_loglik_beats_exact_em(spark):
    """EM's monotone-likelihood law as a cross-implementation bound:
    the native 30-iteration GMM's mean log-likelihood must be >= the
    likelihood of the exact op's final 3-iteration parameters,
    evaluated by the same aggregate over the same observations."""
    from cortana_intelligence_customer360_spark.features.inference import (
        _GMM_ITERS,
        ml_gmm_em_1d,
    )
    from cortana_intelligence_customer360_spark.features.mllib_native import (
        ml_gmm_native,
    )
    from cortana_intelligence_customer360_spark.sources.tables import load_table

    native = ml_gmm_native(spark, SF_DIR).collect()
    assert len(native) == 2
    assert abs(sum(r.weight for r in native) - 1.0) < 1e-4
    assert all(r.var > 0 for r in native)

    p = (
        ml_gmm_em_1d(spark, SF_DIR)
        .where(F.col("iter") == _GMM_ITERS)
        .first()
    )
    obs = load_table(spark, SF_DIR, "orders").select(
        (F.col("o_totalprice") / F.lit(1000000.0)).alias("x")
    )

    def mean_ll(w1, mu1, v1, mu2, v2) -> float:
        dens = (
            "(({w}) * exp(-((x - ({mu})) * (x - ({mu}))) / (2.0 * ({v})))"
            " / sqrt(2.0 * pi() * ({v})))"
        )
        expr = (
            "ln("
            + dens.format(w=w1, mu=mu1, v=v1)
            + " + "
            + dens.format(w=1.0 - w1, mu=mu2, v=v2)
            + ")"
        )
        return obs.agg(F.avg(F.expr(expr))).first()[0]

    exact_ll = mean_ll(p.w1, p.mu1, p.v1, p.mu2, p.v2)
    assert native[0].mean_ll >= exact_ll - 1e-6, (
        f"native GMM mean LL {native[0].mean_ll} below exact-EM"
        f" 3-iteration parameters' {exact_ll}"
    )


def test_word2vec_native_structure(spark):
    """Three bounds on the R-tier output: (a) same-seed same-layout
    refit reproduces the op's rows bit-for-bit; (b) exact-duplicate
    documents transform to identical doc vectors; (c) vocab_size
    equals the exact count of tokens with corpus frequency >=
    minCount."""
    from cortana_intelligence_customer360_spark.features.mllib_native import (
        _W2V_MIN_COUNT,
        ml_word2vec_native,
    )
    from cortana_intelligence_customer360_spark.sources.tables import load_table

    rows1 = [tuple(r) for r in ml_word2vec_native(spark, SF_DIR).collect()]
    rows2 = [tuple(r) for r in ml_word2vec_native(spark, SF_DIR).collect()]
    assert rows1 == rows2, "seeded refit diverged"
    assert len(rows1) > 0
    for _, nearest, cos_sim, _ in rows1:
        assert nearest is not None
        assert -1.0 - 1e-9 <= cos_sim <= 1.0 + 1e-9

    docs = load_table(spark, SF_DIR, "documents")
    exact_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .where(F.col("count") >= _W2V_MIN_COUNT)
        .count()
    )
    assert rows1[0][3] == exact_vocab

    # (b): refit the same model and transform a planted duplicate pair
    from pyspark.ml.feature import Word2Vec

    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    toks = toks.repartition(8, "doc_id").sortWithinPartitions("doc_id")
    model = Word2Vec(
        vectorSize=16,
        minCount=_W2V_MIN_COUNT,
        seed=42,
        numPartitions=1,
        maxIter=1,
        inputCol="toks",
        outputCol="vec",
    ).fit(toks)
    # The corpus has near-dups but zero byte-identical texts, so PLANT
    # the duplicate pair: two rows sharing one real doc's token array.
    # Equality then proves the doc vector depends only on content (the
    # doc_id column doesn't leak in) and transform is deterministic.
    first_toks = toks.orderBy("doc_id").first().toks
    planted = spark.createDataFrame(
        [("dup_a", first_toks), ("dup_b", first_toks)],
        "doc_id string, toks array<string>",
    )
    out = {
        r.doc_id: r.vec.toArray().tolist()
        for r in model.transform(planted).collect()
    }
    assert out["dup_a"] == out["dup_b"]


def test_countvec_native_matches_exact_counts(spark):
    """The O-tier claim checked in-engine as well: the CountVectorizer
    + Summarizer counts must equal the plain exploded-count aggregate
    over the identical 3-gram construction (the form the oracle SQL
    replays)."""
    from cortana_intelligence_customer360_spark.features.mllib_native import (
        _CVN_MIN_DF,
        text_countvec_native,
    )
    from cortana_intelligence_customer360_spark.sources.tables import load_table

    got = {
        r.shingle: (r.doc_freq, r.total_tf)
        for r in text_countvec_native(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = 3
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    exact = {
        r.shingle: (r.df, r.tf)
        for r in (
            docs.where(F.size(toks) >= n)
            .select("doc_id", F.explode(grams).alias("shingle"))
            .groupBy("shingle")
            .agg(
                F.countDistinct("doc_id").alias("df"),
                F.count(F.lit(1)).alias("tf"),
            )
            .where(F.col("df") >= _CVN_MIN_DF)
            .collect()
        )
    }
    assert got == exact
    assert len(got) > 0


def test_ps_index_roundtrip_values_and_plan(spark, duck):
    """Oracle parity at test scale plus the scale claim: the ps .loc
    integer slice must compile to a Catalyst range filter on the index
    column (visible in the plan), not a driver-side materialization."""
    from cortana_intelligence_customer360_spark.operators.pandas_api import (
        _PS_IDX_SQL,
        ps_index_roundtrip,
    )
    from tests.conftest import assert_frames_match

    df = ps_index_roundtrip(spark, SF_DIR)
    assert_frames_match(df, duck.execute(_PS_IDX_SQL).df(), "ps_index_roundtrip")

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "o_orderkey" in plan
    assert ">=" in plan and "<=" in plan, (
        "loc slice did not compile to a range filter:\n" + plan
    )


def test_bkm_native_beats_single_lloyd_step(spark):
    """Bisecting k-means is hierarchical — it may concede a little
    final WCSS to the flat 20-iteration fit, but it must beat the
    exact baseline's FIRST Lloyd iteration (one update from md5
    init), else the bisection collapsed."""
    from cortana_intelligence_customer360_spark.features.mllib_native import (
        ml_bkm_native,
    )
    from cortana_intelligence_customer360_spark.features.value import (
        _km_points,
        ml_kmeans_lloyd,
    )

    pts = (
        _km_points(spark, SF_DIR)
        .select(
            F.col("x1").cast("double").alias("x1"),
            F.col("x2").cast("double").alias("x2"),
        )
        .localCheckpoint()
    )
    rows = ml_bkm_native(spark, SF_DIR).collect()
    assert len(rows) == 4
    assert sum(r.n_points for r in rows) == pts.count()
    bkm = _wcss(spark, pts, [(r.c1, r.c2) for r in rows])
    lloyd_it1 = _wcss(
        spark,
        pts,
        [
            (r.c1, r.c2)
            for r in ml_kmeans_lloyd(spark, SF_DIR)
            .where(F.col("iter") == 1)
            .collect()
        ],
    )
    assert bkm <= lloyd_it1 * (1 + 1e-9), (
        f"bisecting WCSS {bkm} worse than one exact Lloyd step {lloyd_it1}"
    )


def test_minhash_native_recall_and_soundness(spark):
    """The native MinHashLSH handle vs the exact inverted-index
    Jaccard op: >= 90% of exact J >= 0.5 pairs must be recovered
    (bucket recall), and every emitted pair must itself satisfy the
    threshold (approxSimilarityJoin computes exact distance on
    candidates, so false positives would mean a broken join)."""
    from cortana_intelligence_customer360_spark.llmops.dedup import (
        JACCARD_THRESHOLD,
        dedup_minhash_native,
        dedup_ngram_jaccard,
    )

    native = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup_minhash_native(spark, SF_DIR).collect()
    }
    exact = {
        (r.a_id, r.b_id)
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    assert exact, "corpus has no planted near-dup pairs"
    recall = len(exact & set(native)) / len(exact)
    assert recall >= 0.9, f"native LSH recall {recall} over {len(exact)} pairs"
    assert all(j >= JACCARD_THRESHOLD - 1e-9 for j in native.values())


def test_bench_ab_prior_floor_excludes_current_round(tmp_path, monkeypatch):
    """r10 ADVICE: env_factor floors must come from a PRIOR-round
    triplicate — a round-N artifact was produced by HEAD code, and
    using it breaks the byte-identical-code premise."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "bench_ab", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_ab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def fake_trip(n, val):
        p = tmp_path / f"BENCH_TRIPLICATE_r{n}.json"
        p.write_text(json.dumps(
            {"per_id": {q: {"min": val, "max": val} for q in mod.AB_IDS}}
        ))

    fake_trip(9, 1.0)
    fake_trip(11, 99.0)  # HEAD-code triplicate: must NOT be selected
    (tmp_path / "BENCH_TRIPLICATE_rX.json").write_text("{}")  # stray
    monkeypatch.setattr(mod, "REPO", str(tmp_path))

    floors, src = mod._prior_floor(11)
    assert src == "BENCH_TRIPLICATE_r9.json"
    assert all(v == 1.0 for v in floors.values())

    floors, src = mod._prior_floor(9)
    assert floors == {} and "no prior-round triplicate" in src


def test_tree_depth2_plan_is_three_pass(spark):
    """Round-11 fusion guard: the deferred plan (leaf counts + the
    argmin reads over the 18-row cells checkpoint) may scan lineitem
    at most twice — the pre-fusion shape re-scanned it 8 times (one
    _tree_best_split per child + one aggregate per leaf)."""
    from cortana_intelligence_customer360_spark.features.inference import (
        ml_tree_depth2,
    )
    from cortana_intelligence_customer360_spark.plans.asserts import (
        plan_string,
    )

    plan = plan_string(ml_tree_depth2(spark, SF_DIR))
    assert plan.count("Scan parquet") <= 2, plan


def test_gbm_stumps_histograms_behind_checkpoints(spark):
    """Round-11 guard: best1/best2 are 1-row checkpoints, so the
    final rounds join must NOT re-evaluate the stack(3) histogram
    passes (pre-fix the deferred plan carried 3 stack fan-outs —
    one per re-computed round winner)."""
    from cortana_intelligence_customer360_spark.features.ml import (
        ml_gbm_stumps,
    )
    from cortana_intelligence_customer360_spark.plans.asserts import (
        plan_string,
    )

    plan = plan_string(ml_gbm_stumps(spark, SF_DIR))
    assert "stack" not in plan, plan
