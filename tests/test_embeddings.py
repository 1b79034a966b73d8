"""Semantic tests for embedding transforms: quantization error bound,
PCA variance ordering / determinism (emb_pca_reduce is R-tier — no SQL
oracle — so these tests ARE its correctness contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.llmops.embeddings import (
    _PCA_K,
    emb_pca_reduce,
    emb_quantize_int8,
    pca_model,
)
from cortana_intelligence_customer360_spark.sources.tables import load_table


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    q = emb_quantize_int8(spark, sf_dir).cache()
    # int8 range respected
    assert q.where((F.col("code") < -127) | (F.col("code") > 127)).count() == 0
    # dequantization error <= half a quantization step (0.5/scale)
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select("vec_id", "pos", F.col("x").cast("double").alias("x"))
    joined = q.join(flat, ["vec_id", "pos"])
    err = joined.select(
        (F.abs(F.col("x") - F.col("code") / F.col("scale"))
         - 0.5 / F.col("scale")).alias("excess")
    )
    assert err.where(F.col("excess") > 1e-12).count() == 0
    # every vector emits all 64 positions
    n_vec = emb.count()
    assert q.count() == n_vec * 64
    q.unpersist()


def test_pca_variance_ordering_and_shape(spark, sf_dir):
    model = pca_model(spark, sf_dir)
    ev = list(model.explainedVariance)
    assert len(ev) == _PCA_K
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:])), "variance must be sorted"
    assert all(v > 0 for v in ev)
    out = emb_pca_reduce(spark, sf_dir)
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert out.count() == n_vec * _PCA_K
    # deterministic across invocations (same data, same solver)
    again = emb_pca_reduce(spark, sf_dir)
    assert out.exceptAll(again).count() == 0


def test_ivf_upsert_equals_frozen_union_assignment(spark, sf_dir):
    """The upserted index (history index ∪ frozen-quantizer delta)
    must hold exactly the assignments you'd get by assigning the WHOLE
    union corpus with the same frozen centroids; and the serving read
    touches only index parquet (no embeddings scan)."""
    from pyspark.sql import functions as F

    from cortana_intelligence_customer360_spark.llmops.similarity import (
        _upsert_index,
        assign_frozen,
    )
    from cortana_intelligence_customer360_spark.sources.tables import load_table

    hist_dir, cent_dir, delta_dir = _upsert_index(spark, sf_dir)
    combined = spark.read.parquet(hist_dir).unionByName(
        spark.read.parquet(delta_dir)
    )
    plan = combined._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = spark.read.parquet(cent_dir)
    direct = assign_frozen(emb, centroids)
    got = {r["vec_id"]: r["cell"] for r in combined.select("vec_id", "cell").collect()}
    want = {r["vec_id"]: r["cell"] for r in direct.select("vec_id", "cell").collect()}
    # history cells come from the KMeans transform (euclidean argmin with
    # its own tie order); frozen re-assignment must agree on every vector
    assert got == want


def test_ivf_recall_profile_monotone_and_saturates(spark, sf_dir):
    """recall@k is non-decreasing in nprobe (a theorem under exact
    re-ranking: a true top-k member among the candidates can only be
    outranked by genuinely-better vectors, so recall = |truth ∩
    candidates| / k, and candidates grow with nprobe) — checked on the
    driver tables; on a clustered fixture the profile must reach 1.0
    once nprobe covers all cells."""
    import numpy as np

    from cortana_intelligence_customer360_spark.llmops import similarity

    rows = sorted(
        (r.nprobe, r.recall_at_k, r.n_hits, r.n_exact)
        for r in similarity.ann_ivf_recall_profile(spark, sf_dir).collect()
    )
    assert [r[0] for r in rows] == [1, 2, 4, 8]
    recalls = [r[1] for r in rows]
    assert recalls == sorted(recalls), recalls
    assert all(r[3] > 0 and 0.0 <= r[1] <= 1.0 for r in rows)
    assert all(r[2] == round(r[1] * r[3]) for r in rows)

    # Clustered fixture: 8 tight clusters, k=8 cells, sweep to nprobe=8
    # (all cells) => the widest setting IS exact search: recall 1.0.
    rng = np.random.default_rng(23)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(240) % 8] + 0.12 * rng.normal(size=(240, 32))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]], 0) for i in range(240)],
        "vec_id long, embedding array<float>, label int",
    )
    indexed, centroids = similarity.fit_ivf_frames(emb, k=8)
    exact = similarity.knn_exact_frame(emb)
    prof = sorted(
        (r.nprobe, r.recall_at_k)
        for r in similarity.ivf_recall_profile_frames(
            indexed, centroids, exact
        ).collect()
    )
    vals = [p[1] for p in prof]
    assert vals == sorted(vals), vals
    assert vals[-1] == 1.0, vals


def test_pq_contracts(spark, sf_dir):
    """PQ invariants: codes in [0, K); zero reconstruction error on a
    corpus with <= K distinct subvectors per subspace; MSE shrinks (or
    holds) when K grows on the real table."""
    import numpy as np

    from cortana_intelligence_customer360_spark.llmops import embeddings as E
    from cortana_intelligence_customer360_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books, width = E.pq_fit_codebooks(emb)
    enc = E.pq_encode_frame(emb, books, width)
    rows = enc.collect()
    assert len(rows) > 0
    for r in rows:
        for s in range(E._PQ_M):
            assert 0 <= r[f"code_{s}"] < E._PQ_K

    # planted corpus: every vector is one of K/2 distinct patterns ->
    # a K-centroid codebook must reconstruct exactly (MSE == 0)
    rng = np.random.default_rng(5)
    patterns = rng.normal(size=(E._PQ_K // 2, 32))
    pts = patterns[np.arange(256) % (E._PQ_K // 2)]
    planted = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(256)],
        "vec_id long, embedding array<float>",
    )
    # store as float32 -> fit sees float32-rounded values; cast back
    pbooks, pwidth = E.pq_fit_codebooks(planted)
    mse = E.pq_reconstruction_mse(planted, pbooks, pwidth).collect()[0].mse
    assert mse is not None and mse < 1e-9, mse

    # K-monotonicity on the real table
    books4, w4 = E.pq_fit_codebooks(emb, k=4)
    mse4 = E.pq_reconstruction_mse(emb, books4, w4).collect()[0].mse
    books16 = books
    mse16 = E.pq_reconstruction_mse(emb, books16, width).collect()[0].mse
    assert mse16 <= mse4 + 1e-9, (mse4, mse16)
