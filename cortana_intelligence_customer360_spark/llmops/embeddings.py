"""Embedding-column transforms: int8 scalar quantization and PCA
dimensionality reduction — the storage/compute shrink steps an
embedding corpus goes through before ANN indexing at scale.

Scale posture (100 TB): quantization is entirely map-side — the
per-vector max-abs comes from a JVM higher-order ``aggregate`` over
the array column (no shuffle, no Python); the only shuffle in this
module is PCA's Gramian accumulation (one treeAggregate over 64x64
matrices, independent of row count per partition).

Cross-engine float discipline for the O-tier quantizer: float32 ->
double casts are exact in both engines, max is exact, and the
quantized code uses floor(x*scale + 0.5) — floor is exact IEEE, so no
round-half-mode divergence (Spark HALF_UP vs DuckDB's banker's
rounding on doubles) can occur.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount
from ..sources.tables import load_table

_PCA_K = 8


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127/max|x|,
    code = floor(x*scale + 0.5). Emits (vec_id, pos, code, scale) rows
    — the (codes, scale) pair is what an int8 ANN index stores, at a
    4x memory cut. Map-only: amax via JVM aggregate() over the array,
    posexplode in place."""
    emb = load_table(spark, sf_dir, "embeddings")
    amax = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    df = emb.select("vec_id", "embedding", (F.lit(127.0) / amax).alias("scale"))
    return df.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "x"),
        "scale",
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * F.col("scale") + 0.5)
        .cast("int")
        .alias("code"),
        "scale",
    )


_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
         127.0 / list_max(list_transform(embedding,
                                         x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings),
flat AS (
  SELECT vec_id, r.i AS pos,
         CAST(embedding[r.i + 1] AS DOUBLE) AS x, scale
  FROM s, LATERAL (SELECT UNNEST(range(len(s.embedding))) AS i) r)
SELECT vec_id, CAST(pos AS INT) AS pos,
       CAST(floor(x * scale + 0.5) AS INT) AS code,
       scale
FROM flat
"""


def emb_pca_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA to 8 components over the embedding corpus (MLlib: one
    distributed Gramian/SVD pass), projected per vector and exploded
    to (vec_id, pos, component) rows. R-tier: eigenvector sign and
    low-order float bits are implementation-defined, so there is no
    SQL oracle — tests pin explained-variance ordering, projection
    norms, and determinism instead."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", array_to_vector("embedding").alias("features"))
    model = PCA(k=_PCA_K, inputCol="features", outputCol="pc").fit(vecs)
    out = model.transform(vecs).select(
        "vec_id", vector_to_array("pc").alias("pc")
    )
    return out.select("vec_id", F.posexplode("pc").alias("pos", "component")).select(
        "vec_id", "pos", F.round("component", 6).alias("component")
    )


def pca_model(spark: SparkSession, sf_dir: str):
    """The fitted PCA model (exposed for tests: explainedVariance)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", array_to_vector("embedding").alias("features"))
    return PCA(k=_PCA_K, inputCol="features", outputCol="pc").fit(vecs)


_MRL_K = 8


def emb_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation: keep the first ``_MRL_K`` dims of
    each embedding and L2-renormalize — the "cheap tier" of an MRL
    index (store a short prefix for coarse search, full vector for
    re-rank). Map-only like the quantizer: prefix via ``slice``, the
    sum of squares via a JVM ``aggregate`` fold into DECIMAL(30,6)
    (order-free exact, compat rule 1), posexplode in place — zero
    shuffles at any corpus size.

    Cross-engine: components are divided by the RAW norm (sqrt of the
    exact decimal sum cast to double — one IEEE op chain, identical
    both engines) and only rounded at emission (compat rule 3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, _MRL_K)
    sumsq = F.aggregate(
        head,
        F.lit("0").cast("decimal(30,6)"),
        lambda acc, x: (
            acc
            + F.round(x.cast("double") * x.cast("double"), 6).cast(
                "decimal(30,6)"
            )
        ).cast("decimal(30,6)"),
    )
    df = emb.select(
        "vec_id",
        head.alias("h"),
        F.sqrt(sumsq.cast("double")).alias("norm_raw"),
    )
    return df.select(
        "vec_id",
        F.posexplode("h").alias("pos", "x"),
        "norm_raw",
    ).select(
        "vec_id",
        "pos",
        F.when(
            F.col("norm_raw") > 0,
            F.round(F.col("x").cast("double") / F.col("norm_raw"), 6),
        ).alias("comp"),
        F.round("norm_raw", 6).alias("norm"),
    )


_MATRYOSHKA_SQL = f"""
WITH s AS (
  SELECT vec_id, list_slice(embedding, 1, {_MRL_K}) AS h FROM embeddings),
n AS (
  SELECT vec_id, h,
         sqrt(CAST(list_sum(list_transform(h,
           x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
                     AS DECIMAL(30,6)))) AS DOUBLE)) AS norm_raw
  FROM s),
flat AS (
  SELECT vec_id, norm_raw, r.i AS pos, CAST(h[r.i + 1] AS DOUBLE) AS x
  FROM n, LATERAL (SELECT UNNEST(range(len(n.h))) AS i) r)
SELECT vec_id, CAST(pos AS INT) AS pos,
       CASE WHEN norm_raw > 0 THEN round(x / norm_raw, 6) END AS comp,
       round(norm_raw, 6) AS norm
FROM flat
"""



def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene screen per label: L2-norm distribution
    (min/mean/max) and the count of non-unit vectors — the first
    check before any cosine-based pipeline (an unnormalized feed
    silently breaks dot-product == cosine assumptions).

    The norm is a LEFT FOLD over the array (F.aggregate ↔ DuckDB
    list_reduce, same evaluation order) so the float sum is
    bit-identical; per-vector norms round to 6 dp before the DECIMAL
    mean. Map-only per vector + one label-keyed aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    ss = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    per = emb.select(
        "label", F.round(F.sqrt(ss), 6).alias("norm")
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min("norm").alias("min_norm"),
        F.max("norm").alias("max_norm"),
        F.round(
            F.sum(F.col("norm").cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_norm"),
        F.sum(
            F.when(F.abs(F.col("norm") - 1.0) > 0.01, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_nonunit"),
    )


_NORM_SQL = """
WITH per AS (
  SELECT label,
         round(sqrt(list_reduce(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (a, b) -> a + b)), 6) AS norm
  FROM embeddings)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       MIN(norm) AS min_norm,
       MAX(norm) AS max_norm,
       round(CAST(SUM(CAST(norm AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_norm,
       CAST(SUM(CASE WHEN abs(norm - 1.0) > 0.01 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nonunit
FROM per GROUP BY label
"""


QUERIES = {
    "emb_norm_stats": emb_norm_stats,
    "emb_quantize_int8": emb_quantize_int8,
    "emb_matryoshka_truncate": emb_matryoshka_truncate,
    "emb_pca_reduce": emb_pca_reduce,
}

ORACLE = {
    "emb_norm_stats": _NORM_SQL,
    "emb_quantize_int8": _QUANTIZE_SQL,
    "emb_matryoshka_truncate": _MATRYOSHKA_SQL,
}


# ---------------------------------------------------------------------------
# Product quantization (round 5): the codebook compression behind
# billion-vector ANN indexes (IVF-PQ). The embedding is split into
# _PQ_M contiguous subvectors; each subspace gets its own seeded
# KMeans codebook of _PQ_K centroids (fit on a bounded sample, same
# discipline as the IVF coarse quantizer), and a vector stores only
# its M one-byte code ids — a dim*4 / M -byte compression. Encode =
# one broadcast-codebook map pass (argmin over K per subspace), never
# a shuffle of the corpus. R-tier: codes depend on the fitted model;
# tests/test_embeddings.py pins the contracts (code range, exact
# zero reconstruction error on a corpus with <= K distinct subvectors,
# and reconstruction MSE shrinking as K grows).

_PQ_M = 4  # subquantizers
_PQ_K = 16  # codes per subspace


def pq_fit_codebooks(emb, m: int = _PQ_M, k: int = _PQ_K):
    """Fit one codebook per subspace with seeded Lloyd iterations in
    numpy over a BOUNDED sample (2048 vectors — faiss-style: PQ
    codebooks train on an in-memory sample regardless of corpus size,
    then the encode pass is distributed). Returns ({sub_idx:
    [centroids]}, subvector width). Deterministic: fixed seed, fixed
    iteration count, ties in assignment resolved by argmin's
    first-lowest-index rule."""
    import numpy as np

    sample = np.array(
        [r[0] for r in emb.select("embedding").limit(2048).collect()],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    width = dim // m
    books = {}
    for sidx in range(m):
        sub = sample[:, sidx * width : (sidx + 1) * width]
        rng = np.random.default_rng(42 + sidx)
        cents = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books[sidx] = [[float(x) for x in c] for c in cents]
    return books, width


def pq_encode_frame(emb, books: dict, width: int):
    """Broadcast-codebook encode: per subspace, argmin squared
    distance over the K centroids — a pure column expression (the K
    distances are unrolled literals), so the corpus pass is map-only
    whole-stage codegen, no Python."""
    spark = emb.sparkSession
    out = emb.select("vec_id", "embedding")
    for s, cents in books.items():
        sub = F.slice("embedding", s * width + 1, width)
        d2 = [
            F.aggregate(
                F.zip_with(
                    sub,
                    F.array(*[F.lit(c) for c in cent]),
                    lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for cent in cents
        ]
        # argmin via array_position over the min of the literal-indexed array
        arr = F.array(*d2)
        code = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        out = out.withColumn(f"code_{s}", code)
    return out


def _pq_err_expr(books: dict, width: int):
    """Squared reconstruction error column over an ENCODED frame
    (embedding + code_s columns): per subspace, element_at over the
    literal codebook array looks the assigned centroid back up."""
    err = None
    for s, cents in books.items():
        sub = F.slice("embedding", s * width + 1, width)
        # centroid lookup: element_at over the literal codebook array
        book = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
        cent = F.element_at(book, F.col(f"code_{s}") + 1)
        e = F.aggregate(
            F.zip_with(sub, cent, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        err = e if err is None else err + e
    return err


def pq_reconstruction_mse(emb, books: dict, width: int):
    """Mean squared reconstruction error across the corpus — the
    compression-quality scalar an index tuner watches."""
    enc = pq_encode_frame(emb, books, width)
    return enc.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.avg(_pq_err_expr(books, width)), 6).alias("mse"),
    )


def emb_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes for the embeddings table plus the per-corpus
    reconstruction MSE row: (vec_id, code_0..code_3) joined with the
    corpus quality scalar (broadcast 1-row).

    One corpus pass (guide §1.2: remove passes before tuning anything
    else): the round-10 shape ran the encode expression TWICE — once
    for the output codes and again inside pq_reconstruction_mse — and
    the encode is the op's entire cost (M*K interpreted higher-order
    aggregates per row). Codes + per-row err now materialize once via
    localCheckpoint (narrow: vec_id, 4 int codes, 1 double — the
    embedding array is dropped before the checkpoint), and both the
    1-row MSE aggregate and the returned frame read that in-memory
    relation. Values are byte-identical: same codes, same per-row err
    terms, same 6-dp rounded average."""
    emb = load_table(spark, sf_dir, "embeddings")
    books, width = pq_fit_codebooks(emb)
    enc = (
        pq_encode_frame(emb, books, width)
        .withColumn("_err", _pq_err_expr(books, width))
        .drop("embedding")
        .localCheckpoint()
    )
    quality = enc.agg(F.round(F.avg("_err"), 6).alias("mse"))
    return enc.drop("_err").crossJoin(F.broadcast(quality))


QUERIES["emb_product_quantization"] = emb_product_quantization
# R-tier: codes are KMeans-model output; contracts pinned in
# tests/test_embeddings.py (range, zero-error planted corpus,
# K-monotone MSE).


def emb_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantile (rank) normalization of the embedding
    matrix — sklearn QuantileTransformer semantics with min-rank ties:
    q = (rank - 1)/(n - 1) maps every dimension onto [0, 1] by rank,
    the preprocessing that makes dimensions comparable before distance
    math when their scales drift (a real hazard after PCA/PQ stages).

    Shape: posexplode to (vec_id, dim, val) long form — n x d rows, the
    natural layout for per-dim stats — then ONE window keyed by dim
    (d partitions, each n rows; at 100 TB you'd range-partition within
    dim, the house distributed-rank pattern). q is an exact integer
    ratio evaluated identically in both engines; output stays long
    form (compat rule 6: no arrays in final output)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    long = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), F.col("val").cast("double").alias("val"))
    w = Window.partitionBy("dim").orderBy("val")
    wn = Window.partitionBy("dim")
    return long.select(
        "vec_id",
        "dim",
        F.round(
            (F.rank().over(w) - F.lit(1)).cast("double")
            / (F.count("*").over(wn) - F.lit(1)).cast("double"),
            6,
        ).alias("q"),
    )


_EMB_QNORM_SQL = """
WITH long AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         CAST(d.i AS BIGINT) AS dim,
         CAST(embedding[d.i + 1] AS DOUBLE) AS val
  FROM embeddings,
       UNNEST(range(0, len(embedding))) AS d(i))
SELECT vec_id, dim,
       round(CAST(rank() OVER (PARTITION BY dim ORDER BY val) - 1 AS DOUBLE)
             / CAST(COUNT(*) OVER (PARTITION BY dim) - 1 AS DOUBLE), 6) AS q
FROM long
"""

QUERIES["emb_quantile_normalize"] = emb_quantile_normalize
ORACLE["emb_quantile_normalize"] = _EMB_QNORM_SQL


_RP_K = 4  # target dims
_EMB_DIMS = 64  # embedding width (all SFs; pinned by the parity sweep)


def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection to K=4 dims: the
    full-oracle dimensionality reduction next to emb_pca_reduce's
    R-tier PCA. Projection matrix entries are DETERMINISTIC signs
    s(k,d) = +1 if (k*31 + d*17) % 2 = 0 else -1 — reproducible across
    engines/runs, no RNG state; y_k = sum_d s(k,d) x_d / sqrt(K).

    Map-only (no shuffle at all): each vector folds its own array via
    an explicit per-dim expression chain, summed left-associatively in
    the SAME order in both engines, so the result is bit-identical
    before the 6-dp display rounding. Output long form (vec_id, k, y)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = _EMB_DIMS
    inv_sqrt_k = 1.0 / math.sqrt(_RP_K)
    outs = []
    for k in range(_RP_K):
        term = None
        for d in range(dims):
            sgn = 1.0 if (k * 31 + d * 17) % 2 == 0 else -1.0
            t = F.lit(sgn) * F.col("embedding").getItem(d).cast("double")
            term = t if term is None else term + t
        outs.append(
            F.struct(
                F.lit(k).cast("long").alias("k"),
                # floor-based 6-dp quantization: round() implementations
                # differ at half-ulp boundaries across engines, but
                # floor(x*1e6 + 0.5)/1e6 is pure IEEE on identical
                # operands — bit-deterministic.
                (
                    F.floor(term * F.lit(inv_sqrt_k) * 1000000.0 + 0.5).cast(
                        "double"
                    )
                    / 1000000.0
                ).alias("y"),
            )
        )
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.explode(F.array(*outs)).alias("p"),
    ).select("vec_id", F.col("p.k").alias("k"), F.col("p.y").alias("y"))


def _rp_sql(dims: int = _EMB_DIMS) -> str:
    inv_sqrt_k = 1.0 / math.sqrt(_RP_K)
    selects = []
    for k in range(_RP_K):
        chain = " + ".join(
            f"({'1.0' if (k * 31 + d * 17) % 2 == 0 else '-1.0'}"
            f" * CAST(embedding[{d + 1}] AS DOUBLE))"
            for d in range(dims)
        )
        selects.append(
            f"SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST({k} AS BIGINT) AS k,"
            f" floor((({chain}) * {inv_sqrt_k!r}) * 1000000.0 + 0.5)"
            f" / 1000000.0 AS y FROM embeddings"
        )
    return " UNION ALL ".join(selects)


QUERIES["emb_random_projection"] = emb_random_projection
ORACLE["emb_random_projection"] = _rp_sql()


_COS_HIST_MOD = 5  # deterministic sample: vec_id % 5 == 0
_COS_HIST_BINS = 20


def emb_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution diagnostic: histogram of all
    pairwise cosines over a deterministic 1-in-5 sample of the corpus
    (vec_id % 5 == 0), 20 bins over [-1, 1] — the embedding-collapse /
    anisotropy screen (a healthy space is centered near 0; a collapsed
    one piles up near 1) run before trusting any cosine threshold.

    Dots are the same left-fold as sim_knn_exact, rounded 6 dp BEFORE
    binning so floor((cos+1)/2*20) can't straddle engines; the bin is
    clamped so cos = 1.0 lands in the top bin. The quadratic pair join
    runs only on the bounded sample (diagnostics contract: sample size
    is fixed, not data-sized).
    """
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % _COS_HIST_MOD == 0
    )
    a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    dots = (
        a.join(F.broadcast(b), F.col("ida") < F.col("idb"))
        .select(
            F.round(
                F.aggregate(
                    F.zip_with(
                        "va", "vb", lambda x, y: x.cast("double") * y.cast("double")
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("cos")
        )
    )
    binned = dots.select(
        F.least(
            F.floor((F.col("cos") + 1.0) / 2.0 * _COS_HIST_BINS).cast("long"),
            F.lit(_COS_HIST_BINS - 1),
        ).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(bcount().alias("n_pairs"))
        .orderBy("bin")
    )


_COS_HIST_SQL = f"""
WITH s AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {_COS_HIST_MOD} = 0),
dots AS (
  -- list_dot_product on DOUBLE-cast lists = Spark's F.aggregate left
  -- fold bit-exactly (see similarity._KNN_SQL; ADVICE r8) — and it
  -- streams per pair, where the old unnest-join + SUM materialized
  -- O(sample^2) hash-agg groups.
  SELECT round(list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])), 6) AS cos
  FROM s p JOIN s c ON p.vec_id < c.vec_id),
binned AS (
  SELECT LEAST(CAST(FLOOR((cos + 1.0) / 2.0 * {_COS_HIST_BINS}) AS BIGINT),
               {_COS_HIST_BINS - 1}) AS bin
  FROM dots)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM binned GROUP BY bin ORDER BY bin
"""

QUERIES["emb_cosine_histogram"] = emb_cosine_histogram
ORACLE["emb_cosine_histogram"] = _COS_HIST_SQL


_HAM_PROBES = 5
_HAM_TOPK = 10


def emb_sign_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit Hamming ANN sketch: each 64-dim embedding compresses
    to ONE 64-bit integer of coordinate signs, and candidate
    similarity is 64 - popcount(xor) — the 512x-smaller prefilter a
    vector pipeline runs before exact cosine re-ranking (SimHash for
    dense vectors). Emits the top-10 sketch neighbors per probe
    (vec_id < 5).

    Everything is exact integer bit math (bit_count(xor) in both
    engines), so the oracle matches bit-for-bit — no float anywhere.
    At scale the sketch table is a map-only projection and the probe
    join broadcasts 5 rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # 63 sign bits (not 64): bit 63 would overflow DuckDB's signed
    # BIGINT left shift; one dropped dimension costs ~1.6% of the
    # sketch's resolution and keeps both engines in exact integer range.
    bits = F.expr(
        "aggregate(zip_with(slice(embedding, 1, 63),"
        " sequence(0, least(size(embedding), 63) - 1),"
        " (v, i) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), i)"
        " ELSE CAST(0 AS BIGINT) END),"
        " CAST(0 AS BIGINT), (acc, x) -> acc | x)"
    )
    sk = emb.select("vec_id", bits.alias("sig"))
    probes = sk.where(F.col("vec_id") < _HAM_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("sig").alias("psig")
    )
    scored = sk.crossJoin(F.broadcast(probes)).where(
        F.col("vec_id") != F.col("probe_id")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.expr("bit_count(sig ^ psig)").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn(
            "hamming", F.expr("bit_count(sig ^ psig)").cast("long")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _HAM_TOPK)
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), "hamming", "rank")
        .orderBy("probe_id", "rank")
    )


_HAMMING_SQL = f"""
WITH sk AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(LEAST(len(embedding), 63)),
              i -> CASE WHEN embedding[i + 1] > 0
                        THEN (CAST(1 AS BIGINT) << i)
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
  FROM embeddings),
probes AS (
  SELECT vec_id AS probe_id, sig AS psig FROM sk WHERE vec_id < {_HAM_PROBES}),
scored AS (
  SELECT p.probe_id, s.vec_id AS neighbor_id,
         CAST(bit_count(xor(s.sig, p.psig)) AS BIGINT) AS hamming
  FROM sk s CROSS JOIN probes p
  WHERE s.vec_id <> p.probe_id),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        ORDER BY hamming ASC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT probe_id, neighbor_id, hamming, rank
FROM ranked WHERE rank <= {_HAM_TOPK}
ORDER BY probe_id, rank
"""

QUERIES["emb_sign_hamming_topk"] = emb_sign_hamming_topk
ORACLE["emb_sign_hamming_topk"] = _HAMMING_SQL


def ml_nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classifier evaluation on the
    embedding corpus: md5 75/25 train/test split, per-label centroids
    from the train vectors (6 dp-quantized per-dimension means), test
    vectors assigned to the highest-dot-product centroid — per-label
    test counts, hits, and accuracy. The simplest embedding classifier
    and the baseline ml_knn_classifier must beat.

    Determinism: centroid components quantize to 6 dp (exact decimal
    means of identical doubles), per-(vec, label) scores are DECIMAL
    sums of identical products rounded 6 dp before the argmax
    (tiebreak: smaller label). Shape: one flat explode, a (label x
    dim)-bounded centroid aggregate, and a pos-keyed join whose
    fan-out is the 10-label constant.
    """
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "part",
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 4,
    )
    flat = emb.select(
        "vec_id",
        "label",
        "part",
        F.posexplode("embedding").alias("pos", "v"),
    ).select("vec_id", "label", "part", "pos", F.col("v").cast("double").alias("v"))
    cents = (
        flat.where(F.col("part") != 0)
        .groupBy(F.col("label").alias("clabel"), "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(30,18)")).cast("double")
                / F.count("*"),
                6,
            ).alias("c")
        )
    )
    test = flat.where(F.col("part") == 0)
    scores = (
        test.join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum((F.col("v") * F.col("c")).cast("decimal(30,18)"))
            .cast("double")
            .alias("dot")
        )
        .select(
            "vec_id",
            "label",
            "clabel",
            F.round("dot", 6).alias("dot"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("clabel").asc()
    )
    pred = (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "label", F.col("clabel").alias("pred"))
    )
    return (
        pred.groupBy("label")
        .agg(
            bcount().alias("n_test"),
            F.sum((F.col("pred") == F.col("label")).cast("long"))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "label",
            "n_test",
            "n_correct",
            F.round(
                F.expr("CAST(n_correct AS DOUBLE) / CAST(n_test AS DOUBLE)"), 6
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


_NEAREST_CENTROID_SQL = """
WITH emb AS (
  SELECT vec_id, label, embedding,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 4
           AS part
  FROM embeddings),
flat AS (
  SELECT vec_id, label, part, r.i AS pos,
         CAST(embedding[r.i + 1] AS DOUBLE) AS v
  FROM emb, LATERAL (SELECT UNNEST(range(len(emb.embedding))) AS i) r),
cents AS (
  SELECT label AS clabel, pos,
         round(CAST(SUM(CAST(v AS DECIMAL(30,18))) AS DOUBLE) / COUNT(*), 6)
           AS c
  FROM flat WHERE part <> 0 GROUP BY 1, 2),
scores AS (
  SELECT t.vec_id, t.label, c.clabel,
         round(CAST(SUM(CAST(t.v * c.c AS DECIMAL(30,18))) AS DOUBLE), 6)
           AS dot
  FROM flat t JOIN cents c ON t.pos = c.pos
  WHERE t.part = 0
  GROUP BY 1, 2, 3),
pred AS (
  SELECT vec_id, label, clabel AS pred
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY dot DESC, clabel ASC) AS rk FROM scores)
  WHERE rk = 1)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM pred
GROUP BY label
ORDER BY label
"""

QUERIES["ml_nearest_centroid_eval"] = ml_nearest_centroid_eval
ORACLE["ml_nearest_centroid_eval"] = _NEAREST_CENTROID_SQL


_TRIPLET_ANCHORS = 20


def emb_triplet_violation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding metric-quality audit via triplets: for each anchor
    (vec_id < 20), compare its cosine to every SAME-label vector
    (positive) against every OTHER-label vector (negative); a
    violation is a (pos, neg) pair with cos(a,n) >= cos(a,p). Reports
    the per-anchor-label violation rate — 0.5 means the space carries
    no label signal, 0 means perfectly separated.

    Counting trick: no pos x neg pair join — sort each anchor's
    scored candidates by (cosine desc, id) once; violations = for each
    positive, the number of negatives ranked at-or-above it, obtained
    from a running negative count (exact integers). Dots are the
    left-fold 6 dp discipline of sim_knn_exact.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < _TRIPLET_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("alabel"),
        F.col("embedding").alias("avec"),
    )
    cands = emb.select("vec_id", "label", "embedding")
    scored = (
        cands.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            "alabel",
            (F.col("label") == F.col("alabel")).cast("long").alias("is_pos"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        "avec",
                        "embedding",
                        lambda x, y: x.cast("double") * y.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("cos"),
            "vec_id",
        )
    )
    w = Window.partitionBy("aid").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = scored.withColumn(
        "negs_above", F.sum(1 - F.col("is_pos")).over(w)
    )
    per_anchor = ranked.where(F.col("is_pos") == 1).groupBy("aid", "alabel").agg(
        bcount().alias("n_pos"),
        F.sum("negs_above").cast("long").alias("violations"),
    )
    negs = scored.groupBy("aid").agg(
        F.sum(1 - F.col("is_pos")).cast("long").alias("n_neg")
    )
    return (
        per_anchor.join(negs, "aid")
        .groupBy("alabel")
        .agg(
            bcount().alias("n_anchors"),
            F.round(
                F.expr(
                    "CAST(SUM(violations) AS DOUBLE)"
                    " / CAST(SUM(n_pos * n_neg) AS DOUBLE)"
                ),
                6,
            ).alias("violation_rate"),
        )
        .orderBy("alabel")
    )


_TRIPLET_SQL = f"""
WITH anchors AS (
  SELECT vec_id AS aid, label AS alabel, embedding AS avec
  FROM embeddings WHERE vec_id < {_TRIPLET_ANCHORS}),
scored AS (
  -- list_dot_product = Spark's F.aggregate fold, bit-exact
  -- (see similarity._KNN_SQL; ADVICE r8)
  SELECT a.aid, a.alabel, c.vec_id,
         CAST(CASE WHEN c.label = a.alabel THEN 1 ELSE 0 END AS BIGINT)
           AS is_pos,
         round(list_dot_product(CAST(a.avec AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])), 6) AS cos
  FROM anchors a JOIN embeddings c ON c.vec_id <> a.aid),
ranked AS (
  SELECT *, SUM(1 - is_pos) OVER (PARTITION BY aid
        ORDER BY cos DESC, vec_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS negs_above
  FROM scored),
per_anchor AS (
  SELECT aid, alabel, CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(SUM(negs_above) AS BIGINT) AS violations
  FROM ranked WHERE is_pos = 1 GROUP BY 1, 2),
negs AS (
  SELECT aid, CAST(SUM(1 - is_pos) AS BIGINT) AS n_neg
  FROM scored GROUP BY aid)
SELECT alabel, CAST(COUNT(*) AS BIGINT) AS n_anchors,
       round(CAST(SUM(violations) AS DOUBLE)
             / CAST(SUM(n_pos * n_neg) AS DOUBLE), 6) AS violation_rate
FROM per_anchor p JOIN negs n ON p.aid = n.aid
GROUP BY alabel
ORDER BY alabel
"""

QUERIES["emb_triplet_violation_rate"] = emb_triplet_violation_rate
ORACLE["emb_triplet_violation_rate"] = _TRIPLET_SQL
