"""Deduplication operators for the training-data pipeline (SURVEY.md
§2.9 + BASELINE north star): exact, n-gram-Jaccard, MinHash-LSH,
SimHash, and embedding-cosine near-dup.

Scale shapes:
- exact dedup: one hash-groupBy shuffle on the normalized-text digest.
- n-gram Jaccard: shingle -> explode -> self-join ON SHINGLE (inverted
  index join) - candidate pairs only ever meet through a shared
  shingle, never an all-pairs product.
- MinHash-LSH: pyspark.ml MinHashLSH banding - the sub-quadratic path
  that replaces exact Jaccard beyond ~1M docs.
- SimHash: two aggregate shuffles, output one 16-bit sketch per doc.
- embedding cosine: exact all-pairs here (oracle-checkable);
  sim_lsh_ann in similarity.py is the approximate scale path.

Shingling is word-3-grams: unigram token sets saturate on this corpus
(FIXTURES.md - 32k false pairs vs 28 planted near-dup pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.8

# Stop-shingle cap for the exact-Jaccard inverted index: shingles whose
# document frequency exceeds SHINGLE_DF_CAP are dropped from the index
# BEFORE the self-join (standard stop-shingle removal). The self-join
# cost is sum(df^2) per shingle, so an uncapped hot shingle makes the
# op quadratic in corpus size while a constant cap keeps it linear
# (measured: 10x data costs 8.4x capped vs 51x uncapped on this
# corpus). CONTRACT: Jaccard is computed over the capped shingle
# universe — exact for any pair whose shingles are all below the cap;
# pairs whose overlap lives in corpus-hot shingles can be missed (those
# are near-boilerplate matches, the ones near-dup pipelines
# deliberately ignore). At sf0.01, the driver's correctness scale, no
# shingle reaches the cap, so results there are identical to the
# uncapped form. The oracle SQL applies the same cap.
SHINGLE_DF_CAP = 8


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keep the min doc_id per
    md5(lower(trim(text))) key."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("text_key"))
    return keyed.groupBy("text_key").agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        bcount().alias("n_dups"),
    )


_DEDUP_EXACT_SQL = """
SELECT md5(lower(trim(text))) AS text_key,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
"""


def shingle_frame(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) rows: distinct word n-grams per document.

    The token array is materialized once per row before the lambda
    (split() inside the transform would be re-evaluated per element -
    codegen does not CSE across lambda scopes)."""
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    shingles = F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(shingles).alias("shingle"))
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (J >= 0.5) via an
    inverted-index self-join: explode shingles, join on the shingle,
    count common shingles per pair, then J = common/(na+nb-common).
    The Jaccard value divides two exact integers, so it is
    bit-identical across engines. Shingles hotter than SHINGLE_DF_CAP
    are dropped from the index first (see the cap contract above) so
    the self-join stays linear in corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    # No .cache(): the shingle scan is cheap to recompute and a cached
    # frame would pin executor memory for the life of the session.
    sh_all = shingle_frame(docs)
    rare = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= SHINGLE_DF_CAP)
        .select("shingle")
    )
    sh = sh_all.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    jac = (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= JACCARD_THRESHOLD)


_CONTAIN_THRESHOLD = 0.8


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT C(src→dst) = |src ∩ dst| / |src|
    — the near-dup measure Jaccard misses: a short document pasted
    verbatim inside a longer one scores C ≈ 1 while J stays tiny
    (Broder's containment, the sub-document-duplication screen every
    pretraining pipeline needs alongside symmetric dedup).

    Same frequency-capped inverted index as dedup_ngram_jaccard (the
    df ≤ SHINGLE_DF_CAP contract and its linearity guarantee carry
    over verbatim); the pair direction with the SMALLER shingle set is
    the source. Exact integer ratio — bit-identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    sh_all = shingle_frame(docs)
    rare = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= SHINGLE_DF_CAP)
        .select("shingle")
    )
    sh = sh_all.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    paired = common.join(sa, "a_id").join(sb, "b_id")
    src_id = F.when(F.col("na") <= F.col("nb"), F.col("a_id")).otherwise(
        F.col("b_id")
    )
    dst_id = F.when(F.col("na") <= F.col("nb"), F.col("b_id")).otherwise(
        F.col("a_id")
    )
    n_src = F.least("na", "nb")
    cont = F.col("n_common").cast("double") / n_src.cast("double")
    return (
        paired.select(
            src_id.alias("src_id"),
            dst_id.alias("dst_id"),
            F.col("n_common"),
            n_src.alias("n_src"),
            cont.alias("containment"),
        )
        .where(F.col("containment") >= _CONTAIN_THRESHOLD)
    )


_CONTAINMENT_SQL = f"""
WITH sh_all AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(len(l) - 2),
                          i -> concat_ws(' ', l[i+1], l[i+2], l[i+3])))) AS shingle
  FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents)),
rare AS (
  SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
sh AS (SELECT sh_all.* FROM sh_all JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
paired AS (
  SELECT a_id, b_id, n_common, sa.n_sh AS na, sb.n_sh AS nb
  FROM common
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id)
SELECT CASE WHEN na <= nb THEN a_id ELSE b_id END AS src_id,
       CASE WHEN na <= nb THEN b_id ELSE a_id END AS dst_id,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(LEAST(na, nb) AS BIGINT) AS n_src,
       CAST(n_common AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE)
         AS containment
FROM paired
WHERE CAST(n_common AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE)
      >= {_CONTAIN_THRESHOLD}
"""


_NGRAM_JACCARD_SQL = f"""
WITH sh_all AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(len(l) - 2),
                          i -> concat_ws(' ', l[i+1], l[i+2], l[i+3])))) AS shingle
  FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents)),
rare AS (
  SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
sh AS (SELECT sh_all.* FROM sh_all JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""


# MinHash parameters: K seeded universal-hash functions over 32-bit
# shingle digests, banded r rows x b bands. r=2/b=24 puts the LSH
# S-curve threshold at J ~= (1/b)^(1/r) ~= 0.20, so J >= 0.5 pairs are
# caught with probability 1-(1-0.25)^24 > 0.999.
_MH_K = 48
_MH_R = 2
_MH_B = _MH_K // _MH_R
_MH_P = (1 << 61) - 1  # Mersenne prime modulus

import random as _random

_rng = _random.Random(42)
_MH_A = [_rng.randrange(1, 1 << 30) for _ in range(_MH_K)]
_MH_B_OFF = [_rng.randrange(0, _MH_P) for _ in range(_MH_K)]


# Per-band bucket candidate cap: a band bucket holding > _MH_BUCKET_CAP
# docs would generate O(bucket^2) candidate pairs inside ONE bucket —
# mass-duplicated boilerplate (legal footers, templated pages) recreates
# the quadratic blowup banding exists to avoid. Buckets over the cap are
# skipped for pair generation (dedup_minhash_audit reports them); the
# DuckDB oracle applies the same cap, and at the driver's sf0.01 the
# observed max bucket is 4, so the cap never binds there (exactness is
# unchanged where it is checked). The boilerplate such buckets hold is
# better handled by dedup_exact / dedup_cluster_stars anyway.
_MH_BUCKET_CAP = 32


def _mh_sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) — the K seeded minhashes per doc as one array.
    One groupBy-min shuffle."""
    sh = shingle_frame(docs)
    h32 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    mh_cols = [
        (F.lit(_MH_A[k]) * F.col("h") + F.lit(_MH_B_OFF[k])) % _MH_P
        for k in range(_MH_K)
    ]
    return (
        sh.select("doc_id", h32.alias("h"))
        .groupBy("doc_id")
        .agg(*[F.min(mh_cols[k]).alias(f"m{k}") for k in range(_MH_K)])
        .select(
            "doc_id", F.array(*[f"m{k}" for k in range(_MH_K)]).alias("sig")
        )
    )


def _mh_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, sig, band, bkey): one row per (doc, band)."""
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * _MH_R + r + 1)
                            for r in range(_MH_R)
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(_MH_B)
        ]
    )
    return sigs.select("doc_id", "sig", F.explode(band_keys).alias("bk")).select(
        "doc_id",
        "sig",
        F.col("bk.band").alias("band"),
        F.col("bk.bkey").alias("bkey"),
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at Jaccard >= ~0.5 over 3-gram
    shingles, composed from DataFrame ops (no per-pair vector pass):

    1. shingle digests: 32-bit ints from md5 (deterministic),
    2. K=48 minhashes per doc: one groupBy-min shuffle,
    3. banding: md5 over each band's rows, explode, self-join on the
       band key (candidates only ever meet through a shared bucket -
       the sub-quadratic property that survives 100 TB),
    4. estimate J as the matching-minhash fraction, keep >= 0.4
       (slack under the 0.5 target absorbs +-1/sqrt(K) estimator noise;
       exact downstream check is dedup_ngram_jaccard's join).

    Buckets holding more than _MH_BUCKET_CAP docs are skipped for pair
    generation (see the cap's comment; dedup_minhash_audit surfaces
    them), bounding per-bucket work at any corpus duplication level.

    Every stage is deterministic given the seeded hash family, so this
    carries a FULL oracle: the DuckDB SQL mirrors the same digests,
    minhash lattice, banding, bucket cap and estimate; tests
    additionally assert recall vs the exact Jaccard pairs on sf0.001."""
    docs = load_table(spark, sf_dir, "documents")
    # Signatures are computed once and lineage-truncated: the band
    # explode and both sides of the signature lookup below reuse the
    # materialized rows instead of re-running the shingle pipeline.
    sigs = _mh_sigs(docs).localCheckpoint()
    # Candidate pairs travel SLIM (two longs) through the band join and
    # the dedup — the K=48 signature arrays are attached afterwards by
    # doc-keyed joins, so they move once per surviving pair, not once
    # per (band × bucket-pair). The bucket-size window shares the
    # (band, bkey) hash partitioning with the self-join, so the cap
    # costs no extra shuffle.
    w = Window.partitionBy("band", "bkey")
    buckets = (
        _mh_bands(sigs)
        .drop("sig")
        .withColumn("bsize", F.count(F.lit(1)).over(w))
        .where(F.col("bsize") <= _MH_BUCKET_CAP)
        .drop("bsize")
    )
    a = buckets.select(F.col("doc_id").alias("a_id"), "band", "bkey")
    b = buckets.select(F.col("doc_id").alias("b_id"), "band", "bkey")
    pairs = (
        a.join(b, ["band", "bkey"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = pairs.join(
        sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("sig_a")),
        "a_id",
    ).join(
        sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("sig_b")),
        "b_id",
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / F.lit(float(_MH_K))
    return cand.select("a_id", "b_id", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= JACCARD_THRESHOLD - 0.1
    )


def _mh_buckets_sql() -> str:
    """The WITH-chain (shingles → minhash sigs → band buckets) shared
    by the minhash oracle and its audit — same seeded hash constants
    as the Spark path (a*h fits int64: a < 2^30, h < 2^32)."""
    mh_cols = ",\n         ".join(
        f"MIN(({_MH_A[k]}::BIGINT * h + {_MH_B_OFF[k]}::BIGINT) % {_MH_P}) AS m{k}"
        for k in range(_MH_K)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, sig, {b} AS band, "
        f"md5(concat_ws(',', {', '.join(f'sig[{b * _MH_R + r + 1}]' for r in range(_MH_R))})) AS bkey "
        f"FROM sigs"
        for b in range(_MH_B)
    )
    sig_list = ", ".join(f"m{k}" for k in range(_MH_K))
    return f"""sh AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(len(l) - 2),
                          i -> concat_ws(' ', l[i+1], l[i+2], l[i+3])))) AS shingle
  FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents)),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
mins AS (
  SELECT doc_id,
         {mh_cols}
  FROM hashed GROUP BY doc_id),
sigs AS (
  SELECT doc_id, [{sig_list}] AS sig FROM mins),
buckets AS (
{band_rows}
)"""


def _minhash_oracle_sql() -> str:
    """DuckDB mirror of dedup_minhash: shared bucket chain, then the
    bucket-capped self-join and minhash-agreement estimate."""
    return f"""
WITH {_mh_buckets_sql()},
kept AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bsize FROM buckets)
  WHERE bsize <= {_MH_BUCKET_CAP}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS sig_a, b.sig AS sig_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
SELECT a_id, b_id,
       CAST(len(list_filter(range({_MH_K}), i -> sig_a[i+1] = sig_b[i+1])) AS DOUBLE)
         / {float(_MH_K)} AS est_jaccard
FROM cand
WHERE CAST(len(list_filter(range({_MH_K}), i -> sig_a[i+1] = sig_b[i+1])) AS DOUBLE)
      / {float(_MH_K)} >= {JACCARD_THRESHOLD - 0.1}
"""


def dedup_minhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH bucket health: bucket count, largest bucket, and
    how many buckets (and docs inside them) exceed _MH_BUCKET_CAP —
    i.e. what dedup_minhash's cap skipped. The operational dashboard
    for the capped pipeline: a band with over-cap buckets means
    mass-duplicated boilerplate that should be routed to exact dedup.
    Two node-light shuffles over band-bucket aggregates; never touches
    pair space."""
    docs = load_table(spark, sf_dir, "documents")
    per_bucket = _mh_bands(_mh_sigs(docs)).groupBy("band", "bkey").agg(
        bcount().alias("bsize")
    )
    return per_bucket.groupBy(F.col("band").cast("long").alias("band")).agg(
        bcount().alias("n_buckets"),
        F.max("bsize").cast("long").alias("max_bucket"),
        F.sum(
            F.when(F.col("bsize") > _MH_BUCKET_CAP, 1).otherwise(0)
        ).cast("long").alias("n_overcap"),
        F.sum(
            F.when(F.col("bsize") > _MH_BUCKET_CAP, F.col("bsize")).otherwise(0)
        ).cast("long").alias("docs_overcap"),
    )


def _minhash_audit_sql() -> str:
    return f"""
WITH {_mh_buckets_sql()},
per_bucket AS (
  SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS bsize
  FROM buckets GROUP BY 1, 2)
SELECT CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(MAX(bsize) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN bsize > {_MH_BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overcap,
       CAST(SUM(CASE WHEN bsize > {_MH_BUCKET_CAP} THEN bsize ELSE 0 END) AS BIGINT)
         AS docs_overcap
FROM per_bucket GROUP BY 1
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from md5-derived token hashes:
    per-token hash -> per-bit ±1 contributions -> sign aggregate ->
    packed sketch. Fully deterministic (md5 on both engines), so it
    carries a real oracle. Near-dup docs differ in few bits; tests
    check hamming closeness on the planted near-dup pairs."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    h = F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("long")
    bit = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
        h.alias("h"),
    ).select(
        "doc_id",
        "j",
        F.expr("((h >> j) & 1) * 2 - 1").alias("c"),
    )
    bits = bit.groupBy("doc_id", "j").agg(F.sum("c").alias("s"))
    return bits.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END"))
        .cast("long")
        .alias("simhash")
    )


_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(list_distinct(str_split(text, ' '))) AS token FROM documents),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 4))::BIGINT AS h FROM tok),
bits AS (
  SELECT doc_id, j.j, SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed, (SELECT UNNEST(range(16)) AS j) j
  GROUP BY doc_id, j.j)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def _dot(a, b):
    """Sequential left-fold dot product of two float arrays as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_COSINE_PAIR_SCHEMA = "a_id bigint, b_id bigint, cosine double"


# Number of corpus blocks for the distributed blocked matmul. Shuffle
# volume is O(N * EMB_BLOCKS) and each task holds two blocks (~N/B rows
# each) in memory; at 100 TB pick B = ceil(corpus_bytes / target_block
# _bytes) so a block pair fits an executor. 8 is plenty for test SFs.
EMB_BLOCKS = 8


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.8 over the L2-normalized
    vectors (cosine = dot), computed as a DISTRIBUTED blocked matmul:
    the corpus is hashed into EMB_BLOCKS blocks, every unordered block
    pair (i <= j) meets in exactly one cogroup, and each cogroup task
    computes its block of the similarity matrix as ONE numpy matmul
    inside applyInPandas — ~50x the per-pair fold of the naive
    cross-join plan, with NOTHING materialized on the driver (the old
    broadcast form collapsed once the corpus outgrew driver memory).
    Cosines are rounded to 6 dp on both engines and thresholded on the
    rounded value, so BLAS-vs-SQL accumulation order can't flip
    membership. Beyond quadratic-block sizes the sub-quadratic path is
    LSH bucketing (sim_lsh_ann) or an IVF pre-join (sim_ivf_ann)."""
    import numpy as np
    import pandas as pd

    nb = EMB_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    blk = F.pmod(F.col("vec_id"), F.lit(nb)).cast("int")
    # A-side: block m participates in pairs (m, j) for j >= m;
    # B-side: block m participates in pairs (i, m) for i <= m.
    a_side = emb.withColumn(
        "pk", F.explode(F.transform(F.sequence(blk, F.lit(nb - 1)), lambda j: blk * nb + j))
    )
    b_side = emb.withColumn(
        "pk", F.explode(F.transform(F.sequence(F.lit(0), blk), lambda i: i * nb + blk))
    )

    def block_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype="int64"),
                "b_id": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        bi, bj = divmod(int(key[0]), nb)
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        b_mat = np.stack(right["embedding"].to_numpy()).astype(np.float64)
        sims = np.round(a_mat @ b_mat.T, 6)
        keep = sims >= COSINE_THRESHOLD
        if bi == bj:  # same block: each unordered pair appears twice
            keep &= a_ids[:, None] < b_ids[None, :]
        i, j = np.nonzero(keep)
        if len(i) == 0:
            return empty
        aa, bb = a_ids[i], b_ids[j]
        return pd.DataFrame(
            {
                "a_id": np.minimum(aa, bb),
                "b_id": np.maximum(aa, bb),
                "cosine": sims[i, j],
            }
        )

    return (
        a_side.groupBy("pk")
        .cogroup(b_side.groupBy("pk"))
        .applyInPandas(block_fn, _COSINE_PAIR_SCHEMA)
    )


_EMB_COSINE_SQL = f"""
WITH flat AS (
  SELECT vec_id, r.i AS pos, CAST(embedding[r.i + 1] AS DOUBLE) AS v
  FROM embeddings e, LATERAL (SELECT UNNEST(range(len(e.embedding))) AS i) r),
dots AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, round(SUM(a.v * b.v), 6) AS cosine
  FROM flat a JOIN flat b ON a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY 1, 2)
SELECT a_id, b_id, cosine FROM dots WHERE cosine >= {COSINE_THRESHOLD}
"""


def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the exact-Jaccard
    pair graph (J >= 0.5), labeling every document with the min doc_id
    of its component (the canonical keeper). Iterative min-label
    propagation - labels only decrease, so the sum of labels is a
    strictly-decreasing fixpoint witness; components here are tiny
    (pair chains), so convergence is a couple of rounds. At real scale
    use :func:`dedup_cluster_stars` (alternating large-star/small-star,
    O(log^2 n) rounds independent of diameter); the join-per-round
    structure is the same.

    Oracle: DuckDB recursive CTE computing the transitive closure."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    edges = (
        pairs.union(
            pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
        )
        .withColumnRenamed("a_id", "u")
        .withColumnRenamed("b_id", "v")
        # materialize ONCE: every propagation round joins this edge
        # list, and without the checkpoint each round would re-run the
        # whole ngram-Jaccard inverted-index self-join that produced it
        .localCheckpoint()
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("lbl"))
    prev_sum = None
    while True:  # labels strictly decrease, so the sum-fixpoint is
        # reached in <= diameter rounds and the loop always terminates;
        # a fixed round cap would silently return unconverged labels on
        # a long near-dup chain.
        neigh = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        labels = (
            labels.join(neigh, labels.doc_id == neigh.u, "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint()  # cut the growing iterative lineage
        )
        cur = labels.agg(F.sum("lbl")).first()[0]
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels.select("doc_id", F.col("lbl").cast("long").alias("cluster_id"))


def _cluster_sql() -> str:
    return f"""
WITH RECURSIVE jac AS ({_NGRAM_JACCARD_SQL}),
edges AS (
  SELECT a_id AS u, b_id AS v FROM jac
  UNION
  SELECT b_id, a_id FROM jac),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT d.doc_id,
       CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
GROUP BY d.doc_id
"""


def dedup_cluster_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the real-scale form of :func:`dedup_cluster`: O(log^2 n) rounds
    regardless of component diameter, where min-label propagation needs
    O(diameter) rounds and a 100-TB near-dup chain can be long.

    Each round is two groupBy+join passes over the (large -> small)
    edge list; edges monotonically re-point at smaller nodes, so
    (count, sum(u), sum(v)) is a terminating fixpoint witness. At the
    fixpoint the edge list IS the star forest: every non-root node
    carries exactly one edge to its component minimum.

    Oracle: the same DuckDB recursive-CTE transitive closure as
    dedup_cluster (identical output contract)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    return _star_components(docs, pairs)


def _star_components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Large-star/small-star core over (doc_id) nodes and (a_id, b_id)
    undirected edges; returns (doc_id, cluster_id=component min)."""
    # Orient every edge large -> small: u > v invariant held throughout.
    edges = (
        pairs.select(
            F.greatest("a_id", "b_id").alias("u"), F.least("a_id", "b_id").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # materialize the pair-generation lineage once; round 1 reads
        # this frame several times (sym union, lmin agg, ls join)
        .localCheckpoint()
    )
    prev = None
    while True:
        # LARGE-STAR: symmetrize; per node u with m = min(N(u) ∪ {u}),
        # re-point every strictly-larger neighbor v > u at m.
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("minv"))
            .select("u", F.least("minv", "u").alias("m"))
        )
        ls = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # SMALL-STAR: edges already point large -> small; per node u
        # with m = min(N(u)), re-point u and every other neighbor at m.
        smin = ls.groupBy("u").agg(F.min("v").alias("m"))
        edges = (
            ls.join(smin, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()  # cut the iterative lineage per round
        )
        agg = edges.agg(
            F.count(F.lit(1)), F.sum("u"), F.sum("v")
        ).first()
        cur = tuple(agg)
        if cur == prev:
            break
        prev = cur
    parent = edges.groupBy("u").agg(F.min("v").alias("p"))
    return docs.join(parent, docs.doc_id == parent.u, "left").select(
        "doc_id",
        F.least(F.col("doc_id"), F.coalesce("p", F.col("doc_id")))
        .cast("long")
        .alias("cluster_id"),
    )


def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup collapse — the step after clustering that training
    pipelines actually ship: per cluster keep ONE canonical document
    (the longest; doc_id breaks length ties) and flag the rest for
    drop. Emits the full audit frame (doc -> cluster -> canonical ->
    keep) rather than just survivors, so the drop set is reviewable.

    The canonical choice rides a single-pass max_by over the cluster
    labels with the exact integer order ``n_chars*1e10 - doc_id``
    (length desc, doc_id asc) — engine-independent ties, and the
    cluster->canonical table is cluster-cardinality (broadcastable) so
    the label frame never reshuffles for the final join."""
    labels = dedup_cluster(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lab = labels.join(docs, "doc_id")
    ordv = F.col("n_chars").cast("long") * F.lit(10_000_000_000) - F.col("doc_id")
    canon = lab.groupBy("cluster_id").agg(
        F.max_by("doc_id", ordv).alias("canonical_id")
    )
    return lab.join(F.broadcast(canon), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
    )


def _canonical_sql() -> str:
    return f"""
WITH clusters AS ({_cluster_sql()}),
lab AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars
  FROM clusters c JOIN documents d USING (doc_id)),
canon AS (
  SELECT cluster_id,
         arg_max(doc_id, CAST(n_chars AS BIGINT)*10000000000 - doc_id)
           AS canonical_id
  FROM lab GROUP BY cluster_id)
SELECT lab.doc_id, lab.cluster_id, canon.canonical_id,
       lab.doc_id = canon.canonical_id AS keep
FROM lab JOIN canon USING (cluster_id)
"""


QUERIES = {
    "dedup_canonical_pick": dedup_canonical_pick,
    "dedup_containment": dedup_containment,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash": dedup_minhash,
    "dedup_minhash_audit": dedup_minhash_audit,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_cluster": dedup_cluster,
    "dedup_cluster_stars": dedup_cluster_stars,
}

ORACLE = {
    "dedup_canonical_pick": _canonical_sql(),
    "dedup_containment": _CONTAINMENT_SQL,
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
    "dedup_minhash": _minhash_oracle_sql(),
    "dedup_minhash_audit": _minhash_audit_sql(),
    "dedup_simhash": _SIMHASH_SQL,
    "dedup_embedding_cosine": _EMB_COSINE_SQL,
    "dedup_cluster": _cluster_sql(),
    "dedup_cluster_stars": _cluster_sql(),
}


# ---------------------------------------------------------------------------
# Exact-substring span coverage (round 4): the "deduplicating training
# data" measure — for each document, how much of it is covered by word
# 8-grams that occur MORE THAN ONCE anywhere in the corpus (including
# elsewhere in the same document). Unlike the pairwise ops above this
# is a per-document removal signal: pretraining pipelines drop or trim
# documents whose duplicated-span coverage exceeds a threshold.

_SPAN_N = 8  # words per gram
_SPAN_DROP = 0.5  # coverage above this flags the doc for removal


def _span_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gram) for every word-8-gram occurrence (NOT
    distinct — every occurrence is a span start). Map-only: the token
    array is materialized once per row, grams come from one transform
    over a position sequence, then a single explode."""
    toks = F.split("text", " ")
    d = docs.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    grams = F.transform(
        F.sequence(F.lit(1), n - (_SPAN_N - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", *[F.element_at("toks", i + off) for off in range(_SPAN_N)]
            ).alias("gram"),
        ),
    )
    return (
        d.where(n >= _SPAN_N)
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )


def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: fraction of token
    positions lying inside at least one corpus-duplicated 8-gram.

    Scale shape: gram explosion is ~1 row per corpus token (linear);
    the duplicate-gram table comes from ONE hash-groupBy on the gram;
    occurrences meet duplicates through an equi-join on the gram key
    (inverted-index join — candidate work is proportional to duplicated
    text, never all-pairs). The 8x position fan-out happens only for
    duplicated gram starts. Every step is JVM built-ins; no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    grams = _span_grams(docs)
    dup = (
        grams.groupBy("gram")
        .agg(bcount().alias("occ"))
        .where(F.col("occ") > 1)
        .select("gram")
    )
    hits = grams.join(dup, "gram")
    per_doc = (
        hits.select(
            "doc_id",
            "pos",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (_SPAN_N - 1))).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct("p").cast("long").alias("covered_tokens"),
            F.count_distinct("pos").cast("long").alias("dup_starts"),
        )
    )
    base = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    cov = F.col("covered_tokens").cast("double") / F.col("n_tokens").cast("double")
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_starts", F.lit(0).cast("long")).alias("dup_starts"),
            F.coalesce("covered_tokens", F.lit(0).cast("long")).alias("covered_tokens"),
            F.coalesce(cov, F.lit(0.0)).alias("coverage"),
            (F.coalesce(cov, F.lit(0.0)) > _SPAN_DROP).alias("drop_doc"),
        )
    )


_SPAN_COVERAGE_SQL = f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos, array_to_string(toks[i:i+{_SPAN_N - 1}], ' ') AS gram
  FROM t, LATERAL unnest(generate_series(1, len(toks) - {_SPAN_N - 1}))
       AS u(i)
  WHERE len(toks) >= {_SPAN_N}),
dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT p) AS BIGINT) AS covered_tokens,
         CAST(COUNT(DISTINCT pos) AS BIGINT) AS dup_starts
  FROM hits, LATERAL unnest(generate_series(pos, pos + {_SPAN_N - 1})) AS v(p)
  GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       COALESCE(p.dup_starts, 0) AS dup_starts,
       COALESCE(p.covered_tokens, 0) AS covered_tokens,
       COALESCE(CAST(p.covered_tokens AS DOUBLE) / CAST(len(t.toks) AS DOUBLE),
                0.0) AS coverage,
       COALESCE(CAST(p.covered_tokens AS DOUBLE) / CAST(len(t.toks) AS DOUBLE),
                0.0) > {_SPAN_DROP} AS drop_doc
FROM t LEFT JOIN per_doc p USING (doc_id)
"""

QUERIES["dedup_span_coverage"] = dedup_span_coverage
ORACLE["dedup_span_coverage"] = _SPAN_COVERAGE_SQL


# ---------------------------------------------------------------------------
# Crawl-URL canonicalization dedup (round 4): the first dedup pass any
# web-scrape pipeline runs — BEFORE content hashing — because the same
# page is fetched under scheme/host-case noise, www prefixes, trailing
# slashes, tracking params, shuffled query order, and fragments. URLs
# are synthesized deterministically from doc attributes (the repo's
# fn_url pattern: construction IS the ground truth), with every noise
# class planted, so the oracle derives the canonical form independently
# and any canonicalization bug breaks the hash match.


def _raw_url() -> "F.Column":
    d = F.col("doc_id")
    grp = (d / 5).cast("long")  # 5 docs share each logical page
    host = (
        F.when(d % 3 == 0, F.lit("HTTPS://WWW.Example.COM"))
        .when(d % 3 == 1, F.lit("https://example.com"))
        .otherwise(F.lit("https://Example.Com"))
    )
    lang = F.when(grp % 2 == 0, F.lit("lang=en")).otherwise(F.lit("lang=de"))
    # param order varies by parity so only SORTED reassembly collides
    params = F.when(d % 2 == 0, F.concat(F.lit("id="), grp, F.lit("&"), lang)).otherwise(
        F.concat(lang, F.lit("&id="), grp)
    )
    tracking = F.when(d % 4 == 0, F.lit("utm_source=feed&")).otherwise(F.lit(""))
    return F.concat(
        host,
        F.lit("/"),
        F.col("source"),
        F.lit("/doc/"),
        grp,
        F.when(d % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        tracking,
        params,
        F.when(d % 4 == 2, F.lit("&utm_campaign=x")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize scraped URLs and group fetches of the same page:
    lowercase host, strip ``www.``, drop the fragment, strip the
    trailing slash, drop ``utm_*`` tracking params, and SORT the
    surviving query params. All string/array built-ins (split/filter/
    array_sort/concat — whole-stage codegen, map-only); the dedup
    itself is one hash-groupBy on the canonical key, identical in
    shape to dedup_exact. Emits (canonical_url, keep_id, n_dups)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = (
        docs.withColumn("url", _raw_url())
        .withColumn("no_frag", F.split("url", "#").getItem(0))
        .withColumn("rest", F.substring_index("no_frag", "://", -1))
        .withColumn("host", F.substring_index("rest", "/", 1))
        .withColumn("path_q", F.expr("substring(rest, length(host) + 1)"))
        .withColumn("path", F.substring_index("path_q", "?", 1))
        .withColumn(
            "query",
            F.when(
                F.instr("path_q", "?") > 0, F.substring_index("path_q", "?", -1)
            ).otherwise(F.lit("")),
        )
        .withColumn("host_c", F.regexp_replace(F.lower("host"), r"^www\.", ""))
        .withColumn("path_c", F.regexp_replace("path", r"/$", ""))
    )
    params = F.filter(
        F.split("query", "&"),
        lambda p: (~p.startswith("utm_")) & (p != ""),
    )
    canon = F.concat(
        F.col("host_c"),
        F.col("path_c"),
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
        ).otherwise(F.lit("")),
    )
    return (
        u.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").cast("long").alias("keep_id"), bcount().alias("n_dups"))
    )


# The oracle does NOT parse: it reconstructs the canonical form
# directly from the generative rules (host always example.com, path
# from source + group, params sorted ascii = id= before lang=).
_URL_CANONICAL_SQL = """
WITH canon AS (
  SELECT doc_id,
         'example.com/' || source || '/doc/' || CAST(doc_id // 5 AS VARCHAR)
         || '?id=' || CAST(doc_id // 5 AS VARCHAR)
         || CASE WHEN (doc_id // 5) % 2 = 0 THEN '&lang=en'
                 ELSE '&lang=de' END AS canonical_url
  FROM documents)
SELECT canonical_url,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM canon GROUP BY 1
"""

QUERIES["dedup_url_canonical"] = dedup_url_canonical
ORACLE["dedup_url_canonical"] = _URL_CANONICAL_SQL


_SN_BUCKET = 4096
_SN_LEV_MAX = 3


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez & Stolfo 1995):
    sort records by a blocking key, compare each record only to its
    next 2 neighbors in sort order, and keep candidate pairs whose
    names are within edit distance 3 — the linear-pair-count
    alternative to blocked all-pairs matching. Output: the candidate
    histogram by edit distance.

    Scale-correct global neighborhood WITHOUT a single-partition sort:
    the sort key (c_name, zero-padded) buckets by its numeric suffix
    DIV 4096 — a pure function of the key, so bucket order == sort
    order — windows run per bucket, and the <=2-row bucket boundaries
    are stitched by joining each bucket's 2-row tail to the next
    bucket's 2-row head (tail_rank + head_rank <= 3 reproduces global
    neighbor distance <= 2 exactly). All integers/strings — exact
    oracle.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_name",
        (
            F.substring("c_name", 10, 18).cast("long") / F.lit(_SN_BUCKET)
        ).cast("long").alias("bkt"),
    )
    w = Window.partitionBy("bkt").orderBy("c_name")
    wd = Window.partitionBy("bkt").orderBy(F.col("c_name").desc())
    inb = cust.select(
        "c_name",
        "bkt",
        F.lead("c_name", 1).over(w).alias("n1"),
        F.lead("c_name", 2).over(w).alias("n2"),
    )
    within = inb.select(
        "c_name", F.explode(F.array("n1", "n2")).alias("nb")
    ).where(F.col("nb").isNotNull())
    tail = cust.withColumn("tr", F.row_number().over(wd)).where(F.col("tr") <= 2)
    head = cust.withColumn("hr", F.row_number().over(w)).where(F.col("hr") <= 2)
    straddle = (
        tail.select("c_name", "bkt", "tr")
        .join(
            head.select(
                F.col("c_name").alias("nb"),
                (F.col("bkt") - 1).alias("bkt"),
                "hr",
            ),
            "bkt",
        )
        .where(F.col("tr") + F.col("hr") <= 3)
        .select("c_name", "nb")
    )
    pairs = within.unionByName(straddle).select(
        F.levenshtein("c_name", "nb").cast("long").alias("lev")
    )
    return (
        pairs.where(F.col("lev") <= _SN_LEV_MAX)
        .groupBy("lev")
        .agg(bcount().alias("n_pairs"))
        .orderBy("lev")
    )


_SORTED_NEIGHBORHOOD_SQL = f"""
WITH cust AS (
  SELECT c_name,
         CAST(CAST(substr(c_name, 10, 18) AS BIGINT) / {_SN_BUCKET} AS BIGINT)
           AS bkt
  FROM customer),
inb AS (
  SELECT c_name, bkt,
         LEAD(c_name, 1) OVER (PARTITION BY bkt ORDER BY c_name) AS n1,
         LEAD(c_name, 2) OVER (PARTITION BY bkt ORDER BY c_name) AS n2
  FROM cust),
within AS (
  SELECT c_name, nb FROM (
    SELECT c_name, UNNEST([n1, n2]) AS nb FROM inb)
  WHERE nb IS NOT NULL),
tail AS (
  SELECT c_name, bkt,
         ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY c_name DESC) AS tr
  FROM cust QUALIFY tr <= 2),
head AS (
  SELECT c_name AS nb, bkt - 1 AS bkt,
         ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY c_name) AS hr
  FROM cust QUALIFY hr <= 2),
straddle AS (
  SELECT t.c_name, h.nb
  FROM tail t JOIN head h ON t.bkt = h.bkt
  WHERE t.tr + h.hr <= 3),
pairs AS (
  SELECT levenshtein(c_name, nb) AS lev FROM within
  UNION ALL
  SELECT levenshtein(c_name, nb) AS lev FROM straddle)
SELECT CAST(lev AS BIGINT) AS lev, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
WHERE lev <= {_SN_LEV_MAX}
GROUP BY lev
ORDER BY lev
"""

QUERIES["dedup_sorted_neighborhood"] = dedup_sorted_neighborhood
ORACLE["dedup_sorted_neighborhood"] = _SORTED_NEIGHBORHOOD_SQL


_MHN_HASH_TABLES = 8
_MHN_TF_DIM = 1 << 18


def dedup_minhash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE MinHash-LSH handle (pyspark.ml.feature.MinHashLSH):
    the same 3-gram distinct-shingle near-dup problem dedup_minhash
    solves with the hand-rolled K=48/r=2/b=24 banding lattice, run
    through MLlib's hash family + approxSimilarityJoin instead. Shingle
    sets enter as BINARY HashingTF vectors (2^18 dim — no vocabulary
    fit, so the set universe matches the exact op's up to hash
    collisions, unlike a minDF-bounded CountVectorizer which would
    shrink Jaccard denominators); approxSimilarityJoin generates
    candidates through shared LSH buckets and computes EXACT Jaccard
    distance on each candidate, so emitted values are true J over the
    hashed shingle sets and only RECALL is approximate. R-tier:
    tests/test_round11.py asserts >= 90% recall of the exact
    dedup_ngram_jaccard pairs and that every emitted pair satisfies
    the J >= 0.5 threshold.

    Scale: candidates only meet through one of numHashTables=8 bucket
    joins — the same sub-quadratic law as the hand-rolled lattice;
    vectors are sparse (|shingles| entries in 2^18 dims), never dense.
    The hand-rolled op remains the engine's primary path: its banding
    parameters, per-bucket caps, and audit op are tuned and measured;
    this id exists for API parity with MLlib-native pipelines."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    toks = F.col("toks")
    n = 3
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    sh = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.when(F.size(toks) >= n, F.array_distinct(grams))
            .otherwise(F.array().cast("array<string>"))
            .alias("shingles"),
        )
        .where(F.size("shingles") > 0)  # MinHashLSH rejects empty sets
        .repartition(8, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    # Materialize the vectorized corpus ONCE, projected to the two
    # columns the join needs (guide §2.3 project-before-exchange /
    # §2.4 share one computation): approxSimilarityJoin(tf, tf) is a
    # self-join, so an un-checkpointed tf would run the shingle +
    # HashingTF pass twice, and carrying the shingles array through
    # the exploded bucket join would shuffle the corpus's heaviest
    # column for no reader. Same pairs, same exact Jaccard distances.
    tf = (
        HashingTF(
            inputCol="shingles",
            outputCol="v",
            numFeatures=_MHN_TF_DIM,
            binary=True,
        )
        .transform(sh)
        .select("doc_id", "v")
        .localCheckpoint()
    )
    model = MinHashLSH(
        inputCol="v", outputCol="bands", numHashTables=_MHN_HASH_TABLES, seed=42
    ).fit(tf)
    # threshold is Jaccard DISTANCE: d = 1 - J, so J >= 0.5 <=> d <= 0.5
    pairs = model.approxSimilarityJoin(
        tf, tf, 1.0 - JACCARD_THRESHOLD + 1e-12, distCol="jd"
    )
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            F.round(1.0 - F.col("jd"), 6).alias("jaccard"),
        )
        .orderBy("a_id", "b_id")
    )


QUERIES["dedup_minhash_native"] = dedup_minhash_native
# R-tier: LSH bucket recall is probabilistic (numHashTables=8); >= 90%
# recall of the exact inverted-index Jaccard pairs and threshold
# soundness asserted in tests/test_round11.py.
