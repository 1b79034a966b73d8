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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.8


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
    """(doc_id, shingle) rows: distinct word n-grams per document."""
    toks = F.split("text", " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    shingles = F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return docs.select("doc_id", F.explode(shingles).alias("shingle"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (J >= 0.5) via an
    inverted-index self-join: explode shingles, join on the shingle,
    count common shingles per pair, then J = common/(na+nb-common).
    The Jaccard value divides two exact integers, so it is
    bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_frame(docs).cache()
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


_NGRAM_JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(len(l) - 2),
                          i -> concat_ws(' ', l[i+1], l[i+2], l[i+3])))) AS shingle
  FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents)),
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


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs at Jaccard >= 0.5 over the same
    3-gram shingles - the sub-quadratic scale path. R-tier (the LSH is
    randomized but seeded); tests assert recall against
    dedup_ngram_jaccard on sf0.001."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx = F.sequence(F.lit(0), F.size(toks) - 3)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    with_sh = docs.select(
        "doc_id",
        F.when(F.size(toks) >= 3, F.array_distinct(grams))
        .otherwise(F.array(F.lit("<short>")))
        .alias("shingles"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(with_sh)
    lsh = MinHashLSH(inputCol="features", outputCol="bands", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - JACCARD_THRESHOLD, distCol="dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            (1.0 - F.col("dist")).alias("est_jaccard"),
        )
    )


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


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.8 over the L2-normalized
    vectors (cosine = dot). Exact all-pairs with a_id < b_id; the
    cosine is rounded to 6 dp on both sides and thresholded on the
    rounded value so sub-1e-14 accumulation differences can't flip
    membership. sim_lsh_ann is the sub-quadratic variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    cos = F.round(_dot(F.col("ea"), F.col("eb")), 6)
    return pairs.select("a_id", "b_id", cos.alias("cosine")).where(
        F.col("cosine") >= COSINE_THRESHOLD
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


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLE = {
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
    # dedup_minhash: R-tier (randomized LSH; recall tested vs exact).
    "dedup_simhash": _SIMHASH_SQL,
    "dedup_embedding_cosine": _EMB_COSINE_SQL,
}
