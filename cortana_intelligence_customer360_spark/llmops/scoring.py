"""Corpus-statistics scoring: unigram-LM surprisal (quality score),
BM25 keyword ranking, and a deterministic global shuffle — the
score/rank/order primitives of a training-data pipeline.

Scale posture (100 TB): every operator's model side (the unigram LM,
the per-term document frequencies) is vocabulary-sized — orders of
magnitude smaller than the corpus — and is broadcast, so the corpus
itself never reshuffles for scoring; the only corpus-wide shuffle is
the per-doc groupBy. The global shuffle is a pure hash function of the
key (reproducible across engines, runs, partitionings, and retries —
same contract as operators/graph.py sample_hash_pct) and sorts only
within a shard, never globally.

Float discipline: ln() is the one libm call (1-ulp cross-engine risk),
so every ln output is rounded to 6 dp BEFORE entering further
arithmetic; sums of per-token/per-term doubles go through
DECIMAL(30,6) (compat rule 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

_DEC = "decimal(30,6)"

# BM25 constants (standard Robertson defaults) and a fixed query over
# the corpus's engine-jargon vocabulary.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ["join", "window", "customer"]


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) rows — whitespace tokenization, empties dropped
    (text.py convention)."""
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.length("tok") > 0)


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average unigram surprisal -ln p(token) under the
    corpus's own unigram LM — the classic cheap quality/perplexity
    proxy for pretraining-data filtering (high surprisal = rare-token
    soup, low = boilerplate). The LM (vocab-sized) is broadcast; the
    corpus is scored map-side and aggregated once per doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    lm = toks.groupBy("tok").agg(bcount().alias("cnt"))
    total = toks.select(bcount().alias("n_total"))
    lm = lm.crossJoin(F.broadcast(total))
    # surprisal rounded 6dp at the token level: ln is libm (1-ulp
    # cross-engine); after rounding, the decimal sum is exact.
    lm = lm.select(
        "tok",
        F.round(-F.log(F.col("cnt") / F.col("n_total")), 6).alias("surprisal"),
    )
    scored = toks.join(F.broadcast(lm), "tok")
    return (
        scored.groupBy("doc_id")
        .agg(
            bcount().alias("n_tokens"),
            F.sum(F.col("surprisal").cast(_DEC)).cast("double").alias("sum_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("sum_s") / F.col("n_tokens"), 6).alias("avg_surprisal"),
        )
    )


_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
t AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
lm AS (
  SELECT tok,
         round(-ln(CAST(COUNT(*) AS DOUBLE)
                   / (SELECT CAST(COUNT(*) AS DOUBLE) FROM t)), 6) AS surprisal
  FROM t GROUP BY tok)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(CAST(lm.surprisal AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_surprisal
FROM t JOIN lm USING (tok)
GROUP BY t.doc_id
"""


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a fixed 3-term query under BM25 (k1=1.2,
    b=0.75, Lucene-style idf = ln(1 + (N-df+0.5)/(df+0.5))) — the
    retrieval primitive behind RAG corpus search. The per-term df/idf
    table (|query| rows) broadcasts; per-doc term frequencies are one
    corpus groupBy; ties broken by doc_id (compat rule 7)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    dl = toks.groupBy("doc_id").agg(bcount().alias("dl"))
    stats = dl.agg(
        bcount().alias("n_docs"),
        F.sum(F.col("dl").cast(_DEC)).cast("double").alias("total_dl"),
    )
    terms = spark.createDataFrame([(t,) for t in _BM25_TERMS], "tok string")
    df_t = (
        toks.join(F.broadcast(terms), "tok")
        .groupBy("tok")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "tok",
            "n_docs",
            "total_dl",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
                6,
            ).alias("idf"),
        )
    )
    tf = (
        toks.join(F.broadcast(terms), "tok")
        .groupBy("doc_id", "tok")
        .agg(bcount().alias("tf"))
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / avgdl
    )
    per_term = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_t), "tok")
        .select(
            "doc_id",
            F.round(
                F.col("idf") * F.col("tf") * (_BM25_K1 + 1.0) / denom, 6
            ).alias("term_score"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.sum(F.col("term_score").cast(_DEC)).cast("double").alias("bm25")
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.select(
            F.row_number().over(w).cast("long").alias("rank"), "doc_id", "bm25"
        )
        .where(F.col("rank") <= 10)
    )


_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
t AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(30,6))) AS DOUBLE) AS total_dl
  FROM dl),
q(tok) AS (VALUES {', '.join(f"('{t}')" for t in _BM25_TERMS)}),
df_t AS (
  SELECT tok, n_docs, total_dl,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf
  FROM (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM t JOIN q USING (tok) GROUP BY tok), stats),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM t JOIN q USING (tok) GROUP BY doc_id, tok),
per_term AS (
  SELECT tf.doc_id,
         round(d.idf * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / (d.total_dl / d.n_docs))), 6)
           AS term_score
  FROM tf JOIN dl USING (doc_id) JOIN df_t d USING (tok)),
scored AS (
  SELECT doc_id,
         CAST(SUM(CAST(term_score AS DECIMAL(30,6))) AS DOUBLE) AS bm25
  FROM per_term GROUP BY doc_id)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, bm25
FROM scored
QUALIFY rank <= 10
"""


_N_SHARDS = 8


def data_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: md5(doc_id)
    assigns each doc a pseudo-random 32-bit position, sharded into 8
    training shards with a dense position within each
    shard. Pure function of the key — the shuffle order is identical
    across engines, runs, and retries (resumable training), and the
    sort is per-shard (range-partitioned by Spark), never a single
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashed = docs.select("doc_id", h.alias("h"))
    w = Window.partitionBy(F.col("h") % _N_SHARDS).orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        (F.col("h") % _N_SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


_SHUFFLE_SQL = f"""
WITH hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents)
SELECT doc_id,
       CAST(h % {_N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM hashed
"""


QUERIES = {
    "text_unigram_logprob": text_unigram_logprob,
    "text_bm25_search": text_bm25_search,
    "data_global_shuffle": data_global_shuffle,
}

ORACLE = {
    "text_unigram_logprob": _UNIGRAM_SQL,
    "text_bm25_search": _BM25_SQL,
    "data_global_shuffle": _SHUFFLE_SQL,
}
