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
    retrieval primitive behind RAG corpus search.

    Single-pass shape: ONE groupBy(doc_id) over the token stream
    computes doc length AND each query term's tf as pivoted columns
    (conditional sums), the corpus stats reduce that doc-level frame
    to one broadcast row, and the score is a fixed-order 3-term
    expression — the token stream shuffles exactly once no matter how
    many query terms there are. Ties broken by doc_id (compat rule 7)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    per_doc = toks.groupBy("doc_id").agg(
        bcount().alias("dl"),
        *[
            F.sum((F.col("tok") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = per_doc.agg(
        bcount().alias("n_docs"),
        F.sum(F.col("dl").cast(_DEC)).cast("double").alias("total_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl") / F.col("n_docs")
    denom_norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / avgdl)

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.round(
            F.log(
                1.0
                + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                / (F.col(f"df_{i}") + 0.5)
            ),
            6,
        )
        return F.when(
            tf > 0,
            F.round(idf * tf * (_BM25_K1 + 1.0) / (tf + denom_norm), 6),
        ).otherwise(F.lit(0.0))

    bm25 = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        bm25 = bm25 + term_score(i)  # fixed-order IEEE adds, both engines
    scored = joined.select("doc_id", bm25.alias("bm25")).where(F.col("bm25") > 0)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.select(
            F.row_number().over(w).cast("long").alias("rank"), "doc_id", "bm25"
        )
        .where(F.col("rank") <= 10)
    )


def _bm25_sql() -> str:
    tf_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = " + ".join(
        f"""CASE WHEN tf_{i} > 0 THEN
           round(round(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5)), 6)
                 * tf_{i} * ({_BM25_K1} + 1.0)
                 / (tf_{i} + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl / (total_dl / n_docs))), 6)
         ELSE 0.0 END"""
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
t AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl,
         {tf_cols}
  FROM t GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(30,6))) AS DOUBLE) AS total_dl,
         {df_cols}
  FROM per_doc),
scored AS (
  SELECT doc_id, {terms} AS bm25
  FROM per_doc, stats)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, bm25
FROM scored
WHERE bm25 > 0
QUALIFY rank <= 10
"""


_BM25_SQL = _bm25_sql()


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


_N_EPOCHS = 3


def data_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-EPOCH deterministic training shuffle: epoch e's order is
    md5(e || doc_id), so every epoch sees a different permutation
    (decorrelated batch composition — the reason trainers reshuffle
    per epoch) while each remains a pure function of (epoch, key):
    reproducible across engines, runs, and mid-epoch restarts, and a
    shard can be regenerated in isolation. Same per-shard dense
    positions as data_global_shuffle; sorts stay per-(epoch, shard),
    never global. Tests pin that the permutations actually differ
    between epochs while each epoch's shard sizes stay balanced."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = F.explode(
        F.array(*[F.lit(e) for e in range(_N_EPOCHS)])
    ).alias("epoch")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("epoch").cast("string"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    hashed = docs.select("doc_id", epochs).select(
        "doc_id", "epoch", h.alias("h")
    )
    w = Window.partitionBy("epoch", F.col("h") % _N_SHARDS).orderBy(
        "h", "doc_id"
    )
    return hashed.select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        (F.col("h") % _N_SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


def _epoch_shuffle_sql() -> str:
    evals = ", ".join(f"({e})" for e in range(_N_EPOCHS))
    return f"""
WITH e(epoch) AS (VALUES {evals}),
hashed AS (
  SELECT epoch, doc_id,
         ('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' ||
                             CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents CROSS JOIN e)
SELECT CAST(epoch AS INT) AS epoch, doc_id,
       CAST(h % {_N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, h % {_N_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM hashed
"""


_LAMBDA = 0.8  # interpolation weight on the bigram term


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average bigram surprisal -ln p(w_i | w_{i-1}) under an
    interpolated LM: p = λ·c(prev,cur)/c(prev,·) + (1-λ)·c(cur)/N —
    the next-cheapest perplexity proxy after the unigram one, and the
    one that actually penalizes shuffled-word salad. Both LM tables
    are vocabulary-bounded (|V| and ≤|V|² rows) and broadcast; the
    corpus is scored map-side and aggregated once per doc_id, same
    scale shape as text_unigram_logprob. Surprisal is rounded at the
    bigram-type level so the per-doc decimal sum is exact."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    n = F.size("toks")
    pairs = docs.select(
        "doc_id",
        F.explode(
            # guard: sequence(1, 0) would DESCEND, not be empty
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("prev"),
                        F.element_at("toks", i + 1).alias("cur"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    toks = _tokens(docs.drop("toks"))
    big = pairs.groupBy("prev", "cur").agg(bcount().alias("cb"))
    ctx = pairs.groupBy("prev").agg(bcount().alias("cprev"))
    uni = toks.groupBy("tok").agg(bcount().alias("cu"))
    n_total = toks.select(bcount().alias("n_total"))
    lm = (
        big.join(ctx, "prev")
        .join(uni.select(F.col("tok").alias("cur"), "cu"), "cur")
        .crossJoin(F.broadcast(n_total))
        .select(
            "prev",
            "cur",
            F.round(
                -F.log(
                    F.lit(_LAMBDA) * (F.col("cb") / F.col("cprev"))
                    + F.lit(1.0 - _LAMBDA) * (F.col("cu") / F.col("n_total"))
                ),
                6,
            ).alias("surprisal"),
        )
    )
    return (
        pairs.join(F.broadcast(lm), ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            bcount().alias("n_bigrams"),
            F.sum(F.col("surprisal").cast(_DEC)).cast("double").alias("sum_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("sum_s") / F.col("n_bigrams"), 6).alias("avg_surprisal"),
        )
    )


_BIGRAM_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT doc_id, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS cur
  FROM d),
toks AS (
  SELECT doc_id, unnest(t) AS tok FROM d),
tk AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
big AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb
        FROM pairs GROUP BY prev, cur),
ctx AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS cprev
        FROM pairs GROUP BY prev),
uni AS (SELECT tok AS cur, CAST(COUNT(*) AS BIGINT) AS cu
        FROM tk GROUP BY tok),
lm AS (
  SELECT big.prev, big.cur,
         round(-ln({_LAMBDA} * (cb / cprev)
                   + {1.0 - _LAMBDA} * (cu / (SELECT CAST(COUNT(*) AS BIGINT)
                                              FROM tk))), 6) AS surprisal
  FROM big JOIN ctx ON big.prev = ctx.prev
           JOIN uni ON big.cur = uni.cur)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(CAST(SUM(CAST(lm.surprisal AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_surprisal
FROM pairs p JOIN lm ON p.prev = lm.prev AND p.cur = lm.cur
GROUP BY p.doc_id
"""


QUERIES = {
    "text_unigram_logprob": text_unigram_logprob,
    "text_bigram_logprob": text_bigram_logprob,
    "text_bm25_search": text_bm25_search,
    "data_global_shuffle": data_global_shuffle,
    "data_epoch_shuffle": data_epoch_shuffle,
}

ORACLE = {
    "text_unigram_logprob": _UNIGRAM_SQL,
    "text_bigram_logprob": _BIGRAM_SQL,
    "text_bm25_search": _BM25_SQL,
    "data_global_shuffle": _SHUFFLE_SQL,
    "data_epoch_shuffle": _epoch_shuffle_sql(),
}


_DECODE_SEEDS = 5
_DECODE_STEPS = 7


def text_greedy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy decoding over the corpus's own bigram LM: from each of
    the 5 most frequent tokens, repeatedly emit the argmax continuation
    (ties broken lexicographically) for 7 steps — the deterministic
    heart of LM inference, run as a distributed query. A sequence stops
    early if its last token was never a bigram context.

    Shape: the best-continuation table collapses the bigram counts with
    ONE vocab-keyed window (row_number over (cb DESC, cur ASC)) and is
    vocabulary-sized; decoding is 7 frontier joins against it (5-row
    frontier — broadcast by size). Output is pure strings + integer
    steps: nothing float anywhere, so the oracle matches exactly."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    n = F.size("toks")
    pairs = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("prev"),
                        F.element_at("toks", i + 1).alias("cur"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
        ).alias("bg")
    ).select(F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    big = pairs.groupBy("prev", "cur").agg(bcount().alias("cb"))
    w = Window.partitionBy("prev").orderBy(F.col("cb").desc(), F.col("cur").asc())
    best = (
        big.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("prev", F.col("cur").alias("nxt"))
        .localCheckpoint()
    )
    toks = _tokens(docs.drop("toks").select("doc_id", "text"))
    uni = toks.groupBy("tok").agg(bcount().alias("cnt"))
    seeds = (
        uni.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(_DECODE_SEEDS)
        .select(F.col("tok").alias("seed"))
    )
    cur = seeds.select("seed", F.col("seed").alias("token"))
    out = cur.select("seed", F.lit(0).cast("long").alias("step"), "token")
    for t in range(1, _DECODE_STEPS + 1):
        cur = cur.join(
            best, cur.token == best.prev
        ).select("seed", F.col("nxt").alias("token"))
        out = out.unionByName(
            cur.select("seed", F.lit(t).cast("long").alias("step"), "token")
        )
    return out.orderBy("seed", "step")


def _decode_sql() -> str:
    base = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS cur FROM d),
big AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb
        FROM pairs GROUP BY prev, cur),
best AS MATERIALIZED (
  SELECT prev, cur AS nxt FROM (
    SELECT prev, cur, cb,
           row_number() OVER (PARTITION BY prev
                              ORDER BY cb DESC, cur ASC) AS rn
    FROM big) WHERE rn = 1),
toks AS (
  SELECT u.tok FROM (SELECT unnest(t) AS tok FROM d) u
  WHERE length(u.tok) > 0),
seeds AS (
  SELECT tok AS seed FROM (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok)
  ORDER BY cnt DESC, tok ASC LIMIT {_DECODE_SEEDS}),
w0 AS (SELECT seed, seed AS token FROM seeds)"""
    steps = []
    for t in range(1, _DECODE_STEPS + 1):
        steps.append(
            f"""
w{t} AS (SELECT w.seed, b.nxt AS token
         FROM w{t - 1} w JOIN best b ON b.prev = w.token)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT seed, CAST({t} AS BIGINT) AS step, token FROM w{t}"
        for t in range(0, _DECODE_STEPS + 1)
    )
    return base + "," + ",".join(steps) + "\n" + selects


QUERIES["text_greedy_decode"] = text_greedy_decode
ORACLE["text_greedy_decode"] = _decode_sql()


_BEAM_W = 3
_BEAM_STEPS = 5


def text_beam_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam-search decoding (width 3, 5 steps) from the corpus's
    hottest token under the bigram LM — the ranked sibling of
    text_greedy_decode. Path score = DECIMAL-exact sum of 6-dp-rounded
    per-bigram surprisals -ln(cb/cprev), so beam comparisons are exact
    decimal comparisons; ties break on the sequence string. Every
    expansion is a beam-to-LM join (beam side is <= width rows,
    broadcast by size); the per-step top-k is a window over the
    bounded expansion frontier, never over corpus-scale data."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    n = F.size("toks")
    pairs = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("prev"),
                        F.element_at("toks", i + 1).alias("cur"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
        ).alias("bg")
    ).select(F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    big = pairs.groupBy("prev", "cur").agg(bcount().alias("cb"))
    ctx = pairs.groupBy("prev").agg(bcount().alias("cprev"))
    lm = (
        big.join(ctx, "prev")
        .select(
            "prev",
            "cur",
            F.round(-F.log(F.col("cb") / F.col("cprev")), 6)
            .cast(_DEC)
            .alias("s"),
        )
        .localCheckpoint()
    )
    toks = _tokens(docs.drop("toks").select("doc_id", "text"))
    seed = (
        toks.groupBy("tok")
        .agg(bcount().alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(1)
        .select(
            F.col("tok").alias("seq"),
            F.col("tok").alias("last"),
            F.lit(0.0).cast(_DEC).alias("score"),
        )
    )
    beams = seed
    w = Window.orderBy(F.col("score").asc(), F.col("seq").asc())
    for _ in range(_BEAM_STEPS):
        expanded = beams.join(lm, beams.last == lm.prev).select(
            F.concat_ws(" ", "seq", "cur").alias("seq"),
            F.col("cur").alias("last"),
            (F.col("score") + F.col("s")).cast(_DEC).alias("score"),
        )
        beams = (
            expanded.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _BEAM_W)
            .drop("rn")
            .localCheckpoint()
        )
    return beams.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "seq",
        F.round(F.col("score").cast("double"), 6).alias("score"),
    )


def _beam_sql() -> str:
    base = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS cur FROM d),
big AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb
        FROM pairs GROUP BY prev, cur),
ctx AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS cprev
        FROM pairs GROUP BY prev),
lm AS MATERIALIZED (
  SELECT big.prev, big.cur,
         CAST(round(-ln(cb / cprev), 6) AS DECIMAL(30,6)) AS s
  FROM big JOIN ctx ON big.prev = ctx.prev),
toks AS (
  SELECT u.tok FROM (SELECT unnest(t) AS tok FROM d) u
  WHERE length(u.tok) > 0),
b0 AS (
  SELECT tok AS seq, tok AS last, CAST(0.0 AS DECIMAL(30,6)) AS score
  FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok)
  ORDER BY cnt DESC, tok ASC LIMIT 1)"""
    steps = []
    for t in range(1, _BEAM_STEPS + 1):
        steps.append(
            f"""
b{t} AS MATERIALIZED (
  SELECT seq, last, score FROM (
    SELECT b.seq || ' ' || l.cur AS seq, l.cur AS last,
           CAST(b.score + l.s AS DECIMAL(30,6)) AS score,
           row_number() OVER (ORDER BY CAST(b.score + l.s AS DECIMAL(30,6)) ASC,
                              b.seq || ' ' || l.cur ASC) AS rn
    FROM b{t - 1} b JOIN lm l ON l.prev = b.last)
  WHERE rn <= {_BEAM_W})"""
        )
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
SELECT CAST(row_number() OVER (ORDER BY score ASC, seq ASC) AS BIGINT) AS rank,
       seq, round(CAST(score AS DOUBLE), 6) AS score
FROM b{_BEAM_STEPS}
"""
    )


QUERIES["text_beam_decode"] = text_beam_decode
ORACLE["text_beam_decode"] = _beam_sql()


def data_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free GROUP-AWARE train/val/test split: the split is
    assigned at the USER level (md5 bucket of user_id: 80/10/10), and
    every event inherits its user's split — the property that keeps a
    user's behavior from straddling train and eval, which row-level
    sampling (sample_stratified) cannot guarantee. Deterministic,
    engine-independent (md5 hex is identical everywhere), map-only
    assignment (no shuffle until the audit aggregate). Emits per-split
    user/event counts — the audit a pipeline runs before training."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        ev.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            bcount().alias("n_events"),
        )
        .orderBy("split")
    )


_GROUP_SPLIT_SQL = """
WITH tagged AS (
  SELECT user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 100
           AS b
  FROM events),
sp AS (
  SELECT user_id,
         CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM tagged)
SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sp GROUP BY split ORDER BY split
"""

QUERIES["data_group_split"] = data_group_split
ORACLE["data_group_split"] = _GROUP_SPLIT_SQL
