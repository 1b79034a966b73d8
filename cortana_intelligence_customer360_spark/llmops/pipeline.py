"""Training-data pipeline operators beyond dedup/similarity: benchmark
contamination detection, document chunking, and sequence packing — the
steps between "raw corpus" and "batches on the trainer".

All three are pure built-in column expressions (whole-stage codegen, no
Python), with full DuckDB oracles.

Scale notes per operator:
- contamination: the benchmark side of the inverted-index join is tiny
  by nature (eval sets are thousands of docs), so its shingle index
  BROADCASTS; the 100 TB train corpus streams past it map-side and is
  never shuffled.
- chunking: embarrassingly parallel map (explode multiplies rows ~x
  n_chunks, no shuffle).
- packing: one shuffle on the salt bucket; each bucket packs
  independently, so parallelism is B-wide regardless of corpus size and
  no window ever sees more than 1/B of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

# Word-n-gram order for contamination matching. 3 is right for this
# synthetic small-vocabulary corpus; real pipelines use 8-13 (GPT-3
# appendix C uses 13-grams) — the plan shape is identical.
_CONTAM_N = 3
# Report a train-bench pair when it shares at least this many distinct
# shingles.
_CONTAM_MIN_COMMON = 3
# Benchmark slice: two of the twenty sources play the role of the eval
# set being screened against.
_BENCH_SOURCES = ("src0", "src1")

# Chunking: window of 16 tokens advancing by 12 (4-token overlap).
_CHUNK_LEN = 16
_CHUNK_STRIDE = 12

# Packing: trainer context window in tokens, and the salt-bucket count
# that bounds how much data any one packing window sees.
_PACK_CTX = 256
_PACK_BUCKETS = 32


def _shingles(n: int):
    """Array of distinct word n-grams of the materialized `toks` col."""
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: which training documents share
    >= _CONTAM_MIN_COMMON distinct word 3-grams with an eval-set
    document, and what fraction of that eval doc they cover
    (containment = |common| / |bench shingles| — two exact integers,
    so the division is bit-identical across engines).

    The eval-set shingle index is broadcast (benchmarks are small by
    nature); the train corpus is filtered map-side against it and only
    the surviving (train, bench, shingle) hits shuffle into the
    per-pair count — the corpus itself never reshuffles."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    sh = docs.select(
        "doc_id", "source", F.explode(_shingles(_CONTAM_N)).alias("shingle")
    )
    is_bench = F.col("source").isin(*_BENCH_SOURCES)
    bench = sh.where(is_bench).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    train = sh.where(~is_bench).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    bench_sizes = bench.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_bench_sh")
    )
    pairs = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= _CONTAM_MIN_COMMON)
    )
    return pairs.join(F.broadcast(bench_sizes), "bench_id").select(
        "train_id",
        "bench_id",
        F.col("n_common").cast("long").alias("n_common"),
        (F.col("n_common").cast("double") / F.col("n_bench_sh").cast("double")).alias(
            "containment"
        ),
    )


_CONTAM_SQL = f"""
WITH sh AS (
  SELECT doc_id, source, UNNEST(list_distinct(
           list_transform(range(len(l) - {_CONTAM_N - 1}),
                          i -> concat_ws(' ', l[i+1], l[i+2], l[i+3])))) AS shingle
  FROM (SELECT doc_id, source, str_split(text, ' ') AS l FROM documents)),
bench AS (SELECT doc_id AS bench_id, shingle FROM sh
          WHERE source IN ('src0', 'src1')),
train AS (SELECT doc_id AS train_id, shingle FROM sh
          WHERE source NOT IN ('src0', 'src1')),
bs AS (SELECT bench_id, COUNT(*) AS n_bench_sh FROM bench GROUP BY 1),
pairs AS (
  SELECT train_id, bench_id, COUNT(*) AS n_common
  FROM train JOIN bench USING (shingle)
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_CONTAM_MIN_COMMON})
SELECT train_id, bench_id,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE) / CAST(n_bench_sh AS DOUBLE) AS containment
FROM pairs JOIN bs USING (bench_id)
"""


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (len {_CHUNK_LEN}, stride
    {_CHUNK_STRIDE}): the RAG/pretraining preprocessing step that turns
    each document into overlapping token windows. posexplode gives the
    chunk ordinal; slice() is 1-based. Pure map — rows multiply by
    ~n_tokens/stride, nothing shuffles."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_CHUNK_STRIDE)
    )
    chunked = docs.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_LEN)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
s AS (
  SELECT doc_id, l,
         UNNEST(range(0, greatest(len(l) - 1, 0) + 1, {_CHUNK_STRIDE})) AS start
  FROM t)
SELECT doc_id,
       CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(l[start+1:start+{_CHUNK_LEN}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(l[start+1:start+{_CHUNK_LEN}], ' ') AS chunk_text
FROM s
"""


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-stream sequence packing: documents are concatenated (in
    deterministic doc_id order within a salt bucket) and the stream is
    cut every {_PACK_CTX} tokens; each doc is assigned the pack its
    FIRST token lands in (docs may straddle pack boundaries, as in
    standard LLM pretraining packing). The md5-derived bucket is
    engine-reproducible; each bucket packs independently, so the
    running-sum window never sees more than 1/{_PACK_BUCKETS} of the
    corpus — this is what keeps a global-looking cumulative sum
    scalable."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % _PACK_BUCKETS
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = docs.select(
        "doc_id", n_tok.alias("n_tokens"), bucket.alias("bucket")
    ).withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return staged.select(
        "doc_id",
        "n_tokens",
        "bucket",
        (F.col("bucket") * 1_000_000 + F.floor(F.col("cum_before") / _PACK_CTX))
        .cast("long")
        .alias("pack_id"),
        (F.col("cum_before") % _PACK_CTX).cast("long").alias("pack_offset"),
    )


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {_PACK_BUCKETS} AS bucket
  FROM documents),
s AS (
  SELECT doc_id, n_tokens, bucket,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t)
SELECT doc_id, n_tokens, bucket,
       CAST(bucket * 1000000 + cum_before // {_PACK_CTX} AS BIGINT) AS pack_id,
       CAST(cum_before % {_PACK_CTX} AS BIGINT) AS pack_offset
FROM s
"""


_MIN_CHARS = 80
_MIN_TOKENS = 15
_KEEP_LANGS = ("de", "en", "es", "fr")


def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-curation audit — the composition a
    training-data pipeline actually runs, as ONE declarative plan:

      quality gate (length/token floor) -> language allowlist ->
      exact dedup (md5, min-doc_id keeper) -> near-dup collapse
      (Jaccard-cluster canonical pick) -> kept

    Every doc gets a verdict = its FIRST failing stage (or 'kept'), so
    the output is a reviewable per-document audit, not just the
    survivor set. Gates are evaluated corpus-wide and composed by
    priority; the near-dup flag comes from the full-corpus canonical
    pick (documented choice — gating the cluster graph on upstream
    survivors would change cluster shapes).

    Scale: the gates are map-only column work; exact dedup is one
    md5-keyed aggregate broadcast back; the near-dup stage reuses the
    banded-LSH machinery. Nothing materializes driver-side."""
    from .dedup import dedup_canonical_pick

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    base = docs.select("doc_id", "lang", "n_chars", toks.alias("n_tokens"), "text")
    exact_keep = (
        base.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keeper"))
        .select("keeper")
        .withColumnRenamed("keeper", "doc_id")
        .withColumn("exact_keep", F.lit(True))
    )
    near = dedup_canonical_pick(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("near_keep")
    )
    j = (
        base.join(exact_keep, "doc_id", "left")
        .join(near, "doc_id", "left")
        .withColumn("exact_keep", F.coalesce("exact_keep", F.lit(False)))
        .withColumn("near_keep", F.coalesce("near_keep", F.lit(True)))
    )
    verdict = (
        F.when(
            (F.col("n_chars") < _MIN_CHARS) | (F.col("n_tokens") < _MIN_TOKENS),
            F.lit("quality"),
        )
        .when(~F.col("lang").isin(*_KEEP_LANGS), F.lit("lang"))
        .when(~F.col("exact_keep"), F.lit("exact_dup"))
        .when(~F.col("near_keep"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return j.select("doc_id", "lang", "n_chars", "n_tokens", verdict.alias("verdict"))


def _curation_sql() -> str:
    from .dedup import _canonical_sql

    langs = ", ".join(f"'{x}'" for x in _KEEP_LANGS)
    return f"""
WITH base AS (
  SELECT doc_id, lang, n_chars,
         CAST(length(str_split(text, ' ')) AS BIGINT) AS n_tokens, text
  FROM documents),
exact_keep AS (
  SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5(text)),
near AS ({_canonical_sql()})
SELECT b.doc_id, b.lang, b.n_chars, b.n_tokens,
       CASE WHEN b.n_chars < {_MIN_CHARS} OR b.n_tokens < {_MIN_TOKENS}
              THEN 'quality'
            WHEN b.lang NOT IN ({langs}) THEN 'lang'
            WHEN e.doc_id IS NULL THEN 'exact_dup'
            WHEN NOT COALESCE(near.keep, TRUE) THEN 'near_dup'
            ELSE 'kept' END AS verdict
FROM base b
LEFT JOIN exact_keep e ON e.doc_id = b.doc_id
LEFT JOIN near ON near.doc_id = b.doc_id
"""


# -- training-mix / token-budget sampler ------------------------------------

_MIX_FRAC = 0.5  # overall token budget = this fraction of corpus tokens


def data_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampler: given per-source weights w_i and a total
    token budget B (= _MIX_FRAC of corpus tokens), deterministically
    sample each source to w_i/Σw of B — the data-mixture op every
    pretraining pipeline runs before tokenization.

    Selection is by md5(doc_id) priority: docs are 'admitted' in hash
    order until the source's running token sum reaches its budget; the
    first doc crossing the line is included, so the budget is met
    within one document per source, and re-runs reproduce the exact
    same sample (no RNG state — reshardable, resumable).

    Scale posture: no global sort. The running sum is two-phase —
    priorities are range-bucketed by their first hash byte (256 ordered
    buckets), per-(source, bucket) token sums roll up to a tiny offsets
    table whose prefix sum is windowed at sources x 256 rows, and the
    row-level running sum windows only WITHIN a (source, bucket) (≤
    1/256 of a source per sort). Weights here derive from the source
    name (w = src# % 4 + 1) so the oracle can replay them; production
    would broadcast-join a weights dim instead.

    Output per source: weight, floored token budget, docs/tokens
    admitted, and sum(doc_id) pinning the exact selection."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    base = (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("toks"),
        )
        .withColumn("pri", F.md5(F.col("doc_id").cast("string")))
        .withColumn(
            "bucket", F.conv(F.substring("pri", 1, 2), 16, 10).cast("int")
        )
        .withColumn(
            "w",
            (F.substring("source", 4, 10).cast("int") % 4 + 1).cast("long"),
        )
    )
    srcs = base.groupBy("source", "w").agg(F.sum("toks").alias("src_toks"))
    totals = srcs.agg(
        F.sum("src_toks").alias("total"), F.sum("w").alias("wsum")
    )
    budgets = srcs.crossJoin(F.broadcast(totals)).select(
        "source",
        "w",
        (
            F.lit(_MIX_FRAC)
            * (F.col("total") * F.col("w")).cast("double")
            / F.col("wsum").cast("double")
        ).alias("budget"),
    )
    per_bucket = base.groupBy("source", "bucket").agg(
        F.sum("toks").alias("bsum")
    )
    wb = Window.partitionBy("source").orderBy("bucket")
    offsets = per_bucket.withColumn(
        "off", F.sum("bsum").over(wb) - F.col("bsum")
    ).select("source", "bucket", "off")
    wr = Window.partitionBy("source", "bucket").orderBy("pri")
    run = base.join(F.broadcast(offsets), ["source", "bucket"]).withColumn(
        "run", F.sum("toks").over(wr) + F.col("off")
    )
    sel = run.join(F.broadcast(budgets), ["source", "w"]).where(
        (F.col("run") - F.col("toks")).cast("double") < F.col("budget")
    )
    return sel.groupBy("source", "w").agg(
        F.floor(F.max("budget")).cast("long").alias("token_budget"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("tokens_kept"),
        F.sum("doc_id").cast("long").alias("sel_checksum"),
    )


_MIXTURE_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS toks,
         md5(CAST(doc_id AS VARCHAR)) AS pri,
         CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w
  FROM documents),
srcs AS (
  SELECT source, MAX(w) AS w, SUM(toks) AS src_toks
  FROM base GROUP BY source),
tot AS (SELECT SUM(src_toks) AS total, SUM(w) AS wsum FROM srcs),
budgets AS (
  SELECT source, w,
         {_MIX_FRAC} * CAST(total * w AS DOUBLE) / CAST(wsum AS DOUBLE)
           AS budget
  FROM srcs CROSS JOIN tot),
cum AS (
  SELECT doc_id, source, toks,
         SUM(toks) OVER (PARTITION BY source ORDER BY pri
                         ROWS UNBOUNDED PRECEDING) AS run
  FROM base),
sel AS (
  SELECT c.doc_id, c.source, c.toks, b.w, b.budget
  FROM cum c JOIN budgets b USING (source)
  WHERE CAST(c.run - c.toks AS DOUBLE) < b.budget)
SELECT source, w,
       CAST(floor(MAX(budget)) AS BIGINT) AS token_budget,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS tokens_kept,
       CAST(SUM(doc_id) AS BIGINT) AS sel_checksum
FROM sel GROUP BY source, w
"""


# -- content-defined chunking -----------------------------------------------

_CDC_DIV = 8  # boundary divisor: md5(token) % _CDC_DIV == 0 ends a chunk


def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rsync/LBFS/FastCDC idea on tokens):
    a chunk boundary falls AFTER any token whose md5 lands in the
    boundary class (≈1/_CDC_DIV of tokens, so ~8-token chunks). Unlike
    fixed windows, boundaries are functions of CONTENT alone — insert
    a sentence into a doc and every untouched chunk keeps its exact
    fingerprint, which is what makes CDC the partial-overlap dedup
    primitive (exact dedup misses edited copies; shingle Jaccard costs
    an index). Output per doc: token/chunk counts plus how many of its
    chunks (and tokens) also appear verbatim in other docs.

    Scale posture: chunking is one doc-keyed shuffle (posexplode +
    prefix-sum window + chunk groupBy all share the doc_id key);
    the fingerprint-sharing pass groups by chunk fp (bounded by corpus
    chunk count) and joins back slim (fp, n_docs) rows. No all-pairs
    anything."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = cdc_chunk_frame(docs)
    fp_docs = chunks.groupBy("fp").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    lab = chunks.join(fp_docs, "fp")
    return lab.groupBy("doc_id").agg(
        F.sum("n_tok").cast("long").alias("n_tokens"),
        bcount().alias("n_chunks"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_chunks"),
        F.sum(F.when(F.col("n_docs") > 1, F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("shared_tokens"),
    )


def cdc_chunk_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, n_tok, fp) content-defined chunks of any
    (doc_id, text) frame — shared by the registered query and the
    edit-stability property test."""
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    flag = F.when(
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        % _CDC_DIV
        == 0,
        1,
    ).otherwise(0)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = tok.withColumn("flag", flag).withColumn(
        "chunk_id", F.coalesce(F.sum("flag").over(w), F.lit(0)).cast("long")
    )
    return chunked.groupBy("doc_id", "chunk_id").agg(
        bcount().alias("n_tok"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token"))
                    ),
                    lambda s: s["token"],
                ),
            )
        ).alias("fp"),
    )


_CDC_SQL = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(range(len(l))) AS pos, UNNEST(l) AS token
  FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents)),
flagged AS (
  SELECT doc_id, pos, token,
         CASE WHEN ('0x' || substr(md5(token), 1, 8))::BIGINT
                   % {_CDC_DIV} = 0 THEN 1 ELSE 0 END AS flag
  FROM tok),
chunked AS (
  SELECT doc_id, pos, token,
         COALESCE(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_id
  FROM flagged),
chunks AS (
  SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         md5(string_agg(token, ' ' ORDER BY pos)) AS fp
  FROM chunked GROUP BY doc_id, chunk_id),
fp_docs AS (
  SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM chunks GROUP BY fp)
SELECT c.doc_id,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_chunks,
       CAST(SUM(CASE WHEN n_docs > 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS shared_tokens
FROM chunks c JOIN fp_docs USING (fp)
GROUP BY c.doc_id
"""


def data_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: every document globally ranked easiest-first
    by a deterministic difficulty key (mean token length — exact-integer
    sum/count division, identical in both engines; doc_id tiebreak makes
    the order total), with the CUMULATIVE token count alongside — the
    byte/token offset table a trainer consumes to know where epoch
    checkpoint boundaries fall in the curriculum.

    Scale posture: the global order uses the distributed ranking pattern
    (features.attribution._global_ranked_cumsum): range-repartition on
    the sort key, rank and accumulate locally, add broadcast
    per-partition offsets — identical to a global window with NO
    single-partition collapse; the data-sized sort stays distributed."""
    from ..features.attribution import _global_ranked_cumsum

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_tok = F.size(toks).cast("long")
    base = docs.select(
        "doc_id",
        (sum_len.cast("double") / n_tok.cast("double")).alias("difficulty"),
        n_tok.cast("decimal(30,6)").alias("n_tok_dec"),
    )
    ranked = _global_ranked_cumsum(
        base,
        "n_tok_dec",
        [F.col("difficulty").asc(), F.col("doc_id").asc()],
    )
    # difficulty is emitted UNrounded: both engines derive it as the
    # same exact-integer division, so the doubles are bit-identical —
    # rounding would only add half-tie divergence risk.
    return ranked.select(
        "doc_id",
        "difficulty",
        F.col("rn").alias("rank"),
        F.col("cum_dec").cast("long").alias("cum_tokens"),
    )


_CURRICULUM_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(list_aggregate(list_transform(str_split(text, ' '),
                                            x -> length(x)), 'sum')
              AS DOUBLE)
           / CAST(len(str_split(text, ' ')) AS DOUBLE) AS difficulty,
         CAST(len(str_split(text, ' ')) AS DECIMAL(30,6)) AS n_tok_dec
  FROM documents)
SELECT doc_id, difficulty,
       CAST(ROW_NUMBER() OVER (ORDER BY difficulty ASC, doc_id ASC)
            AS BIGINT) AS rank,
       CAST(CAST(SUM(n_tok_dec) OVER (ORDER BY difficulty ASC, doc_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(30,6)) AS BIGINT) AS cum_tokens
FROM base
"""


QUERIES = {
    "pipeline_corpus_curation": pipeline_corpus_curation,
    "data_curriculum_order": data_curriculum_order,
    "data_source_mixture": data_source_mixture,
    "text_cdc_chunks": text_cdc_chunks,
    "text_contamination": text_contamination,
    "text_chunk_overlap": text_chunk_overlap,
    "text_pack_sequences": text_pack_sequences,
}

ORACLE = {
    "pipeline_corpus_curation": _curation_sql(),
    "data_curriculum_order": _CURRICULUM_SQL,
    "data_source_mixture": _MIXTURE_SQL,
    "text_cdc_chunks": _CDC_SQL,
    "text_contamination": _CONTAM_SQL,
    "text_chunk_overlap": _CHUNK_SQL,
    "text_pack_sequences": _PACK_SQL,
}


# ---------------------------------------------------------------------------
# Token-budget sharding (round 5): assign documents (in deterministic
# doc_id order) to output shards of ~_SHARD_BUDGET whitespace tokens
# each — the writer-side step that turns a curated corpus into
# fixed-budget training shards. shard_id = floor(cum_tokens_before /
# budget): a document lands in the shard its PRECEDING cumulative
# token count points at, so every shard except the last holds >= the
# budget minus one document's overshoot and document order is never
# broken. The cumsum is the same distributed rank/cumsum pattern as
# data_curriculum_order (range partition + local accumulate +
# broadcast offsets — no single-partition window).

_SHARD_BUDGET = 20_000


def data_shard_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..features.attribution import _global_ranked_cumsum

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    base = docs.select(
        "doc_id", n_tok.cast("decimal(30,6)").alias("n_tok_dec")
    )
    ranked = _global_ranked_cumsum(
        base, "n_tok_dec", [F.col("doc_id").asc()]
    )
    assigned = ranked.select(
        "doc_id",
        F.col("n_tok_dec").cast("long").alias("n_tokens"),
        F.floor(
            (F.col("cum_dec").cast("long") - F.col("n_tok_dec").cast("long"))
            / F.lit(_SHARD_BUDGET)
        )
        .cast("long")
        .alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        bcount().alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_SHARD_SQL = f"""
WITH base AS (
  SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM base)
SELECT CAST(cum_before // {_SHARD_BUDGET} AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1
"""

QUERIES["data_shard_by_budget"] = data_shard_by_budget
ORACLE["data_shard_by_budget"] = _SHARD_SQL
