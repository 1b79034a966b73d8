"""Text-analysis operators over the documents corpus (SURVEY.md §2.9 +
the training-data-pipeline surface: token stats, quality scoring,
language profiling/ID, document fingerprinting).

Everything row-wise is built-in column expressions (split / array
lambdas / md5 - whole-stage codegen); nothing here crosses into Python.
At 100 TB these are embarrassingly parallel scans with one optional
aggregate shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import _DEC, bcount, davg_sql
from ..sources.tables import load_table

# Tiny per-language marker vocabularies for the n-gram/stopword
# language-ID heuristic (public-knowledge stopword sets).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

_STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token stats; avg token length is computed from two exact
    integers (sum of lengths / count) so both engines divide the same
    operands. Validates the n_chars column against length(text)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_tok = F.size(toks).cast("long")
    # BPE-ish pre-tokenization: alpha runs and punctuation runs count
    # separately (subword merge happens downstream in a real tokenizer).
    bpe = F.regexp_extract_all("text", F.lit(r"[a-z]+|[^a-z\s]+"), 0)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(bpe).cast("long").alias("n_tokens_bpe"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        (sum_len.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
        F.length("text").cast("long").alias("n_chars_actual"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_ok"),
    )


_TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(len(l) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[^a-z\\s]+')) AS BIGINT) AS n_tokens_bpe,
       CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
       CAST(CAST(list_aggregate(list_transform(l, x -> length(x)), 'sum') AS DOUBLE)
            / CAST(len(l) AS DOUBLE) AS DOUBLE) AS avg_token_len,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       length(text) = n_chars AS n_chars_ok
FROM (SELECT doc_id, text, n_chars, str_split(text, ' ') AS l FROM documents)
"""


def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile of the English slice: docs and avg length per
    source."""
    docs = load_table(spark, sf_dir, "documents")
    from ..compat import davg

    return (
        docs.where(F.col("lang") == "en")
        .groupBy("source")
        .agg(bcount().alias("n_docs"), davg("n_chars").alias("avg_chars"))
    )


_LANG_PROFILE_SQL = f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       {davg_sql('n_chars')} AS avg_chars
FROM documents WHERE lang = 'en' GROUP BY source
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals a pretraining filter would use: length
    score, mean word length, stopword ratio, non-alpha char ratio -
    plus a composite keep/drop flag."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(_STOPWORDS))
    ).cast("long")
    n_alpha = F.length(F.regexp_replace("text", r"[^a-zA-Z]", ""))
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    alpha_ratio = n_alpha.cast("double") / F.length("text").cast("double")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        ((n_tok >= 10) & (n_tok <= 1000) & (alpha_ratio > 0.5)).alias("keep"),
    )


_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)
_TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, text, str_split(text, ' ') AS l,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
  FROM documents)
SELECT doc_id,
       CAST(len(l) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(l, x -> x IN ({_STOP_LIST_SQL}))) AS DOUBLE)
         / CAST(len(l) AS DOUBLE) AS stopword_ratio,
       CAST(n_alpha AS DOUBLE) / CAST(length(text) AS DOUBLE) AS alpha_ratio,
       len(l) >= 10 AND len(l) <= 1000
         AND CAST(n_alpha AS DOUBLE) / CAST(length(text) AS DOUBLE) > 0.5 AS keep
FROM t
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprints: md5 over the sorted
    distinct token bag (near-dup blocking key) and over the normalized
    text (exact-dup key)."""
    docs = load_table(spark, sf_dir, "documents")
    # Rolling polynomial hash over per-token md5-derived ints, exactly
    # DuckDB list_reduce semantics (first element seeds the fold). The
    # hash array is materialized as a column: referencing the transform
    # twice (seed + tail) would evaluate the md5s twice (no CSE across
    # lambda scopes).
    toks = F.col("toks")
    rolling = (
        F.aggregate(
            F.slice(F.col("hs"), 2, F.greatest(F.size("hs") - 1, F.lit(0))),
            F.element_at(F.col("hs"), 1),
            lambda acc, x: (acc * 31 + x) % 2147483647,
        )
        % 2147483647
    )
    return (
        docs.select("doc_id", "text", F.split("text", " ").alias("toks"))
        .withColumn(
            "hs",
            F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")),
        )
        .select(
            "doc_id",
            F.md5(F.lower(F.trim("text"))).alias("exact_fp"),
            F.md5(F.array_join(F.sort_array(F.array_distinct(toks)), " ")).alias("bag_fp"),
            rolling.cast("long").alias("rolling_fp"),
        )
    )


_TEXT_FP_SQL = """
SELECT doc_id,
       md5(lower(trim(text))) AS exact_fp,
       md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS bag_fp,
       CAST(list_reduce(
              list_transform(str_split(text, ' '),
                             t -> ('0x' || substr(md5(t), 1, 8))::BIGINT),
              (acc, x) -> (acc * 31 + x) % 2147483647)
            % 2147483647 AS BIGINT) AS rolling_fp
FROM documents
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language-ID heuristic: score each language by
    marker-token hits, predict the argmax (ties by language code, and
    'und' when nothing matches). R-tier: the heuristic itself is the
    operator; tests assert determinism and schema (the synthetic corpus
    draws from one shared vocabulary, so hit-rates are evaluated in
    tests rather than against the lang column)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def marker_hits(markers: list[str]):
        # A closure, not a default-arg lambda: a 2-parameter lambda
        # would be treated as Spark's (element, index) lambda form.
        return F.size(F.filter(toks, lambda x: x.isin(markers))).cast("long")

    scored = docs.select(
        "doc_id",
        "lang",
        F.array(
            *[
                F.struct(marker_hits(markers).alias("hits"), F.lit(code).alias("code"))
                for code, markers in sorted(LANG_MARKERS.items())
            ]
        ).alias("scores"),
    )
    best = F.array_max(
        F.filter(F.col("scores"), lambda s: s.getField("hits") > 0)
    )
    return scored.select(
        "doc_id",
        "lang",
        F.coalesce(best.getField("code"), F.lit("und")).alias("pred_lang"),
        F.coalesce(best.getField("hits"), F.lit(0)).cast("long").alias("pred_hits"),
    )


def text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: the 5 most frequent word bigrams per
    language (rank ties by bigram text) - the corpus-profiling pass a
    data-quality pipeline runs before filtering."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    exploded = (
        docs.select("lang", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
        .select("lang", F.explode(grams).alias("bigram"))
    )
    counts = exploded.groupBy("lang", "bigram").agg(bcount().alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


_NGRAM_PROFILE_SQL = """
WITH grams AS (
  SELECT lang, UNNEST(list_transform(range(len(l) - 1),
                      i -> concat_ws(' ', l[i+1], l[i+2]))) AS bigram
  FROM (SELECT lang, str_split(text, ' ') AS l FROM documents)
  WHERE len(l) >= 2),
counts AS (
  SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY 1, 2)
SELECT lang, bigram, n, rank FROM (
  SELECT lang, bigram, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS BIGINT) AS rank
  FROM counts)
WHERE rank <= 5
"""


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf = term count in doc, idf =
    ln((N+1)/(df+1)) with df = docs containing the term. The classic
    keyword extractor of a training-data pipeline - one explode +
    two aggregate shuffles + a broadcast of the (tiny) df table; at
    100 TB the df table is vocabulary-sized, not corpus-sized. idf and
    the score are rounded to 6 dp on both engines before ranking
    (compat rule 3: libm ln may differ in the last ulp); rank ties
    break on the term string."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(bcount().alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf")
                * F.round(
                    F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1).cast("double")),
                    6,
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


_TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term != ''
  GROUP BY 1, 2),
df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
         round(tf * round(ln(CAST(n_docs + 1 AS DOUBLE)
                             / CAST(df + 1 AS DOUBLE)), 6), 6) AS tfidf
  FROM tf JOIN df_t USING (term) CROSS JOIN n)
SELECT doc_id, term, tf, tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 3
"""


# Misra-Gries sketch size and the heavy-hitter threshold (1/50 = 2% of
# all token occurrences). Guarantee: a sketch of K counters undercounts
# any word by at most n_p/(K+1) within its partition; a globally-heavy
# word has count_p >= n_p/50 in at least one partition (pigeonhole), and
# n_p/50 > n_p/(K+1) for K=256, so every true heavy hitter reaches the
# candidate set. The exact phase then makes the final answer sketch-free.
_HH_K = 256
_HH_INV_PHI = 50


def _mg_sketch(batches):
    """mapInPandas worker: ONE bounded Misra-Gries sketch per partition
    (the iterator spans all of the partition's batches). Batched
    decrement: subtracting the (K+1)-th largest count from every
    counter removes >= (K+1)*dec occurrences, preserving the n/(K+1)
    undercount bound of the classic one-at-a-time form."""
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in batches:
        for w, c in pdf["word"].value_counts().items():
            counters[w] = counters.get(w, 0) + int(c)
        if len(counters) > _HH_K:
            dec = sorted(counters.values(), reverse=True)[_HH_K]
            counters = {w: c - dec for w, c in counters.items() if c > dec}
    yield pd.DataFrame({"word": pd.Series(list(counters), dtype="object")})


def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy hitters (words with >= 2% of all occurrences),
    two-phase: (1) per-partition Misra-Gries sketches — O(K) state per
    task regardless of vocabulary size, the 100 TB property — emit a
    candidate set that provably contains every true heavy hitter;
    (2) one exact count restricted to the (tiny, broadcast) candidates.
    The output is therefore EXACT — the sketch only prunes the
    aggregation's key space — and the threshold test is integer math
    (cnt * 50 >= total), identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    cands = words.mapInPandas(_mg_sketch, "word string").distinct()
    total = words.agg(bcount().alias("n_total"))
    return (
        words.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(bcount().alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * _HH_INV_PHI >= F.col("n_total"))
        .select("word", "cnt")
    )


_HEAVY_HITTERS_SQL = """
WITH w AS (
  SELECT unnest(str_split(text, ' ')) AS word FROM documents),
ww AS (SELECT word FROM w WHERE word != ''),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ww)
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM ww, tot
GROUP BY word, n_total
HAVING count(*) * 50 >= n_total
"""


# Conservative regex subset that parses identically under Java's regex
# engine (Spark) and RE2 (DuckDB): no backrefs, no \b, explicit classes.
_PII_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]+"
_PII_PHONE_RE = "555-[0-9]{4}"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: count then redact email / phone
    patterns, emitting per-doc redaction counts and the scrubbed text's
    md5 (so the oracle pins the exact output bytes, not just counts).

    The synthetic corpus contains no organic PII, so a deterministic
    fixture step first plants one email and one phone per doc (derived
    from doc_id); the OPERATOR is the regex count+redact chain, which is
    pure whole-stage-codegen column work — an embarrassingly parallel
    scan at 100 TB, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id"),
            F.lit("@mail.example call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL_RE, "<EMAIL>"),
        _PII_PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PII_PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


_PII_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact u' || doc_id || '@mail.example call 555-' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents),
r AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM planted)
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{_PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(regexp_extract_all(text, '{_PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(redacted) AS BIGINT) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM r
"""


_BPEISH_RE = "[a-z0-9]{1,4}"


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting two ways (training-data budgeting):
    whitespace tokens and a BPE-ish fixed-width-chunk regex
    (``[a-z0-9]{1,4}`` — every <=4-char greedy alnum chunk, the
    deterministic stand-in for a subword tokenizer's piece count), plus
    chars-per-token. Pure column expressions — map-only, no shuffle;
    the cost model a 100 TB corpus-budget pass wants."""
    docs = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    n_bpeish = F.size(F.regexp_extract_all("text", F.lit(_BPEISH_RE), 0)).cast("long")
    return docs.select(
        "doc_id",
        "n_chars",
        n_ws.alias("n_ws_tokens"),
        n_bpeish.alias("n_bpeish_tokens"),
        F.round(F.col("n_chars") / n_bpeish, 6).alias("chars_per_token"),
    )


_TOKEN_COUNT_SQL = f"""
SELECT doc_id, n_chars,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPEISH_RE}')) AS BIGINT)
         AS n_bpeish_tokens,
       ROUND(n_chars / len(regexp_extract_all(text, '{_BPEISH_RE}')), 6)
         AS chars_per_token
FROM documents
"""


def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition quality signals (the C4/Gopher-style filters):
    distinct-token ratio, duplicate-bigram fraction, and the most-
    frequent-token share. All array lambdas (JVM, codegen); the
    per-doc top-token scan is O(distinct x tokens) on ~100-token docs —
    constant per row, map-only, no shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    n = F.size("toks")
    docs = docs.withColumn("dtoks", F.array_distinct("toks")).withColumn(
        "bigrams",
        F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    n_bi = F.size("bigrams")
    top_n = F.array_max(
        F.transform(
            "dtoks",
            lambda x: F.size(F.filter("toks", lambda y: y == x)).cast("long"),
        )
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(F.size("dtoks") / n, 6).alias("distinct_ratio"),
        F.when(
            n_bi > 0, F.round((n_bi - F.size(F.array_distinct("bigrams"))) / n_bi, 6)
        ).alias("dup_bigram_frac"),
        F.round(top_n / n, 6).alias("top_token_frac"),
    )


_REPETITION_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
b AS (
  SELECT doc_id, t,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
              ELSE [] END AS bigrams
  FROM d)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       ROUND(len(list_distinct(t)) / len(t), 6) AS distinct_ratio,
       CASE WHEN len(bigrams) > 0
            THEN ROUND((len(bigrams) - len(list_distinct(bigrams)))
                       / len(bigrams), 6) END AS dup_bigram_frac,
       ROUND(list_max(list_transform(list_distinct(t),
                      x -> CAST(len(list_filter(t, y -> y = x)) AS BIGINT)))
             / len(t), 6) AS top_token_frac
FROM b
"""


_WINNOW_K = 3  # tokens per k-gram
_WINNOW_W = 4  # hashes per winnowing window


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document sketches (the MOSS local fingerprinting
    algorithm): hash every token 3-gram, slide a window of 4 hashes,
    keep each window's minimum — guaranteeing any shared substring of
    length >= k+w-1 tokens contributes a shared fingerprint, at ~1/w
    the storage of the full hash set. All array lambdas (JVM, map-only,
    no shuffle); the sketch is emitted as a count + md5 so the oracle
    hash-verifies the exact selected-hash SET. Short docs (< k+w-1
    tokens) fall back to the full hash set, the standard degenerate
    case."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    n = F.size("toks")
    kg = F.transform(
        F.sequence(F.lit(1), n - (_WINNOW_K - 1)),
        lambda i: F.concat_ws(
            " ",
            *[F.element_at("toks", i + off) for off in range(_WINNOW_K)],
        ),
    )
    docs = docs.withColumn(
        "hs",
        F.when(n >= _WINNOW_K, kg).otherwise(F.array().cast("array<string>")),
    ).withColumn(
        "hs",
        F.transform(
            "hs", lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        ),
    )
    nh = F.size("hs")
    # Window minima via shifted-slice zip_with chains, NOT a per-window
    # slice lambda: projection collapse inlines the hs expression into
    # lambda bodies, so slice-per-window re-derives the md5 array for
    # every window (measured 27x wall for 10x docs). Four O(n) slices +
    # three zip_with folds reference hs a constant number of times.
    nw = nh - (_WINNOW_W - 1)  # number of windows
    shifted = [F.slice("hs", k + 1, nw) for k in range(_WINNOW_W)]
    mins = shifted[0]
    for sh in shifted[1:]:
        mins = F.zip_with(mins, sh, lambda a, b: F.least(a, b))
    docs = docs.withColumn(
        "sel",
        F.sort_array(
            F.array_distinct(F.when(nh >= _WINNOW_W, mins).otherwise(F.col("hs")))
        ),
    )
    return docs.select(
        "doc_id",
        nh.cast("long").alias("n_kgrams"),
        F.size("sel").cast("long").alias("n_selected"),
        F.md5(
            F.array_join(F.transform("sel", lambda x: x.cast("string")), ",")
        ).alias("sketch_fp"),
    )


_WINNOW_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
kg AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {_WINNOW_K}
              THEN list_transform(range(1, len(t) - {_WINNOW_K - 2}),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              ELSE [] END AS g
  FROM d),
h AS (
  SELECT doc_id,
         list_transform(g, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
  FROM kg),
s AS (
  SELECT doc_id, hs,
         CASE WHEN len(hs) >= {_WINNOW_W}
              THEN list_transform(range(1, len(hs) - {_WINNOW_W - 2}),
                                  j -> list_min(hs[j:j+{_WINNOW_W - 1}]))
              ELSE hs END AS mins
  FROM h)
SELECT doc_id,
       CAST(len(hs) AS BIGINT) AS n_kgrams,
       CAST(len(list_distinct(mins)) AS BIGINT) AS n_selected,
       md5(array_to_string(list_sort(list_distinct(mins)), ',')) AS sketch_fp
FROM s
"""


def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document — the Gopher/RefinedWeb
    quality signal (machine-generated/boilerplate text compresses far
    better than natural prose). zlib lives Python-side, so this is the
    one text op on the Pandas path: mapInPandas over Arrow batches
    (vectorized transfer, no per-row pickling), map-only, no shuffle.
    R-tier: DuckDB has no zlib, so the driver records rows-only;
    determinism (fixed level 6) and the repetitive<random ordering are
    pinned in pytest."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )

    def batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            comp = pdf["text"].map(
                lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": pdf["n_chars"],
                    "n_compressed": comp,
                    "ratio": (comp / pdf["n_chars"]).round(6),
                }
            )

    return docs.mapInPandas(
        batches, "doc_id long, n_chars long, n_compressed long, ratio double"
    )


def text_ttr_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc lexical-diversity profile: vocabulary size (distinct
    tokens), type–token ratio, and hapax-legomena share — the standard
    "is this document natural language or boilerplate" screen in a
    training-corpus curation pass (low TTR = template/repetition, high
    hapax share = natural prose or noise).

    Shape: MAP-ONLY. Per-doc stats never need a shuffle: sort the
    token array in place and compare each token with its neighbors —
    a duplicate run of length k contributes k-1 equal-to-next
    positions (n_types = n - Σ), and a hapax is equal to neither
    neighbor. Zero Exchange in the plan (asserted in test_plans): at
    100 TB this runs at scan speed, where the explode + (doc, token)
    groupBy form measured 2x-superlinear at 40x from shuffle spill.
    The oracle keeps the relational unnest + GROUP BY form — the two
    implementations cross-check each other.

    Arrays are compared only via whole-array zip_with/aggregate
    (constant slice count per row), never element_at inside a lambda
    — projection collapse would inline and re-derive the sorted
    array per element (the winnowing trap, NOTES.md)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = F.sort_array(F.split("text", " "))
    frame = docs.select("doc_id", s.alias("s"), F.size(s).alias("n"))
    nxt = F.slice(F.col("s"), 2, F.greatest(F.col("n") - 1, F.lit(0)))
    prv = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(F.col("s"), 1, F.greatest(F.col("n") - 1, F.lit(0))),
    )
    eq = lambda x, y: F.when(y.isNull() | (x != y), 0).otherwise(1)  # noqa: E731
    flagged = frame.select(
        "doc_id",
        "n",
        F.zip_with(F.col("s"), nxt, eq).alias("eq_next"),
        F.zip_with(F.col("s"), prv, eq).alias("eq_prev"),
    )
    asum = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0), lambda acc, x: acc + x
    )
    hapax_flags = F.zip_with(
        F.col("eq_prev"),
        F.col("eq_next"),
        lambda p, q: F.when((p == 0) & (q == 0), 1).otherwise(0),
    )
    stats = flagged.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        (F.col("n") - asum(F.col("eq_next"))).cast("long").alias("n_types"),
        asum(hapax_flags).cast("long").alias("n_hapax"),
    )
    return stats.select(
        "doc_id",
        "n_types",
        "n_tokens",
        "n_hapax",
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("ttr"),
        F.round(
            F.col("n_hapax").cast("double") / F.col("n_types").cast("double"),
            6,
        ).alias("hapax_ratio"),
    )


_TTR_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
pt AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok GROUP BY doc_id, tok)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS ttr,
       round(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
FROM pt GROUP BY doc_id
"""


def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus drift: Jensen–Shannon divergence (log2, so
    0 ≤ JS ≤ 1) between each source's unigram distribution and the
    whole corpus — the standard "which ingest feed changed character"
    monitor for a pretraining mixture.

    The q-side KL sum runs over the FULL vocabulary; tokens absent
    from a source have m = q/2, so their term is exactly q·log2(2)=q
    and the absent-token mass folds in as (1 − Σ_present q) without
    ever materializing a vocab × sources grid. Transcendental terms
    round to 6 dp before exact DECIMAL summation (libm discipline);
    the global token table is broadcast."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    tok_src = toks.groupBy("source", "tok").agg(bcount().alias("n_st"))
    tot_src = tok_src.groupBy("source").agg(
        F.sum("n_st").cast("long").alias("n_s"),
        bcount().alias("vocab_s"),
    )
    tok_glob = toks.groupBy("tok").agg(bcount().alias("n_t"))
    n_total = toks.select(bcount().alias("n")).first()["n"]
    j = tok_src.join(F.broadcast(tok_glob), "tok").join(
        F.broadcast(tot_src.select("source", "n_s")), "source"
    )
    p = F.col("n_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("n_t").cast("double") / F.lit(float(n_total))
    m = (p + q) / 2
    terms = j.select(
        "source",
        F.round(p * F.log2(p / m), 6).alias("tp"),
        F.round(q * F.log2(q / m), 6).alias("tq"),
        F.round(q, 6).alias("qr"),
    )
    agg = terms.groupBy("source").agg(
        F.sum(F.col("tp").cast(_DEC)).cast("double").alias("p_sum"),
        F.sum(F.col("tq").cast(_DEC)).cast("double").alias("qp_sum"),
        F.sum(F.col("qr").cast(_DEC)).cast("double").alias("q_mass"),
    )
    js = F.round(
        0.5
        * (
            F.col("p_sum")
            + (F.col("qp_sum") + (F.lit(1.0) - F.col("q_mass")))
        ),
        6,
    )
    return agg.join(tot_src, "source").select(
        "source",
        F.col("n_s").alias("n_tokens"),
        F.col("vocab_s").alias("vocab"),
        js.alias("js_divergence"),
    )


_JS_SQL = """
WITH toks AS (
  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
tok_src AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n_st
  FROM toks GROUP BY source, tok),
tot_src AS (
  SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s,
         CAST(COUNT(*) AS BIGINT) AS vocab_s
  FROM tok_src GROUP BY source),
tok_glob AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_t FROM toks GROUP BY tok),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
terms AS (
  SELECT ts.source,
         round((CAST(ts.n_st AS DOUBLE) / t.n_s)
               * log2((CAST(ts.n_st AS DOUBLE) / t.n_s)
                      / ((CAST(ts.n_st AS DOUBLE) / t.n_s
                          + CAST(g.n_t AS DOUBLE) / n.n) / 2)), 6) AS tp,
         round((CAST(g.n_t AS DOUBLE) / n.n)
               * log2((CAST(g.n_t AS DOUBLE) / n.n)
                      / ((CAST(ts.n_st AS DOUBLE) / t.n_s
                          + CAST(g.n_t AS DOUBLE) / n.n) / 2)), 6) AS tq,
         round(CAST(g.n_t AS DOUBLE) / n.n, 6) AS qr
  FROM tok_src ts
  JOIN tok_glob g USING (tok)
  JOIN tot_src t USING (source)
  CROSS JOIN n),
agg AS (
  SELECT source,
         CAST(SUM(CAST(tp AS DECIMAL(30,6))) AS DOUBLE) AS p_sum,
         CAST(SUM(CAST(tq AS DECIMAL(30,6))) AS DOUBLE) AS qp_sum,
         CAST(SUM(CAST(qr AS DECIMAL(30,6))) AS DOUBLE) AS q_mass
  FROM terms GROUP BY source)
SELECT agg.source, t.n_s AS n_tokens, t.vocab_s AS vocab,
       round(0.5 * (p_sum + (qp_sum + (1.0 - q_mass))), 6)
         AS js_divergence
FROM agg JOIN tot_src t USING (source)
"""



_ZIPF_TOPN = 100


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS of ln(freq) on ln(rank)
    for the top-100 tokens — natural language sits near slope −1;
    template/synthetic corpora drift off it (a one-number corpus
    authenticity check). Rank ties break by token text; the five OLS
    sufficient sums are 6-dp-rounded transcendental terms summed as
    DECIMAL; the closed-form slope/intercept mirrors
    ml_linreg_closed_form's arithmetic shape.

    Scale posture: the token count is one map-side-combined
    aggregate; the top-100 selection is a TakeOrdered-sized sort and
    the regression runs on 100 rows."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(bcount().alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(
        _ZIPF_TOPN
    )
    from pyspark.sql import Window as _W

    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            _W.orderBy(F.col("n").desc(), F.col("tok").asc())
        ),
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))

    def d6(c):
        return F.sum(F.round(c, 6).cast(_DEC)).cast("double")

    agg = ranked.select(
        d6(x).alias("sx"),
        d6(y).alias("sy"),
        d6(x * y).alias("sxy"),
        d6(x * x).alias("sxx"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n_tokens_fit"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


_ZIPF_SQL = f"""
WITH counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank
  FROM counts ORDER BY n DESC, tok ASC LIMIT {_ZIPF_TOPN}),
agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(round(ln(CAST(rank AS DOUBLE)), 6)
                       AS DECIMAL(30,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(ln(CAST(ranked.n AS DOUBLE)), 6)
                       AS DECIMAL(30,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(ln(CAST(rank AS DOUBLE))
                             * ln(CAST(ranked.n AS DOUBLE)), 6)
                       AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(ln(CAST(rank AS DOUBLE))
                             * ln(CAST(rank AS DOUBLE)), 6)
                       AS DECIMAL(30,6))) AS DOUBLE) AS sxx
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_tokens_fit,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS zipf_intercept
FROM agg
"""


QUERIES = {
    "text_zipf_fit": text_zipf_fit,
    "text_js_divergence": text_js_divergence,
    "text_ttr_vocab": text_ttr_vocab,
    "text_pii_redact": text_pii_redact,
    "text_compression_ratio": text_compression_ratio,
    "text_winnowing": text_winnowing,
    "text_token_count": text_token_count,
    "text_repetition_ratio": text_repetition_ratio,
    "text_tfidf_topk": text_tfidf_topk,
    "text_heavy_hitters": text_heavy_hitters,
    "text_stats": text_stats,
    "text_ngram_profile": text_ngram_profile,
    "text_lang_profile": text_lang_profile,
    "text_quality": text_quality,
    "text_fingerprint": text_fingerprint,
    "text_lang_id": text_lang_id,
}

ORACLE = {
    "text_zipf_fit": _ZIPF_SQL,
    "text_js_divergence": _JS_SQL,
    "text_ttr_vocab": _TTR_SQL,
    "text_pii_redact": _PII_SQL,
    "text_winnowing": _WINNOW_SQL,
    "text_token_count": _TOKEN_COUNT_SQL,
    "text_repetition_ratio": _REPETITION_SQL,
    "text_tfidf_topk": _TFIDF_SQL,
    "text_heavy_hitters": _HEAVY_HITTERS_SQL,
    "text_stats": _TEXT_STATS_SQL,
    "text_ngram_profile": _NGRAM_PROFILE_SQL,
    "text_lang_profile": _LANG_PROFILE_SQL,
    "text_quality": _TEXT_QUALITY_SQL,
    "text_fingerprint": _TEXT_FP_SQL,
    # text_lang_id: R-tier heuristic.
}


# ---------------------------------------------------------------------------
# Gopher-style rule filter (round 4): the published rule set
# (Rae et al. 2021, Appendix A) adapted to this corpus — a RULE-LEVEL
# report (one boolean per rule per doc) rather than text_quality's
# composite score, because production filters tune and ablate rules
# individually.

_GOPHER_MIN_WORDS = 8
_GOPHER_MAX_WORDS = 2000
_GOPHER_MWL_LO = 2.0
_GOPHER_MWL_HI = 10.0
_GOPHER_MAX_WORD_LEN = 25
_GOPHER_MIN_STOP_HITS = 2
_GOPHER_MIN_ALPHA_WORD_FRAC = 0.8


def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule Gopher quality flags: word-count band, mean word length
    band, no over-long word, >= 2 stopword hits, >= 80% of words
    containing an alphabetic character — plus the conjunction
    (keep_gopher). Mean word length is an exact-integer sum divided by
    an exact count (one IEEE division, both engines). Map-only over
    the documents scan; every rule is a JVM array/string built-in."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mwl = sum_len.cast("double") / n.cast("double")
    max_len = F.array_max(F.transform(toks, lambda x: F.length(x).cast("long")))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_STOPWORDS))).cast("long")
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))).cast("long")
    alpha_frac = alpha_words.cast("double") / n.cast("double")
    r_words = (n >= _GOPHER_MIN_WORDS) & (n <= _GOPHER_MAX_WORDS)
    r_mwl = (mwl >= _GOPHER_MWL_LO) & (mwl <= _GOPHER_MWL_HI)
    r_longword = max_len <= _GOPHER_MAX_WORD_LEN
    r_stop = stop_hits >= _GOPHER_MIN_STOP_HITS
    r_alpha = alpha_frac >= _GOPHER_MIN_ALPHA_WORD_FRAC
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        r_words.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_longword.alias("rule_no_long_word"),
        r_stop.alias("rule_stopwords"),
        r_alpha.alias("rule_alpha_words"),
        (r_words & r_mwl & r_longword & r_stop & r_alpha).alias("keep_gopher"),
    )


_GOPHER_SQL = f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
           AS sum_len,
         CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT)
           AS max_len,
         CAST(len(list_filter(toks, x -> list_contains([{_STOP_LIST_SQL}], x)))
              AS BIGINT) AS stop_hits,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
              AS BIGINT) AS alpha_words
  FROM t)
SELECT doc_id,
       n AS n_words,
       round(CAST(sum_len AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_word_len,
       n >= {_GOPHER_MIN_WORDS} AND n <= {_GOPHER_MAX_WORDS} AS rule_word_count,
       CAST(sum_len AS DOUBLE) / CAST(n AS DOUBLE) >= {_GOPHER_MWL_LO}
         AND CAST(sum_len AS DOUBLE) / CAST(n AS DOUBLE) <= {_GOPHER_MWL_HI}
         AS rule_mean_word_len,
       max_len <= {_GOPHER_MAX_WORD_LEN} AS rule_no_long_word,
       stop_hits >= {_GOPHER_MIN_STOP_HITS} AS rule_stopwords,
       CAST(alpha_words AS DOUBLE) / CAST(n AS DOUBLE)
         >= {_GOPHER_MIN_ALPHA_WORD_FRAC} AS rule_alpha_words,
       (n >= {_GOPHER_MIN_WORDS} AND n <= {_GOPHER_MAX_WORDS})
         AND (CAST(sum_len AS DOUBLE) / CAST(n AS DOUBLE) >= {_GOPHER_MWL_LO}
              AND CAST(sum_len AS DOUBLE) / CAST(n AS DOUBLE) <= {_GOPHER_MWL_HI})
         AND max_len <= {_GOPHER_MAX_WORD_LEN}
         AND stop_hits >= {_GOPHER_MIN_STOP_HITS}
         AND CAST(alpha_words AS DOUBLE) / CAST(n AS DOUBLE)
               >= {_GOPHER_MIN_ALPHA_WORD_FRAC}
         AS keep_gopher
FROM m
"""

QUERIES["text_quality_gopher"] = text_quality_gopher
ORACLE["text_quality_gopher"] = _GOPHER_SQL


# ---------------------------------------------------------------------------
# BPE merge training (round 4): two rounds of byte-pair-encoding merge
# selection, the way tokenizer training actually distributes — over
# the WORD VOCABULARY with frequencies (corpus-size-independent after
# the first aggregate), not over raw text.


def _spaced(col):
    """'hello' -> 'h e l l o' (symbol-per-token spaced form)."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the spaced vocabulary:
    each word contributes (its pair multiset) x (its corpus freq)."""
    syms = F.split("w", " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.concat_ws(" ", F.element_at(syms, i), F.element_at(syms, i + 1)),
    )
    return (
        vocab.where(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _top_pair(counts: DataFrame) -> DataFrame:
    w = Window.partitionBy().orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("pair", "pair_count")
    )


def _apply_merge(vocab: DataFrame, top: DataFrame) -> DataFrame:
    """Greedy TWO-SWEEP literal application of the winning pair: the
    padded spaced form replaces ' a b ' -> ' ab ' twice (the second
    sweep catches occurrences whose shared boundary space the first
    sweep consumed). Equivalent to canonical left-to-right BPE for
    repeat-runs <= 3 — beyond any run in a natural-language vocab —
    and, critically, an IDENTICAL well-defined operation in both
    engines (DuckDB's replace() has the same non-overlapping
    left-to-right contract, and RE2's missing lookbehind rules out the
    regex form)."""
    merged = F.replace(F.col("pair"), F.lit(" "), F.lit(""))
    pad = F.concat(F.lit(" "), F.col("w"), F.lit(" "))
    srch = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
    repl = F.concat(F.lit(" "), merged, F.lit(" "))
    one = F.replace(pad, srch, repl)
    two = F.trim(F.replace(one, srch, repl))
    return vocab.join(F.broadcast(top)).select(two.alias("w"), "freq")


def text_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two BPE merge-training rounds over the document corpus: build
    the word-frequency vocabulary (ONE corpus aggregate — everything
    after is vocabulary-sized, the real reason BPE training scales),
    pick the max-weighted-count adjacent symbol pair (ties: lexical),
    apply it, recount, pick again. Emits one row per round with the
    winning pair, its merged symbol, count, and the post-merge distinct
    symbol count (vocab growth audit)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    vocab = (
        words.groupBy("word")
        .agg(bcount().alias("freq"))
        .select(_spaced(F.col("word")).alias("w"), "freq")
        .localCheckpoint(eager=False)
    )
    out_rows = []
    for rnd in (1, 2):
        top = _top_pair(_pair_counts(vocab)).localCheckpoint(eager=False)
        vocab = _apply_merge(vocab, top).localCheckpoint(eager=False)
        n_syms = (
            vocab.select(F.explode(F.split("w", " ")).alias("s"))
            .agg(F.count_distinct("s").cast("long").alias("n_symbols"))
        )
        out_rows.append(
            top.join(F.broadcast(n_syms)).select(
                F.lit(rnd).cast("long").alias("round"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "pair_count",
                "n_symbols",
            )
        )
    out = out_rows[0]
    for o in out_rows[1:]:
        out = out.unionByName(o)
    return out


def _bpe_sql() -> str:
    pair_counts = """
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM (
    SELECT freq, syms[i] || ' ' || syms[i + 1] AS pair
    FROM (SELECT str_split(w, ' ') AS syms, freq FROM {vocab}),
         LATERAL unnest(range(1, len(syms))) AS u(i)
    WHERE len(syms) >= 2)
  GROUP BY pair"""
    top = """
  SELECT pair, pair_count FROM (
    SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS rk
    FROM {src}) WHERE rk = 1"""
    apply = """
  SELECT trim(replace(
           replace(' ' || w || ' ', ' ' || t.pair || ' ',
                   ' ' || replace(t.pair, ' ', '') || ' '),
           ' ' || t.pair || ' ',
           ' ' || replace(t.pair, ' ', '') || ' ')) AS w,
         freq
  FROM {vocab}, {top} t"""
    return f"""
WITH words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
v0 AS MATERIALIZED (
  SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w, freq
  FROM words),
pc1 AS MATERIALIZED ({pair_counts.format(vocab='v0')}),
t1 AS MATERIALIZED ({top.format(src='pc1')}),
v1 AS MATERIALIZED ({apply.format(vocab='v0', top='t1')}),
n1 AS (
  SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_symbols
  FROM (SELECT unnest(str_split(w, ' ')) AS s FROM v1)),
pc2 AS MATERIALIZED ({pair_counts.format(vocab='v1')}),
t2 AS MATERIALIZED ({top.format(src='pc2')}),
v2 AS MATERIALIZED ({apply.format(vocab='v1', top='t2')}),
n2 AS (
  SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_symbols
  FROM (SELECT unnest(str_split(w, ' ')) AS s FROM v2))
SELECT CAST(1 AS BIGINT) AS round, t1.pair,
       replace(t1.pair, ' ', '') AS merged, t1.pair_count, n1.n_symbols
FROM t1, n1
UNION ALL
SELECT 2, t2.pair, replace(t2.pair, ' ', ''), t2.pair_count, n2.n_symbols
FROM t2, n2
"""


QUERIES["text_bpe_train_rounds"] = text_bpe_train_rounds
ORACLE["text_bpe_train_rounds"] = _bpe_sql()


# ---------------------------------------------------------------------------
# BPE ENCODE (round 5): apply the merges the trainer learned to the
# corpus. The scalable shape: merges are applied once to the WORD
# VOCABULARY (vocabulary-sized work), producing a word -> token-count
# mapping that is broadcast-joined back to the exploded corpus — the
# corpus-sized pass is map-only + one partial-aggregated groupBy. At
# extreme vocabulary sizes (100 TB web corpus) drop the broadcast hint
# and let AQE pick the join; the semantics are unchanged.


def _apply_merge_keyed(vocab: DataFrame, top: DataFrame) -> DataFrame:
    """_apply_merge, keeping the original word as the join key."""
    merged = F.replace(F.col("pair"), F.lit(" "), F.lit(""))
    pad = F.concat(F.lit(" "), F.col("w"), F.lit(" "))
    srch = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
    repl = F.concat(F.lit(" "), merged, F.lit(" "))
    one = F.replace(pad, srch, repl)
    two = F.trim(F.replace(one, srch, repl))
    return vocab.join(F.broadcast(top)).select("word", two.alias("w"), "freq")


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the 2 merges text_bpe_train_rounds
    learns (same selection rule: max weighted pair count, lexical tie
    break; same two-sweep literal application). Per doc: whitespace
    word count, the character-level token count (pre-merge), and the
    BPE token count after both merges. n_bpe_tokens < n_char_tokens
    exactly where a learned pair occurs — the round-trip invariant
    tests/test_pipeline.py pins against text_token_count."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    vocab = (
        words.groupBy("word")
        .agg(bcount().alias("freq"))
        .select("word", _spaced(F.col("word")).alias("w"), "freq")
        .localCheckpoint(eager=False)
    )
    for _ in (1, 2):
        top = _top_pair(_pair_counts(vocab)).localCheckpoint(eager=False)
        vocab = _apply_merge_keyed(vocab, top).localCheckpoint(eager=False)
    enc = vocab.select(
        "word", F.size(F.split("w", " ")).cast("long").alias("n_tok")
    )
    return (
        words.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            bcount().alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_char_tokens"),
            F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
        )
    )


def _bpe_encode_sql() -> str:
    pair_counts = """
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM (
    SELECT freq, syms[i] || ' ' || syms[i + 1] AS pair
    FROM (SELECT str_split(w, ' ') AS syms, freq FROM {vocab}),
         LATERAL unnest(range(1, len(syms))) AS u(i)
    WHERE len(syms) >= 2)
  GROUP BY pair"""
    top = """
  SELECT pair, pair_count FROM (
    SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS rk
    FROM {src}) WHERE rk = 1"""
    apply = """
  SELECT word, trim(replace(
           replace(' ' || w || ' ', ' ' || t.pair || ' ',
                   ' ' || replace(t.pair, ' ', '') || ' '),
           ' ' || t.pair || ' ',
           ' ' || replace(t.pair, ' ', '') || ' ')) AS w,
         freq
  FROM {vocab}, {top} t"""
    return f"""
WITH dw AS MATERIALIZED (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''),
words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM dw GROUP BY word),
v0 AS MATERIALIZED (
  SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w, freq
  FROM words),
pc1 AS MATERIALIZED ({pair_counts.format(vocab='v0')}),
t1 AS MATERIALIZED ({top.format(src='pc1')}),
v1 AS MATERIALIZED ({apply.format(vocab='v0', top='t1')}),
pc2 AS MATERIALIZED ({pair_counts.format(vocab='v1')}),
t2 AS MATERIALIZED ({top.format(src='pc2')}),
v2 AS MATERIALIZED ({apply.format(vocab='v1', top='t2')}),
enc AS (
  SELECT word, CAST(len(str_split(w, ' ')) AS BIGINT) AS n_tok FROM v2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(word)) AS BIGINT) AS n_char_tokens,
       CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN enc USING (word)
GROUP BY doc_id
"""


QUERIES["text_bpe_encode"] = text_bpe_encode
ORACLE["text_bpe_encode"] = _bpe_encode_sql()


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word trigrams that FIRST appear in that document
    (first = smallest doc_id), i.e. how much new surface text each doc
    contributes to the corpus — the memorization/near-duplication
    screen run before adding a crawl slice to a training mix (novelty
    ~ 0 means the doc is stitched from already-seen text).

    Shape: trigram explode is map-only; one trigram-keyed groupBy
    computes the global first-seer with map-side partial MIN, and the
    join back is on the same trigram partitioning before the per-doc
    aggregate. Everything is integers and strings — exact oracle, no
    float discipline needed beyond the final 6 dp ratio.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 3)
    )
    tris = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    ex = docs.select("doc_id", F.explode(tris).alias("tri")).distinct()
    first = ex.groupBy("tri").agg(F.min("doc_id").alias("first_doc"))
    per = (
        ex.join(first, "tri")
        .groupBy("doc_id")
        .agg(
            bcount().alias("n_tri"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_tri",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_tri").cast("double"), 6
        ).alias("novelty"),
    ).orderBy("doc_id")


_NGRAM_NOVELTY_SQL = """
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS l FROM documents),
ex AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(range(len(l) - 2),
                i -> concat_ws(' ', l[i+1], l[i+2], l[i+3]))) AS tri
  FROM toks WHERE len(l) >= 3),
first AS (
  SELECT tri, MIN(doc_id) AS first_doc FROM ex GROUP BY tri),
per AS (
  SELECT e.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tri,
         CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM ex e JOIN first f ON e.tri = f.tri
  GROUP BY e.doc_id)
SELECT doc_id, n_tri, n_novel,
       round(CAST(n_novel AS DOUBLE) / CAST(n_tri AS DOUBLE), 6) AS novelty
FROM per
ORDER BY doc_id
"""

QUERIES["text_ngram_novelty"] = text_ngram_novelty
ORACLE["text_ngram_novelty"] = _NGRAM_NOVELTY_SQL


_PMI_TOP_TOKENS = 30
_PMI_MIN_CO = 5
_PMI_TOPK = 50


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information collocations: for the 30 highest
    document-frequency tokens, score every co-occurring pair by
    PMI = ln(N * df_ab / (df_a * df_b)) over document-level presence —
    the classic collocation/association miner (which tokens travel
    together beyond chance?).

    Shape: doc-token presence is a distinct projection; the vocabulary
    cap bounds the pair join at top^2 regardless of corpus size (the
    frequency-capped-index discipline); PMI is one ln() on exact
    integer ratios, rounded 6 dp before the top-k ordering so the cut
    is engine-stable.
    """
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    n_docs = docs.agg(bcount().alias("nd"))
    wdf = Window.orderBy(F.col("df").desc(), F.col("tok").asc())
    top = (
        dt.groupBy("tok")
        .agg(bcount().alias("df"))
        .withColumn("rk", F.row_number().over(wdf))
        .where(F.col("rk") <= _PMI_TOP_TOKENS)
        .select("tok", "df")
    )
    kept = dt.join(F.broadcast(top), "tok")
    a = kept.select(
        F.col("doc_id"), F.col("tok").alias("ta"), F.col("df").alias("dfa")
    )
    b = kept.select(
        F.col("doc_id"), F.col("tok").alias("tb"), F.col("df").alias("dfb")
    )
    co = (
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb", "dfa", "dfb")
        .agg(bcount().alias("co"))
        .where(F.col("co") >= _PMI_MIN_CO)
    )
    return (
        co.crossJoin(F.broadcast(n_docs))
        .select(
            "ta",
            "tb",
            "co",
            F.round(
                F.expr(
                    "ln(CAST(co AS DOUBLE) * CAST(nd AS DOUBLE)"
                    " / (CAST(dfa AS DOUBLE) * CAST(dfb AS DOUBLE)))"
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("ta").asc(), F.col("tb").asc())
        .limit(_PMI_TOPK)
    )


_PMI_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, UNNEST(str_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
top AS (
  SELECT tok, df FROM (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rk
    FROM dt GROUP BY tok)
  WHERE rk <= {_PMI_TOP_TOKENS}),
kept AS (SELECT dt.doc_id, dt.tok, t.df FROM dt JOIN top t ON dt.tok = t.tok),
co AS (
  SELECT a.tok AS ta, b.tok AS tb, a.df AS dfa, b.df AS dfb,
         CAST(COUNT(*) AS BIGINT) AS co
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= {_PMI_MIN_CO})
SELECT ta, tb, co,
       round(ln(CAST(co AS DOUBLE) * CAST(nd AS DOUBLE)
             / (CAST(dfa AS DOUBLE) * CAST(dfb AS DOUBLE))), 6) AS pmi
FROM co CROSS JOIN nd
ORDER BY pmi DESC, ta ASC, tb ASC
LIMIT {_PMI_TOPK}
"""

QUERIES["text_pmi_collocations"] = text_pmi_collocations
ORACLE["text_pmi_collocations"] = _PMI_SQL


_TR_VOCAB = 100
_TR_ITERS = 3
_TR_DAMP = "0.85"
_TR_TOPK = 20


def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the token ADJACENCY graph (co-occurrence weight =
    count of adjacent positions corpus-wide), restricted to the top-100
    document-frequency tokens so the graph is bounded at any corpus
    size; 3 damped iterations, top-20 keywords.

    Determinism: edge weights and weighted degrees are exact BIGINTs;
    per-edge contributions quantize to DECIMAL(38,12) before each
    node sum (the graph_pagerank discipline); the final top-k orders
    by the 9 dp-rounded rank with token tiebreak.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.struct(
            F.element_at("t", i + 1).alias("a"), F.element_at("t", i + 2).alias("b")
        ),
    )
    adj = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(grams).alias("g"))
        .select("g.a", "g.b")
        .where((F.col("a") != "") & (F.col("b") != "") & (F.col("a") != F.col("b")))
    )
    dt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    wv = Window.orderBy(F.col("df").desc(), F.col("tok").asc())
    vocab = (
        dt.groupBy("tok")
        .agg(bcount().alias("df"))
        .withColumn("rk", F.row_number().over(wv))
        .where(F.col("rk") <= _TR_VOCAB)
        .select("tok")
    )
    und = (
        adj.join(F.broadcast(vocab.select(F.col("tok").alias("a"))), "a")
        .join(F.broadcast(vocab.select(F.col("tok").alias("b"))), "b")
        .select(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        )
        .groupBy("x", "y")
        .agg(bcount().alias("w"))
    )
    sym = und.select(
        F.col("x").alias("src"), F.col("y").alias("dst"), "w"
    ).unionByName(und.select(F.col("y").alias("src"), F.col("x").alias("dst"), "w"))
    sym = sym.localCheckpoint()  # vocab^2-bounded edge list, reused per iter
    wdeg = sym.groupBy("src").agg(F.sum("w").cast("long").alias("wd"))
    nodes = sym.select(F.col("src").alias("node")).distinct()
    nn = nodes.count()  # <= 100, metadata-scale
    ranks = nodes.select("node", F.lit(round(1.0 / nn, 9)).alias("rank"))
    for _ in range(_TR_ITERS):
        contrib = (
            sym.join(wdeg, "src")
            .join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .select(
                "dst",
                (
                    F.col("rank") * F.col("w").cast("double")
                    / F.col("wd").cast("double")
                ).cast("decimal(38,12)").alias("q"),
            )
        )
        summed = contrib.groupBy("dst").agg(F.sum("q").cast("double").alias("acc"))
        ranks = (
            nodes.join(summed, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                F.expr(
                    f"(1.0 - {_TR_DAMP}) / CAST({nn} AS DOUBLE)"
                    f" + {_TR_DAMP} * COALESCE(acc, 0.0)"
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return (
        ranks.select("node", F.round("rank", 9).alias("textrank"))
        .orderBy(F.col("textrank").desc(), F.col("node").asc())
        .limit(_TR_TOPK)
    )


def _textrank_sql() -> str:
    base = f"""
toks AS (SELECT str_split(text, ' ') AS t FROM documents),
adj AS (
  SELECT g['a'] AS a, g['b'] AS b FROM (
    SELECT UNNEST(list_transform(range(len(t) - 1),
           i -> {{'a': t[i+1], 'b': t[i+2]}})) AS g
    FROM toks WHERE len(t) >= 2)
  WHERE g['a'] <> '' AND g['b'] <> '' AND g['a'] <> g['b']),
dt AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, UNNEST(str_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rk
    FROM dt GROUP BY tok)
  WHERE rk <= {_TR_VOCAB}),
und AS (
  SELECT LEAST(a, b) AS x, GREATEST(a, b) AS y,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM adj
  WHERE a IN (SELECT tok FROM vocab) AND b IN (SELECT tok FROM vocab)
  GROUP BY 1, 2),
sym AS (
  SELECT x AS src, y AS dst, w FROM und
  UNION ALL SELECT y AS src, x AS dst, w FROM und),
wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wd FROM sym GROUP BY 1),
nodes AS (SELECT DISTINCT src AS node FROM sym),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM nodes),
r0 AS (SELECT node, round(1.0 / CAST(k AS DOUBLE), 9) AS rank FROM nodes, nn)"""
    steps = []
    for i in range(_TR_ITERS):
        steps.append(f"""
s{i} AS (
  SELECT e.dst,
         CAST(SUM(CAST(r.rank * CAST(e.w AS DOUBLE) / CAST(d.wd AS DOUBLE)
              AS DECIMAL(38,12))) AS DOUBLE) AS acc
  FROM sym e
  JOIN wdeg d ON e.src = d.src
  JOIN r{i} r ON e.src = r.node
  GROUP BY 1),
r{i + 1} AS (
  SELECT n.node,
         (1.0 - {_TR_DAMP}) / CAST(nn.k AS DOUBLE)
           + {_TR_DAMP} * COALESCE(s.acc, 0.0) AS rank
  FROM nodes n CROSS JOIN nn LEFT JOIN s{i} s ON n.node = s.dst)""")
    return (
        "WITH "
        + ",".join([base] + steps)
        + f"""
SELECT node, round(rank, 9) AS textrank
FROM r{_TR_ITERS}
ORDER BY textrank DESC, node ASC
LIMIT {_TR_TOPK}"""
    )


QUERIES["text_textrank_keywords"] = text_textrank_keywords
ORACLE["text_textrank_keywords"] = _textrank_sql()


# Ordered suffix-strip rules (longest first), applied once each, only
# when the stem stays >= 3 chars. Same regexes in both engines (RE2 /
# Java agree on these literals).
_STEM_RULES = [("ing$", ""), ("edly$", ""), ("ed$", ""), ("es$", ""), ("s$", "")]


def text_stem_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-strip stemming profile (a Porter-lite first pass): apply
    the classic -ing/-ed/-es/-s strips (guarded to keep stems >= 3
    chars) to the corpus vocabulary and report per language: distinct
    tokens before and after, and the vocabulary shrink ratio — the
    index-size estimate a search pipeline wants before enabling
    stemming.

    Purely lexical (strings + integers): exact oracle. The stem is one
    nested conditional expression evaluated at scan speed; the only
    shuffles are the two distinct-counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    stem = F.col("tok")
    for pat, rep in _STEM_RULES:
        candidate = F.regexp_replace(stem, pat, rep)
        stem = F.when(
            (F.length(candidate) >= 3) & (candidate != stem), candidate
        ).otherwise(stem)
    stemmed = toks.withColumn("stem", stem)
    return (
        stemmed.groupBy("lang")
        .agg(
            F.countDistinct("tok").cast("long").alias("vocab_raw"),
            F.countDistinct("stem").cast("long").alias("vocab_stemmed"),
        )
        .select(
            "lang",
            "vocab_raw",
            "vocab_stemmed",
            F.round(
                F.expr(
                    "CAST(vocab_stemmed AS DOUBLE) / CAST(vocab_raw AS DOUBLE)"
                ),
                6,
            ).alias("shrink_ratio"),
        )
        .orderBy("lang")
    )


def _stem_sql() -> str:
    expr = "tok"
    for pat, rep in _STEM_RULES:
        cand = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
        expr = (
            f"(CASE WHEN length({cand}) >= 3 AND {cand} <> {expr}"
            f" THEN {cand} ELSE {expr} END)"
        )
    return f"""
WITH toks AS (
  SELECT lang, UNNEST(str_split(text, ' ')) AS tok FROM documents),
t AS (SELECT lang, tok, {expr} AS stem FROM toks WHERE tok <> '')
SELECT lang,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_raw,
       CAST(COUNT(DISTINCT stem) AS BIGINT) AS vocab_stemmed,
       round(CAST(COUNT(DISTINCT stem) AS DOUBLE)
             / CAST(COUNT(DISTINCT tok) AS DOUBLE), 6) AS shrink_ratio
FROM t
GROUP BY lang
ORDER BY lang
"""


QUERIES["text_stem_suffix"] = text_stem_suffix
ORACLE["text_stem_suffix"] = _stem_sql()


_BURST_TOP = 30


def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (variance-to-mean ratio of per-document counts)
    for the 30 highest-df tokens: function words spread evenly (VMR
    ~<= 1, Poisson-ish) while topical/content words BURST (VMR >> 1 —
    they pile into the few documents about their topic) — the
    classic content-word detector used for keyword weighting.

    Per-doc counts are exact integers (zero-docs included via the doc
    count, not a join); VMR = (ss/N - (s/N)^2)/(s/N) from DECIMAL
    sums, one shared closed form.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(bcount().alias("nd"))
    tok_counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(bcount().alias("c"))
    )
    wdf = Window.orderBy(F.col("df").desc(), F.col("tok").asc())
    top = (
        tok_counts.groupBy("tok")
        .agg(bcount().alias("df"))
        .withColumn("rk", F.row_number().over(wdf))
        .where(F.col("rk") <= _BURST_TOP)
        .select("tok", "df")
    )
    suff = (
        tok_counts.join(F.broadcast(top), "tok")
        .groupBy("tok", "df")
        .agg(
            F.sum("c").cast("long").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        )
    )
    vmr = (
        "((CAST(ss AS DOUBLE) / CAST(nd AS DOUBLE)"
        " - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
        " * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))"
        " / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))"
    )
    return (
        suff.crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            "df",
            "s",
            F.round(F.expr(vmr), 6).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), F.col("tok").asc())
    )


def _burstiness_sql() -> str:
    vmr = (
        "((CAST(ss AS DOUBLE) / CAST(nd AS DOUBLE)"
        " - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
        " * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))"
        " / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))"
    )
    return f"""
WITH tok_counts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id, UNNEST(str_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY 1, 2),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
top AS (
  SELECT tok, df FROM (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rk
    FROM tok_counts GROUP BY tok)
  WHERE rk <= {_BURST_TOP}),
suff AS (
  SELECT t.tok, t.df,
         CAST(SUM(c.c) AS BIGINT) AS s,
         CAST(SUM(c.c * c.c) AS BIGINT) AS ss
  FROM tok_counts c JOIN top t ON c.tok = t.tok
  GROUP BY 1, 2)
SELECT tok, df, s, round({vmr}, 6) AS burstiness
FROM suff CROSS JOIN nd
ORDER BY burstiness DESC, tok ASC
"""


QUERIES["text_token_burstiness"] = text_token_burstiness
ORACLE["text_token_burstiness"] = _burstiness_sql()
