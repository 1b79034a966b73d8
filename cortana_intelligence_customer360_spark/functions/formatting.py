"""Locale/formatting scalar functions (SURVEY.md §2.12, round 8).

Covers the presentation-layer builtins a reporting workload leans on,
none previously surfaced as ops: ``format_number`` (grouped display
strings, HALF_EVEN), ``bround``/``rint`` (banker's rounding vs
``round``'s HALF_UP — the difference that matters for money), the
``sentences()`` BreakIterator tokenizer, and the ``stack``/``inline``
row generators (the SQL-native unpivot forms; fn_explode covers
posexplode, agg_unpivot covers the DataFrame unpivot).

Cross-engine notes (all corpus-verified, not assumed):

- Money columns in the testdata are exact 2-dp doubles (checked:
  round(x,2)==x for every orders/customer/lineitem money value), so
  cents extraction via round(x*100) is exact in both engines and
  format_number's HALF_EVEN only ever decides real .5 ties, which ARE
  binary-representable at 2dp -> both engines see the same tie.
- bround is pinned at 0 digits: N.5 is exactly representable, so
  Spark's BigDecimal-exact HALF_EVEN and DuckDB's round_even agree on
  every tie. At 1 digit the two algorithms (exact decimal expansion
  vs multiply-by-10-then-round) can disagree near ties like 12.35 —
  that hazard is documented here and deliberately avoided.
- Spark's sentences() (java.text.BreakIterator) does NOT break at
  '. ' before a lowercase word but DOES at '.  ' (two spaces) — the
  transform below inserts the two-space form, making the oracle's
  string_split replay exact on this punctuation-free corpus.

Scale: all four ops are map-only over one table (format/bround/stack)
or map + one explode (sentences); no shuffles, whole-stage codegen
end-to-end except sentences' BreakIterator call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def fn_number_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_number at 2 and 0 decimals over order totals (grouped
    thousands, HALF_EVEN at 0dp where real N.50 ties exist), plus the
    parse-back path: strip the grouping, try_to_number, cast double —
    which must reproduce the source value exactly (2-dp corpus)."""
    od = load_table(spark, sf_dir, "orders")
    fmt2 = F.format_number(F.col("o_totalprice"), 2)
    return od.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        fmt2.alias("fmt2"),
        F.format_number(F.col("o_totalprice"), 0).alias("fmt0"),
        F.try_to_number(
            F.replace(fmt2, F.lit(","), F.lit("")), F.lit("999999999.99")
        )
        .cast("double")
        .alias("parsed_back"),
    )


_NUMFMT_SQL = """
WITH c AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(round_even(o_totalprice, 0) AS BIGINT) AS units,
         o_totalprice AS x
  FROM orders)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       format('{:,}', cents // 100) || '.' ||
         lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS fmt2,
       format('{:,}', units) AS fmt0,
       CAST(CAST(x AS DECIMAL(11,2)) AS DOUBLE) AS parsed_back
FROM c
"""

QUERIES["fn_number_format"] = fn_number_format
ORACLE["fn_number_format"] = _NUMFMT_SQL


def fn_bround_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's rounding vs HALF_UP on account balances: bround / rint
    (ties-to-even) against round (ties-away-from-zero), at 0 digits
    where every N.5 tie is binary-exact so the two engines' tie
    decisions are provably aligned (see module docstring). The is_tie
    flag marks the rows where the two modes actually diverge — at 2-dp
    inputs that's every .50 balance, ~1% of rows — so a wrong rounding
    mode flips real cells, not hypothetical ones."""
    cu = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cu.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        bal.alias("c_acctbal"),
        F.bround(bal, 0).alias("bankers"),
        F.rint(bal).alias("rint_even"),
        F.round(bal, 0).alias("half_up"),
        (
            (F.abs(bal * 2 - F.floor(bal * 2).cast("double")) == F.lit(0.0))
            & (F.abs(bal - F.floor(bal).cast("double")) != F.lit(0.0))
        )
        .cast("boolean")
        .alias("is_tie"),
    )


_BROUND_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       c_acctbal,
       round_even(c_acctbal, 0) AS bankers,
       round_even(c_acctbal, 0) AS rint_even,
       round(c_acctbal, 0) AS half_up,
       (abs(c_acctbal * 2 - floor(c_acctbal * 2)) = 0.0
        AND abs(c_acctbal - floor(c_acctbal)) <> 0.0) AS is_tie
FROM customer
"""

QUERIES["fn_bround_even"] = fn_bround_even
ORACLE["fn_bround_even"] = _BROUND_SQL


def fn_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sentences() BreakIterator tokenization: sentence boundaries are
    synthesized by rewriting every ' the ' to '.  ' (period + two
    spaces — the form BreakIterator honors before a lowercase word;
    single-space is corpus-verified NOT to break), then each document
    explodes to (sent_idx, n_words, first_word, last_word) rows.

    Oracle: string_split on the original ' the ' delimiter replays the
    exact segmentation because the corpus is punctuation-free and
    single-spaced (empty segments impossible), with the fn_explode
    LATERAL-range pattern supplying ordinality."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.sentences(F.regexp_replace("text", " the ", ".  "))
    out = docs.select(
        "doc_id", F.posexplode(sents).alias("sent_idx", "words")
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.size("words").cast("long").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.element_at("words", -1).alias("last_word"),
    )


_SENTENCES_SQL = """
WITH seg AS (
  SELECT d.doc_id, CAST(r.i AS BIGINT) AS sent_idx,
         str_split(d.l[r.i + 1], ' ') AS words
  FROM (SELECT doc_id, str_split(text, ' the ') AS l FROM documents) d,
       LATERAL (SELECT UNNEST(range(len(d.l))) AS i) r)
SELECT CAST(doc_id AS BIGINT) AS doc_id, sent_idx,
       CAST(len(words) AS BIGINT) AS n_words,
       words[1] AS first_word,
       words[len(words)] AS last_word
FROM seg
"""

QUERIES["fn_sentences"] = fn_sentences
ORACLE["fn_sentences"] = _SENTENCES_SQL


def fn_stack_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL row-generator pair: stack(n, k1, v1, ...) unpivots three
    lineitem measures, inline(array(struct...)) emits two more rows
    per line from an inline struct array — together the long-format
    metric table every melt/tidy step compiles to. Both are generator
    expressions (no shuffle, no UDF); the union is read-side only."""
    li = load_table(spark, sf_dir, "lineitem").where("l_orderkey % 9 = 0")
    li.createOrReplaceTempView("stack_lineitem")
    stacked = spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               stack(3, 'qty', l_quantity, 'price', l_extendedprice,
                        'disc', l_discount) AS (metric, val)
        FROM stack_lineitem
        """
    )
    inlined = spark.sql(
        """
        SELECT l_orderkey, l_linenumber, inl.metric, inl.val
        FROM stack_lineitem
        LATERAL VIEW inline(array(
          struct('tax' AS metric, l_tax AS val),
          struct('ship_year' AS metric,
                 CAST(year(l_shipdate) AS DOUBLE) AS val))) inl
        """
    )
    return (
        stacked.unionAll(inlined)
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "metric",
            "val",
        )
    )


_STACK_SQL = """
WITH src AS (SELECT * FROM lineitem WHERE l_orderkey % 9 = 0)
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       m.metric,
       CASE m.metric WHEN 'qty' THEN l_quantity
                     WHEN 'price' THEN l_extendedprice
                     WHEN 'disc' THEN l_discount
                     WHEN 'tax' THEN l_tax
                     ELSE CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS DOUBLE)
       END AS val
FROM src, (VALUES ('qty'), ('price'), ('disc'), ('tax'), ('ship_year'))
       AS m(metric)
"""

QUERIES["fn_stack_inline"] = fn_stack_inline
ORACLE["fn_stack_inline"] = _STACK_SQL


def fn_utf8_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 UTF-8 validation trio: is_valid_utf8 on clean text
    (true), on a deliberately corrupted byte stream (0xFF prepended to
    the first 8 chars — false), make_valid_utf8 repairing it (0xFF ->
    U+FFFD replacement char), and try_validate_utf8 yielding NULL
    instead of raising. The corruption is constructed per row so the
    oracle can rebuild the expected repaired string from the same
    8-char prefix with chr(65533). Map-only, codegen'd."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 7 = 0")
    prefix = F.substring("text", 1, 8)
    corrupt = F.concat(
        F.lit(b"\xff"), F.encode(prefix, "UTF-8")
    ).cast("string")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.is_valid_utf8("text").alias("clean_ok"),
        F.is_valid_utf8(corrupt).alias("corrupt_ok"),
        F.make_valid_utf8(corrupt).alias("repaired"),
        F.try_validate_utf8(corrupt).isNull().alias("try_is_null"),
    )


_UTF8_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       TRUE AS clean_ok,
       FALSE AS corrupt_ok,
       chr(65533) || substring(text, 1, 8) AS repaired,
       TRUE AS try_is_null
FROM documents WHERE doc_id % 7 = 0
"""

QUERIES["fn_utf8_validation"] = fn_utf8_validation
ORACLE["fn_utf8_validation"] = _UTF8_SQL
