"""End-to-end integration: the reference solution's three paths
(SURVEY.md §3.1) chained on this engine in one test -

  1. ingest: events parquet as a stream, foreachBatch-merged into an
     activity profile sink (Event Hub -> ASA -> blob archival),
  2. feature/ETL: the wide Customer-360 profile built batch-side and
     enriched with the streamed activity (ADF -> HDInsight Hive/Spark),
  3. score/serve: seeded RandomForest scoring every profile row,
     written to a parquet 'warehouse' and read back (batch scoring ->
     SQL DW -> Power BI).

Asserts row accounting and schema at each seam - the integration
surface the per-operator oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.features.core import profile_frame
from cortana_intelligence_customer360_spark.features.ml import (
    _label_frame,
    build_scoring_pipeline,
)
from cortana_intelligence_customer360_spark.sources.tables import load_table
from cortana_intelligence_customer360_spark.streaming.ops import stream_foreachbatch_sink


def test_full_customer360_pipeline(spark, sf_dir, tmp_path):
    # --- path 1: streamed activity profile (foreachBatch upsert) ---
    activity = stream_foreachbatch_sink(spark, sf_dir)
    n_active_users = activity.count()
    assert n_active_users > 0
    assert set(activity.columns) == {"user_id", "n_events", "sum_value"}

    # --- path 2: batch feature table enriched with streamed activity ---
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    profile = profile_frame(customer, orders, events, nation)
    enriched = profile.join(
        activity, profile.c_custkey == activity.user_id, "left"
    ).drop("user_id")
    assert enriched.count() == customer.count()  # spine preserved
    # streamed totals agree with the batch pivot counts
    mismatch = enriched.where(
        F.col("n_events").isNotNull()
        & (
            F.col("n_events")
            != F.col("n_click") + F.col("n_error") + F.col("n_purchase")
            + F.col("n_signup") + F.col("n_view")
        )
    ).count()
    assert mismatch == 0

    # --- path 3: train, score, serve ---
    labels = _label_frame(events)
    train = profile.join(labels, profile.c_custkey == labels.user_id)
    model = build_scoring_pipeline().fit(train)
    scored = model.transform(profile.withColumn("label_type", F.lit("click")))
    out = str(tmp_path / "warehouse")
    scored.select("c_custkey", "c_mktsegment", "prediction").write.mode(
        "overwrite"
    ).parquet(out)
    served = spark.read.parquet(out)
    assert served.count() == customer.count()
    assert served.where(F.col("prediction").isNull()).count() == 0


def test_source_mixture_budget_within_one_doc(spark, sf_dir):
    """Each source's admitted tokens reach its budget and overshoot by
    less than one document (the crossing doc is included), unless the
    source ran out of docs; the selection is deterministic across runs
    (same checksum)."""
    import duckdb

    from cortana_intelligence_customer360_spark.llmops.pipeline import (
        data_source_mixture,
    )

    rows = {r["source"]: r.asDict() for r in
            data_source_mixture(spark, sf_dir).collect()}
    con = duckdb.connect()
    truth = {
        s: (int(n), int(t))
        for s, n, t in con.execute(
            f"SELECT source, COUNT(*), SUM(len(str_split(text, ' ')))"
            f" FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY 1"
        ).fetchall()
    }
    assert set(rows) == set(truth)
    for s, r in rows.items():
        n_all, toks_all = truth[s]
        if r["n_docs"] == n_all:
            # source exhausted before (or exactly at) its budget
            assert r["tokens_kept"] == toks_all
        else:
            assert r["tokens_kept"] > r["token_budget"] - 1
            # overshoot bounded by the largest possible single doc
            assert r["tokens_kept"] - (r["token_budget"] + 1) < toks_all
    again = {r["source"]: r["sel_checksum"] for r in
             data_source_mixture(spark, sf_dir).collect()}
    assert again == {s: r["sel_checksum"] for s, r in rows.items()}


def test_cdc_chunks_survive_prefix_edit(spark):
    """The CDC property fixed-size windows lack: prepending text to a
    document changes at most the chunks up to the first boundary after
    the edit — every later chunk keeps its exact fingerprint, so an
    edited near-copy still shares most chunk fps with the original."""
    from cortana_intelligence_customer360_spark.llmops.pipeline import (
        cdc_chunk_frame,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten")
    edited = "INserted PREfix tokens " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunk_frame(docs).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    shared = fps[1] & fps[2]
    n1 = len(fps[1])
    # all but the first chunk (plus possible fp-dup collisions) shared
    assert len(shared) >= n1 - 2, (n1, len(shared))
    assert fps[1] != fps[2]


def test_bpe_encode_roundtrip_with_token_count(spark, sf_dir):
    """BPE-encode invariants vs the trainer and text_token_count:
    n_words agrees with the whitespace tokenization (modulo empty
    tokens), char-token count is exactly sum(len(word)), and the two
    learned merges save exactly (occurrences of merged pairs) tokens:
    n_bpe_tokens = n_char_tokens - savings, with savings > 0 somewhere
    and n_bpe_tokens >= n_words (a token is at least one symbol)."""
    from cortana_intelligence_customer360_spark.llmops.text import (
        text_bpe_encode,
        text_bpe_train_rounds,
        text_token_count,
    )
    from cortana_intelligence_customer360_spark.sources.tables import load_table

    enc = {r.doc_id: r for r in text_bpe_encode(spark, sf_dir).collect()}
    tc = {r.doc_id: r for r in text_token_count(spark, sf_dir).collect()}
    rounds = {r.round: r for r in text_bpe_train_rounds(spark, sf_dir).collect()}
    assert set(rounds) == {1, 2}

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert set(enc) <= set(tc)
    saved_total = 0
    for did, e in enc.items():
        words = [w for w in docs[did].split(" ") if w]
        assert e.n_words == len(words)
        assert e.n_char_tokens == sum(len(w) for w in words)
        assert e.n_words <= e.n_bpe_tokens <= e.n_char_tokens
        saved_total += e.n_char_tokens - e.n_bpe_tokens
    assert saved_total > 0, "fixture must exercise at least one merge"
    # Re-apply the trainer's merges per word in pure Python and compare
    # the corpus-wide token saving exactly.
    m1, m2 = rounds[1].pair, rounds[2].pair

    def n_tok(word):
        s = " ".join(word)
        for pair in (m1, m2):
            repl = " " + pair.replace(" ", "") + " "
            s = " " + s + " "
            s = s.replace(" " + pair + " ", repl).replace(" " + pair + " ", repl)
            s = s.strip()
        return len(s.split(" "))

    brute = sum(
        sum(len(w) - n_tok(w) for w in docs[did].split(" ") if w)
        for did in enc
    )
    assert brute == saved_total
