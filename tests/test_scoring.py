"""Semantic tests for corpus-statistics scoring ops (oracle parity is
automatic in test_oracle_parity; these pin the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.llmops.scoring import (
    _N_SHARDS,
    data_global_shuffle,
    text_bm25_search,
    text_unigram_logprob,
)
from cortana_intelligence_customer360_spark.sources.tables import load_table


def test_unigram_surprisal_bounds(spark, sf_dir):
    out = text_unigram_logprob(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    # every doc scored exactly once, surprisal strictly positive
    assert out.count() == docs.count()
    assert out.where(F.col("avg_surprisal") <= 0).count() == 0
    # surprisal can't exceed ln(total_tokens): p >= 1/N for seen tokens
    import math

    n_total = out.agg(F.sum("n_tokens")).first()[0]
    assert out.where(F.col("avg_surprisal") > math.log(n_total)).count() == 0
    out.unpersist()


def test_bm25_topk_shape_and_term_presence(spark, sf_dir):
    out = text_bm25_search(spark, sf_dir).cache()
    rows = out.orderBy("rank").collect()
    assert 0 < len(rows) <= 10
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["bm25"] > 0 for r in rows)
    # scores non-increasing with rank
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the top hit actually contains at least one query term
    docs = load_table(spark, sf_dir, "documents")
    top_text = docs.where(F.col("doc_id") == rows[0]["doc_id"]).first()["text"]
    assert any(t in top_text.split() for t in ["join", "window", "customer"])
    out.unpersist()


def test_global_shuffle_is_dense_permutation(spark, sf_dir):
    out = data_global_shuffle(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # positions are dense 1..count(shard) within every shard
    per_shard = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per_shard.where(
        (F.col("mx") != F.col("n")) | (F.col("mn") != 1)
    ).count() == 0
    # all shards used (md5 spreads keys) and rerun is identical
    assert per_shard.count() == _N_SHARDS
    again = data_global_shuffle(spark, sf_dir)
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_epoch_shuffle_permutations_differ_and_balance(spark, sf_dir):
    """Each epoch is a different deterministic permutation (shard+pos
    assignments differ between epochs for a non-trivial fraction of
    docs) and every epoch's shards stay hash-balanced."""
    from cortana_intelligence_customer360_spark.llmops.scoring import (
        _N_EPOCHS,
        _N_SHARDS,
        data_epoch_shuffle,
    )

    rows = data_epoch_shuffle(spark, sf_dir).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = (r["shard"], r["pos"])
    assert set(by_epoch) == set(range(_N_EPOCHS))
    n_docs = len(by_epoch[0])
    assert all(len(v) == n_docs for v in by_epoch.values())
    moved = sum(1 for d in by_epoch[0] if by_epoch[0][d] != by_epoch[1][d])
    assert moved > n_docs // 2  # different permutation, not a re-label
    for e, v in by_epoch.items():
        sizes = [0] * _N_SHARDS
        for s, _ in v.values():
            sizes[s] += 1
        assert min(sizes) > 0 and max(sizes) < 2 * (n_docs // _N_SHARDS + 1)
