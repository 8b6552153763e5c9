"""MaxScore prune (r12): pruned search must be IDENTICAL to exhaustive —
same docs, same rounded scores, same ranks — while actually cutting the
common-term postings out of the aggregation for selective queries.

The prune is opt-in (``prune=True`` or SPARK_GRAFT_BM25_PRUNE=1) and
top-k-preserving by construction: candidates are certified by per-term
upper bounds against a θ that lower-bounds the true k-th score (see
``BM25Index._maxscore_candidates``). These tests pin the parity on a
corpus engineered so the prune ENGAGES (skewed df: a few rare terms, many
flooded ones), on a seeded random corpus, and across the fallback edges
(conjunctive, subset, hand-built index without max_sat, tiny k/corpus).
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.bm25 import BM25Index

DOC_SCHEMA = "doc_id long, text string"
Q_SCHEMA = "query_id long, text string"


def _rows(df):
    return sorted(
        (r.query_id, r.doc_id, r.score, r.rank) for r in df.collect())


@pytest.fixture(scope="module")
def skewed(spark):
    """200 docs flooded with common terms; 3 docs carry a rare term."""
    docs = []
    for i in range(200):
        text = "common1 common2 common3 filler pad"
        if i in (7, 45, 133):
            text += " rareterm special"
        if i % 3 == 0:
            text += " common1 common2"   # tf variety
        docs.append((i, text))
    return BM25Index.build(
        spark.createDataFrame(docs, DOC_SCHEMA))


def test_prune_engages_and_matches_exhaustive(spark, skewed):
    queries = spark.createDataFrame(
        [(0, "rareterm common1 common2 common3"),
         (1, "special filler common2")], Q_SCHEMA)
    base = _rows(skewed.search(queries, k=2, prune=False))
    got = _rows(skewed.search(queries, k=2, prune=True))
    assert got == base
    lp = skewed._last_prune
    assert lp["engaged"] is True
    # the flooded terms were cut for at least one query
    assert any(lp["essential_terms"][q] < lp["total_terms"][q]
               for q in lp["essential_terms"])


def test_prune_matches_on_fts5_mode(spark, skewed):
    queries = spark.createDataFrame(
        [(0, "rareterm common1 common3")], Q_SCHEMA)
    base = _rows(skewed.search(queries, k=3, score_mode="fts5", prune=False))
    got = _rows(skewed.search(queries, k=3, score_mode="fts5", prune=True))
    assert got == base


def test_prune_respects_subset(spark, skewed):
    queries = spark.createDataFrame(
        [(0, "rareterm common1 common2")], Q_SCHEMA)
    subset = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    base = _rows(skewed.search(queries, k=5, subset=subset, prune=False))
    got = _rows(skewed.search(queries, k=5, subset=subset, prune=True))
    assert got == base
    # docs 7 and 45 are inside the subset, 133 outside
    assert {d for _, d, _, _ in got} <= set(range(100))


def test_prune_random_corpus_parity(spark):
    """Seeded zipf-ish corpus, many queries: bit-identical output."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    weights = [1.0 / (i + 1) for i in range(60)]
    docs = [
        (i, " ".join(rng.choices(vocab, weights=weights,
                                 k=rng.randint(5, 30))))
        for i in range(300)
    ]
    idx = BM25Index.build(spark.createDataFrame(docs, DOC_SCHEMA))
    queries = [
        (q, " ".join(rng.choices(vocab, weights=weights,
                                 k=rng.randint(2, 6))))
        for q in range(15)
    ]
    qdf = spark.createDataFrame(queries, Q_SCHEMA)
    for mode in ("okapi", "fts5"):
        base = _rows(idx.search(qdf, k=10, score_mode=mode, prune=False))
        got = _rows(idx.search(qdf, k=10, score_mode=mode, prune=True))
        assert got == base, mode


def test_conjunctive_falls_back(spark, skewed):
    queries = spark.createDataFrame(
        [(0, "rareterm common1")], Q_SCHEMA)
    base = _rows(skewed.search(queries, k=3, conjunctive=True, prune=False))
    got = _rows(skewed.search(queries, k=3, conjunctive=True, prune=True))
    assert got == base


def test_handbuilt_index_without_max_sat_falls_back(spark, skewed):
    legacy = BM25Index(skewed.postings, skewed.doclens, skewed.n_docs,
                       skewed.avgdl, skewed.tokenizer)
    queries = spark.createDataFrame(
        [(0, "rareterm common1 common2")], Q_SCHEMA)
    base = _rows(legacy.search(queries, k=2, prune=False))
    got = _rows(legacy.search(queries, k=2, prune=True))   # silent fallback
    assert got == base


def test_save_load_carries_max_sat(spark, skewed, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bm25prune")
    skewed.save(str(tmp / "idx"))
    loaded = BM25Index.load(spark, str(tmp / "idx"))
    assert "max_sat" in loaded.term_stats.columns
    queries = spark.createDataFrame(
        [(0, "rareterm common2 common3")], Q_SCHEMA)
    base = _rows(loaded.search(queries, k=2, prune=False))
    got = _rows(loaded.search(queries, k=2, prune=True))
    assert got == base
    assert loaded._last_prune["engaged"] is True


def test_handbuilt_save_derives_max_sat(spark, skewed, tmp_path_factory):
    """The incremental-merge path constructs BM25Index(term_stats=None);
    save() must derive max_sat with the MERGED avgdl so a loaded updated
    index prunes too."""
    tmp = tmp_path_factory.mktemp("bm25prunederive")
    legacy = BM25Index(skewed.postings, skewed.doclens, skewed.n_docs,
                       skewed.avgdl, skewed.tokenizer)
    legacy.save(str(tmp / "idx"))
    loaded = BM25Index.load(spark, str(tmp / "idx"))
    assert "max_sat" in loaded.term_stats.columns
    # derived bound equals the lazily-derived in-memory bound (same
    # corpus, same avgdl); order-independent: force the derivation here
    assert skewed._ensure_max_sat()
    a = {(r.term, round(r.max_sat, 12))
         for r in loaded.term_stats.collect()}
    b = {(r.term, round(r.max_sat, 12))
         for r in skewed.term_stats.collect()}
    assert a == b


def test_k_exceeds_matches(spark, skewed):
    queries = spark.createDataFrame([(0, "rareterm")], Q_SCHEMA)
    base = _rows(skewed.search(queries, k=50, prune=False))
    got = _rows(skewed.search(queries, k=50, prune=True))
    assert got == base and len(got) == 3


def test_query_cap_falls_back(spark, skewed, monkeypatch):
    """r13: above _PRUNE_QUERY_CAP distinct queries the prune's
    driver-side per-query bookkeeping is skipped (exhaustive fallback),
    mirroring _PRUNE_CAND_CAP on the candidate side. Env override is the
    test seam: cap=2, three queries -> fallback; cap high -> engages."""
    queries = spark.createDataFrame(
        [(0, "rareterm common1 common2"),
         (1, "special common3"),
         (2, "rareterm filler common1")], Q_SCHEMA)
    base = _rows(skewed.search(queries, k=2, prune=False))

    monkeypatch.setenv("SPARK_GRAFT_BM25_PRUNE_QUERY_CAP", "2")
    skewed._last_prune = {"engaged": None}
    got = _rows(skewed.search(queries, k=2, prune=True))
    assert got == base
    assert skewed._last_prune == {"engaged": None}  # prune never ran

    monkeypatch.setenv("SPARK_GRAFT_BM25_PRUNE_QUERY_CAP", "100")
    got = _rows(skewed.search(queries, k=2, prune=True))
    assert got == base
    assert skewed._last_prune["engaged"] is True


def test_in_place_resave_instance_stays_usable(spark, tmp_path_factory):
    """r13 (ADVICE): after a LOADED index re-saves onto its own load
    path, the SAME instance keeps working — save() re-points its frames
    at the swapped-in store (the pre-swap part files are gone). Also pins
    the swap hygiene: no staging or .old debris left next to the store."""
    import os

    tmp = tmp_path_factory.mktemp("bm25repoint")
    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry apple"),
         (2, "durian banana"), (3, "cherry cherry")], DOC_SCHEMA)
    BM25Index.build(docs).save(str(tmp / "idx"))

    loaded = BM25Index.load(spark, str(tmp / "idx"))
    q = spark.createDataFrame([(0, "apple cherry")], Q_SCHEMA)
    base = _rows(loaded.search(q, k=4, prune=False))

    loaded.save(str(tmp / "idx"))          # in-place re-save
    assert _rows(loaded.search(q, k=4, prune=False)) == base  # still live
    assert _rows(loaded.search(q, k=4, prune=True)) == base

    debris = [d for d in os.listdir(tmp)
              if ".tmp-save" in d or ".old-" in d]
    assert debris == []


def test_save_in_place_is_safe(spark, tmp_path_factory):
    """Re-saving a LOADED index onto its own path (the in-place max_sat
    upgrade) must not self-destruct: save() stages to a temp dir and
    swaps, because a direct overwrite deletes the parquet files the
    index's own lazy plans still read."""
    tmp = tmp_path_factory.mktemp("bm25inplace")
    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry apple"),
         (2, "durian banana"), (3, "cherry cherry")], DOC_SCHEMA)
    idx = BM25Index.build(docs)
    path = str(tmp / "idx")
    idx.save(path)

    loaded = BM25Index.load(spark, path)
    legacy = BM25Index(loaded.postings, loaded.doclens, loaded.n_docs,
                       loaded.avgdl, loaded.tokenizer)  # no stats at all
    legacy.save(path)  # in-place upgrade derives term_stats + max_sat

    upgraded = BM25Index.load(spark, path)
    assert "max_sat" in upgraded.term_stats.columns
    q = spark.createDataFrame([(0, "apple cherry")], Q_SCHEMA)
    base = _rows(idx.search(q, k=4, prune=False))
    assert _rows(upgraded.search(q, k=4, prune=False)) == base
    assert _rows(upgraded.search(q, k=4, prune=True)) == base
