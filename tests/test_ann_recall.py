"""ANN operating-point measurement on a SELECTIVE clustered corpus.

The sf* text corpora are tie-heavy and non-selective: every probe width
reaches ~every doc, so funnel recall reads 1.0 at n_probe=2 and the
recall/probe trade is unmeasured (VERDICT r5). The clustered synthetic
corpus (encoding.clustered_token_corpus) makes probe width bite; this
gate pins recall@10 >= 0.95 at the reference's default n_probe=8
(search.rs:54-69) against the exact funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from next_plaid_spark.encoding import clustered_token_corpus
from next_plaid_spark.plans.builder import IndexBuilder
from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams


def _recall(truth: dict, got: dict) -> float:
    rec = [len(truth[q] & got.get(q, set())) / max(len(truth[q]), 1)
           for q in truth]
    return sum(rec) / max(len(rec), 1)


def test_clustered_probe8_recall_gate(spark, tmp_path):
    toks, _ = clustered_token_corpus(
        spark, n_docs=400, tokens_per_doc=4, dim=8, n_clusters=48, seed=11
    )
    # fixed k=64 (≈ cluster count) so the cell geometry — and therefore
    # the gate — is stable across corpus-size tweaks
    idx = IndexBuilder(spark, k=64).build(toks, str(tmp_path / "cidx"))
    qt = toks.filter(F.col("doc_id") % 8 == 0).select(
        F.col("doc_id").alias("query_id"), "token_idx", "vec"
    )
    exact = BatchSearcher(idx, SearchParams(
        top_k=10, n_ivf_probe=idx.meta.k,
        n_full_scores=4 * idx.meta.num_documents,
        centroid_score_threshold=float("-inf"),
    ))
    truth: dict = {}
    for r in exact.search(qt).collect():
        truth.setdefault(r.query_id, set()).add(r.doc_id)
    assert truth

    s8 = BatchSearcher(idx, SearchParams(
        top_k=10, n_ivf_probe=8, n_full_scores=256, keep_best_cell=True))
    got8: dict = {}
    for r in s8.search(qt).collect():
        got8.setdefault(r.query_id, set()).add(r.doc_id)
    r8 = _recall(truth, got8)
    assert r8 >= 0.95, f"recall@10 at n_probe=8 = {r8:.4f}"
