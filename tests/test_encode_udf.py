"""Model-backed encoder seam: contract tests + token-less funnel e2e.

The funnel test is the P5 gate from SURVEY.md §2: with a model-backed
encoder the token DFs carry no ``token`` string column, so the searcher's
non-vocab code paths (_probe per-row GEMM, relational MaxSim, rerank
without vocab-CSE) are the ones exercised.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.encode_udf import (
    DeterministicFakeColbert,
    EncoderConfig,
    encode_documents_with_model,
    encode_queries_with_model,
)

CFG = EncoderConfig(query_length=16, document_length=48, embedding_dim=16)


@pytest.fixture(scope="module")
def model():
    return DeterministicFakeColbert(CFG)


def test_fake_model_query_expansion(model):
    mats = model(["hello world", "a"], is_query=True)
    # expansion pads every query to exactly query_length positions
    assert all(m.shape == (CFG.query_length, CFG.embedding_dim) for m in mats)
    # prefix row identical across queries, MASK rows differ by position
    assert np.allclose(mats[0][0], mats[1][0])
    assert not np.allclose(mats[1][-1], mats[1][-2])
    # unit-norm rows
    assert np.allclose(np.linalg.norm(mats[0], axis=1), 1.0)


def test_fake_model_document_skiplist(model):
    (with_punct,) = model(["hello, world!"], is_query=False)
    (without,) = model(["hello world"], is_query=False)
    # skiplist drops the punctuation embeddings → same output either way
    assert with_punct.shape == without.shape
    assert np.allclose(with_punct, without)
    # no expansion for documents: [D] + 2 tokens
    assert without.shape[0] == 3
    # all-punctuation doc degrades to the prefix vector, not zero rows
    (only_punct,) = model(["?!."], is_query=False)
    assert only_punct.shape[0] == 1


def test_fake_model_no_expansion_mode():
    m = DeterministicFakeColbert(
        EncoderConfig(query_length=16, embedding_dim=16, do_query_expansion=False)
    )
    (mat,) = m(["hello world"], is_query=True)
    assert mat.shape == (3, 16)  # [Q] + 2 tokens, no MASK pad


def test_encode_with_model_schema_and_determinism(spark, documents, model):
    dt = encode_documents_with_model(documents.limit(10), model, batch_size=4)
    assert dt.columns == ["doc_id", "token_idx", "vec"]
    rows1 = sorted(dt.collect(), key=lambda r: (r.doc_id, r.token_idx))
    rows2 = sorted(dt.collect(), key=lambda r: (r.doc_id, r.token_idx))
    assert [(r.doc_id, r.token_idx, tuple(r.vec)) for r in rows1] == [
        (r.doc_id, r.token_idx, tuple(r.vec)) for r in rows2
    ]
    # doc rows are content-length, not padded
    lens = {r.doc_id: 0 for r in rows1}
    for r in rows1:
        lens[r.doc_id] = max(lens[r.doc_id], r.token_idx + 1)
    assert min(lens.values()) >= 1 and max(lens.values()) <= CFG.document_length


def test_model_factory_cached_per_worker(spark, documents):
    calls = {"n": 0}

    def factory():
        calls["n"] += 1  # driver-side copy; worker copies mutate their own
        return DeterministicFakeColbert(CFG)

    dt = encode_documents_with_model(
        documents.limit(5), factory, model_key="test-fake", batch_size=2
    )
    assert dt.count() > 0
    assert calls["n"] == 0  # factory only runs inside workers, never on driver


def test_funnel_tokenless_end_to_end(spark, documents, model, tmp_path_factory):
    """Build + search entirely through the model seam (no token column);
    funnel results must track exact brute-force MaxSim on the same DFs."""
    import math

    from next_plaid_spark.operators.maxsim import brute_force_search
    from next_plaid_spark.plans.builder import IndexBuilder
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams

    docs = documents.limit(150)
    dt = encode_documents_with_model(docs, model).cache()
    assert "token" not in dt.columns
    path = str(tmp_path_factory.mktemp("model_index"))
    idx = IndexBuilder(spark, nbits=4, seed=42).build(dt, path)

    queries = docs.limit(10).select(F.col("doc_id").alias("query_id"), "text")
    qt = encode_queries_with_model(queries, model).cache()
    assert "token" not in qt.columns

    oracle = brute_force_search(qt, dt, k=10).collect()
    got = BatchSearcher(idx, SearchParams(top_k=10, n_full_scores=256)).search(qt).collect()
    assert len(got) > 0

    oracle_by_q, got_by_q = {}, {}
    for r in oracle:
        oracle_by_q.setdefault(r.query_id, set()).add(r.doc_id)
    for r in got:
        got_by_q.setdefault(r.query_id, set()).add(r.doc_id)
    recalls = [
        len(oracle_by_q[q] & got_by_q.get(q, set())) / len(oracle_by_q[q])
        for q in oracle_by_q
    ]
    assert np.mean(recalls) >= 0.6, f"mean recall@10 {np.mean(recalls):.3f}"

    oracle_top1 = {r.query_id: r.score for r in oracle if r.rank == 1}
    got_top1 = {r.query_id: r.score for r in got if r.rank == 1}
    close = [
        math.isclose(oracle_top1[q], got_top1.get(q, -1), rel_tol=0.05)
        for q in oracle_top1
    ]
    assert np.mean(close) >= 0.8, f"top-1 agreement {np.mean(close):.2f}"
