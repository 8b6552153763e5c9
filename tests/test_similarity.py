"""ANN (LSH) recall vs exact cosine top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from next_plaid_spark.operators.similarity import cosine_topk, lsh_bucket_topk


def test_lsh_recall_vs_exact(spark, embeddings):
    emb = embeddings.cache()
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = lsh_bucket_topk(
        emb, queries, k=10, dim=dim, n_tables=16, n_bits=4, seed=42
    ).collect()
    e, a = {}, {}
    for r in exact:
        e.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx:
        a.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.5, f"LSH recall@10 {mean:.2f}"


def test_lsh_scores_are_exact_for_returned(spark, embeddings):
    """LSH only prunes candidates; returned cos_sim must equal exact cosine."""
    emb = embeddings.cache()
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in cosine_topk(emb, queries, k=500).collect()
    }
    for r in lsh_bucket_topk(
        emb, queries, k=10, dim=dim, n_tables=4, n_bits=6, seed=42
    ).collect():
        assert (r.query_id, r.vec_id) in exact
        assert r.cos_sim == exact[(r.query_id, r.vec_id)]
