"""doc_id-bucketed token storage: the cluster-scale layout where per-doc
groupBys/joins read the bucket spec instead of shuffling the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from next_plaid_spark.encoding import clustered_token_corpus
from next_plaid_spark.plans.builder import IndexBuilder
from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_tokens_skip_the_per_doc_shuffle(spark, tmp_path):
    toks, _ = clustered_token_corpus(
        spark, n_docs=200, tokens_per_doc=4, dim=8, n_clusters=16, seed=3
    )
    plain = IndexBuilder(spark, k=16).build(toks, str(tmp_path / "plain"))
    bidx = IndexBuilder(spark, k=16, bucket_tokens=8).build(
        toks, str(tmp_path / "bucketed")
    )
    agg = lambda idx: idx.tokens.groupBy("doc_id").agg(  # noqa: E731
        F.count("*").alias("n")
    )
    assert "Exchange" in _plan(agg(plain))
    # the bucket spec satisfies the groupBy's required distribution
    assert "Exchange" not in _plan(agg(bidx))
    assert bidx.meta.bucket_table and bidx.meta.n_buckets == 8

    # identical search results on both layouts
    qt = toks.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("query_id"), "token_idx", "vec"
    )
    p = SearchParams(top_k=5)
    a = sorted(tuple(r) for r in BatchSearcher(plain, p).search(qt).collect())
    b = sorted(tuple(r) for r in BatchSearcher(bidx, p).search(qt).collect())
    assert a == b


def test_bucketed_index_reloads_without_catalog(spark, tmp_path):
    """A session whose catalog lost the table (fresh cluster) must still
    read the bucketed FILES as plain parquet."""
    from next_plaid_spark.sources.index_store import PlaidIndex

    toks, _ = clustered_token_corpus(
        spark, n_docs=100, tokens_per_doc=3, dim=8, n_clusters=8, seed=4
    )
    bidx = IndexBuilder(spark, k=8, bucket_tokens=4).build(
        toks, str(tmp_path / "b2")
    )
    n = bidx.tokens.count()
    spark.sql(f"DROP TABLE IF EXISTS {bidx.meta.bucket_table}")
    reloaded = PlaidIndex.load(spark, str(tmp_path / "b2"))
    assert reloaded.tokens.count() == n
    # and the fallback plan is a plain parquet scan (shuffle returns)
    assert "Exchange" in _plan(
        reloaded.tokens.groupBy("doc_id").agg(F.count("*"))
    )


def test_inplace_plain_rebuild_clears_stale_bucketed_dir(spark, tmp_path):
    """Rebuilding an index IN PLACE with bucket_tokens=None after a
    bucketed build must serve the NEW corpus — a leftover tokens_bucketed/
    directory (or catalog table) from the old build must neither shadow
    the fresh tokens/ nor survive on disk."""
    import os

    from next_plaid_spark.sources.index_store import PlaidIndex

    path = str(tmp_path / "same")
    toks_old, _ = clustered_token_corpus(
        spark, n_docs=60, tokens_per_doc=3, dim=8, n_clusters=8, seed=5
    )
    IndexBuilder(spark, k=8, bucket_tokens=4).build(toks_old, path)
    assert os.path.isdir(os.path.join(path, "tokens_bucketed"))

    toks_new, _ = clustered_token_corpus(
        spark, n_docs=90, tokens_per_doc=3, dim=8, n_clusters=8, seed=6
    )
    idx2 = IndexBuilder(spark, k=8).build(toks_new, path)
    assert idx2.meta.bucket_table is None
    assert not os.path.isdir(os.path.join(path, "tokens_bucketed"))
    assert idx2.tokens.select("doc_id").distinct().count() == 90
    # a cold reload (fresh metadata) must agree too
    assert PlaidIndex.load(spark, path).tokens.select(
        "doc_id").distinct().count() == 90


def test_update_and_delete_preserve_bucketed_layout(spark, tmp_path):
    """Append/delete snapshots of a bucketed index stay bucketed (the
    layout is the search contract, not a per-snapshot accident), and the
    results match the unbucketed twin."""
    from next_plaid_spark.operators.update import (
        delete_from_index,
        update_index,
    )

    toks, _ = clustered_token_corpus(
        spark, n_docs=120, tokens_per_doc=4, dim=8, n_clusters=8, seed=9
    )
    old = toks.filter(F.col("doc_id") < 100)
    new = toks.filter(F.col("doc_id") >= 100)
    bidx = IndexBuilder(spark, k=8, bucket_tokens=4).build(
        old, str(tmp_path / "b0")
    )
    b1 = update_index(spark, bidx, new, str(tmp_path / "b1"))
    assert b1.meta.bucket_table and b1.meta.n_buckets == 4
    b2 = delete_from_index(spark, b1, [0, 1, 2], str(tmp_path / "b2"))
    assert b2.meta.bucket_table and b2.meta.n_buckets == 4
    # shuffle-free per-doc groupBy still holds on the updated snapshot
    assert "Exchange" not in _plan(
        b2.tokens.groupBy("doc_id").agg(F.count("*").alias("n"))
    )
    # and the unbucketed twin produces identical search results
    pidx = IndexBuilder(spark, k=8).build(old, str(tmp_path / "p0"))
    p1 = update_index(spark, pidx, new, str(tmp_path / "p1"))
    p2 = delete_from_index(spark, p1, [0, 1, 2], str(tmp_path / "p2"))
    qt = toks.filter(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("query_id"), "token_idx", "vec"
    )
    prm = SearchParams(top_k=5)
    a = sorted(tuple(r) for r in BatchSearcher(b2, prm).search(qt).collect())
    b = sorted(tuple(r) for r in BatchSearcher(p2, prm).search(qt).collect())
    assert a == b
