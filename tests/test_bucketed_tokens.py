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


def test_update_index_delta_matches_two_step(spark, tmp_path):
    """The fused bucket-aware delete+append must be value-identical to
    delete_from_index + update_index (tokens, doc_stats, ivf, meta,
    search results), reuse clean buckets by hardlink (inode identity),
    and place every row in the bucket its file name claims — which pins
    the F.hash == bucketBy-placement assumption the dirty-set relies on."""
    import os
    import re

    from next_plaid_spark.operators.update import (
        delete_from_index,
        update_index,
        update_index_delta,
    )

    toks, _ = clustered_token_corpus(
        spark, n_docs=150, tokens_per_doc=4, dim=8, n_clusters=8, seed=11
    )
    old = toks.filter(F.col("doc_id") < 130)
    new = toks.filter(F.col("doc_id") >= 130)
    gone_ids = [0, 1, 2, 7, 55]
    bidx = IndexBuilder(spark, k=8, bucket_tokens=8).build(
        old, str(tmp_path / "b0")
    )
    gone = spark.createDataFrame([(i,) for i in gone_ids], "doc_id long")

    shr = delete_from_index(spark, bidx, gone_ids, str(tmp_path / "del"))
    # buffer_threshold=5 < 20 new docs → BOTH paths exercise centroid
    # expansion (path c), not just plain append
    two = update_index(spark, shr, new, str(tmp_path / "two"),
                       buffer_threshold=5)
    delta = update_index_delta(spark, bidx, gone, new,
                               str(tmp_path / "delta"), buffer_threshold=5)

    assert delta.meta.bucket_table and delta.meta.n_buckets == 8
    assert delta.meta.num_documents == two.meta.num_documents
    assert delta.meta.num_embeddings == two.meta.num_embeddings
    assert delta.meta.k == two.meta.k

    cols = sorted(two.tokens.columns)
    rows = lambda idx: sorted(  # noqa: E731
        tuple(r) for r in idx.tokens.select(*cols).collect())
    assert rows(delta) == rows(two)
    stats = lambda p: sorted(  # noqa: E731
        (r.doc_id, r.num_tokens, tuple(r.codes))
        for r in spark.read.parquet(str(p) + "/doc_stats").collect())
    assert stats(tmp_path / "delta") == stats(tmp_path / "two")
    ivf = lambda p: sorted(  # noqa: E731
        (r.code, tuple(r.doc_ids))
        for r in spark.read.parquet(str(p) + "/ivf").collect())
    assert ivf(tmp_path / "delta") == ivf(tmp_path / "two")

    # clean buckets are hardlinked from the previous snapshot, dirty ones
    # are fresh files; every file's rows hash into its file-name bucket
    bucket_of = lambda fn: int(re.search(r"_(\d+)\.c\d+", fn).group(1))  # noqa: E731
    old_dir = str(tmp_path / "b0" / "tokens_bucketed")
    new_dir = str(tmp_path / "delta" / "tokens_bucketed")
    old_inodes = {bucket_of(f): os.stat(os.path.join(old_dir, f)).st_ino
                  for f in os.listdir(old_dir)
                  if not f.startswith(("_", "."))}
    dirty = {r.b for r in gone.unionByName(new.select("doc_id")).select(
        F.pmod(F.hash("doc_id"), F.lit(8)).alias("b")).distinct().collect()}
    assert dirty and len(dirty) < 8  # the test corpus must leave clean buckets
    seen_clean = 0
    for f in os.listdir(new_dir):
        if f.startswith(("_", ".")):
            continue
        b = bucket_of(f)
        got = {r.b for r in spark.read.parquet(os.path.join(new_dir, f))
               .select(F.pmod(F.hash("doc_id"), F.lit(8)).alias("b"))
               .distinct().collect()}
        assert got <= {b}
        if b not in dirty:
            assert os.stat(os.path.join(new_dir, f)).st_ino == old_inodes[b]
            seen_clean += 1
    assert seen_clean == 8 - len(dirty)

    # end to end: identical search results through the funnel
    qt = toks.filter(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("query_id"), "token_idx", "vec"
    )
    prm = SearchParams(top_k=5)
    a = sorted(tuple(r) for r in BatchSearcher(delta, prm).search(qt).collect())
    b = sorted(tuple(r) for r in BatchSearcher(two, prm).search(qt).collect())
    assert a == b


def test_full_rebuild_path_keeps_bucketed_layout(spark, tmp_path):
    """update_index path (a) (corpus <= rebuild_threshold with raw tokens
    provided) must rebuild a bucketed index BUCKETED — the layout is the
    search contract, not a per-snapshot accident."""
    from next_plaid_spark.operators.update import update_index

    toks, _ = clustered_token_corpus(
        spark, n_docs=60, tokens_per_doc=4, dim=8, n_clusters=8, seed=21
    )
    old = toks.filter(F.col("doc_id") < 50)
    new = toks.filter(F.col("doc_id") >= 50)
    bidx = IndexBuilder(spark, k=8, bucket_tokens=4).build(
        old, str(tmp_path / "b0")
    )
    rebuilt = update_index(spark, bidx, new, str(tmp_path / "b1"),
                           full_rebuild_tokens=old)
    assert rebuilt.meta.num_documents == 60
    assert rebuilt.meta.bucket_table and rebuilt.meta.n_buckets == 4
    assert "Exchange" not in _plan(
        rebuilt.tokens.groupBy("doc_id").agg(F.count("*").alias("n"))
    )
