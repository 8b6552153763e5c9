"""Streaming search (streaming/search.py): micro-batched queries through
the funnel must produce the identical rows a batch search produces, and
follow_updates must hot-swap to new snapshots between batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.encoding import encode_documents, encode_queries
from next_plaid_spark.plans.builder import IndexBuilder
from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams
from next_plaid_spark.streaming.search import StreamingSearcher


@pytest.fixture(scope="module")
def served(spark, documents, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ssearch")
    docs = documents.filter(F.col("doc_id") < 120).cache()
    idx = IndexBuilder(spark, nbits=4, seed=42).build(
        encode_documents(docs), str(tmp / "idx" / "v0")
    )
    return tmp, docs, idx


def _query_stream(spark, docs, tmp, n=8, files=2):
    src = str(tmp / "qsrc")
    os.makedirs(src, exist_ok=True)
    q = docs.filter(F.col("doc_id") < n).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    half = n // files
    q.filter(F.col("query_id") < half).coalesce(1).write.mode("overwrite").parquet(f"{src}/p1")
    q.filter(F.col("query_id") >= half).coalesce(1).write.mode("overwrite").parquet(f"{src}/p2")
    return q, (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/p*")
    )


def test_stream_equals_batch(spark, served):
    tmp, docs, idx = served
    q, stream = _query_stream(spark, docs, tmp)
    params = SearchParams(top_k=5, n_full_scores=64)

    srch = StreamingSearcher(spark, idx, params=params)
    sq = srch.attach(stream, str(tmp / "ck1"))
    sq.awaitTermination(300)

    got = {(r.query_id, r.doc_id, r.score, r.rank) for r in srch.results}
    want = {
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in BatchSearcher(idx, params).search(encode_queries(q)).collect()
    }
    assert got == want
    # two micro-batches were delivered
    assert {r.batch_id for r in srch.results} == {0, 1}


def test_parquet_sink_stream_equals_batch_with_midstream_fold(spark, served):
    """Parquet-sink mode driven batch-by-batch: per-batch result dirs,
    a generational fold firing MID-STREAM (vacuum_every=2), and a
    replayed batch must together still reproduce the batch search rows
    exactly (and the replay must rewrite, not append)."""
    tmp, docs, idx = served
    params = SearchParams(top_k=5, n_full_scores=64)
    q = docs.filter(F.col("doc_id") < 9).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    sink = str(tmp / "sink_fold")
    srch = StreamingSearcher(spark, idx, params=params, vacuum_every=2,
                             sink_path=sink)
    splits = [q.filter(F.col("query_id") < 3),
              q.filter((F.col("query_id") >= 3) & (F.col("query_id") < 6)),
              q.filter(F.col("query_id") >= 6)]
    for i, part in enumerate(splits):
        srch.process_batch(part, i)
    # crash-replay of the in-flight batch (the only batch Structured
    # Streaming ever redelivers): its vacuum_every fold re-fires as a
    # no-op (the prior dirs are already one generation) and its result
    # dir is REWRITTEN, not appended
    srch.process_batch(splits[2], 2)

    got = {(r.query_id, r.doc_id, r.score, r.rank)
           for r in srch.results_df().collect()}
    want = {(r.query_id, r.doc_id, r.score, r.rank)
            for r in BatchSearcher(idx, params).search(
                encode_queries(q)).collect()}
    assert got == want
    # the replayed batch REPLACED its rows — total row count is exact,
    # not inflated by a second copy
    assert srch.results_df().count() == len(want)


def test_follow_updates_swaps_snapshot(spark, served, documents):
    """With follow_updates, a version written between batches serves the
    later batch: a query over a doc only present in v1 finds it."""
    from next_plaid_spark.operators.update import update_index
    from next_plaid_spark.streaming.ingest import latest_index

    tmp, docs, idx = served
    root = str(tmp / "idx")
    new_docs = documents.filter(
        (F.col("doc_id") >= 120) & (F.col("doc_id") < 130)
    ).cache()
    update_index(spark, idx, encode_documents(new_docs), os.path.join(root, "v1"))

    srch = StreamingSearcher(
        spark, root=root, params=SearchParams(top_k=5, n_full_scores=64),
        follow_updates=True, subset=new_docs.select("doc_id"),
    )
    # the constructor picked up v1 already (latest); assert the refresh
    # loop also works from an older binding
    srch._index = idx
    srch._searcher = BatchSearcher(idx, srch.params)

    q = new_docs.filter(F.col("doc_id") < 123).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    qsrc = str(tmp / "q2")
    q.coalesce(1).write.mode("overwrite").parquet(qsrc)
    stream = spark.readStream.schema(q.schema).parquet(qsrc)
    sq = srch.attach(stream, str(tmp / "ck2"))
    sq.awaitTermination(300)

    assert srch._index.path == latest_index(spark, root).path
    # subset-restricted serving over v1-only docs: every result doc is a
    # v1 doc (they don't exist in v0 at all), and every query got results
    new_ids = {r.doc_id for r in new_docs.collect()}
    assert srch.results and {r.doc_id for r in srch.results} <= new_ids
    assert {r.query_id for r in srch.results} == {r.query_id for r in q.collect()}
