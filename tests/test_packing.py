"""Sequence packing (operators/packing.py): offsets/bins must match the
single-stream concat-and-chunk contract regardless of bucket boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from next_plaid_spark.operators.packing import pack_sequences


def _pack(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.start_off, r.bin_start, r.bin_end)
           for r in pack_sequences(df, **kw).collect()}
    return got


def test_pack_offsets_and_spanning(spark):
    # capacity 4: doc0 (3 toks) fills [0,3); doc1 (3 toks) spans bins 0-1;
    # doc2 (6 toks) spans bins 1-2
    got = _pack(spark, [
        (0, "a b c"), (1, "d e f"), (2, "g h i j k l"),
    ], capacity=4)
    assert got[0] == (3, 0, 0, 0)
    assert got[1] == (3, 3, 0, 1)
    assert got[2] == (6, 6, 1, 2)


def test_pack_empty_doc_zero_width(spark):
    got = _pack(spark, [(0, "a b"), (1, ""), (2, "c d")], capacity=2)
    assert got[1] == (0, 2, 1, 1)  # zero tokens at offset 2, zero-width
    assert got[2] == (2, 2, 1, 1)


def test_pack_bucket_boundaries_irrelevant(spark):
    # bucket_size=2 forces several buckets; offsets must be identical to
    # the single-window formulation
    rows = [(i, " ".join(["w"] * (i % 4 + 1))) for i in range(10)]
    a = _pack(spark, rows, capacity=5, bucket_size=2)
    b = _pack(spark, rows, capacity=5, bucket_size=4096)
    assert a == b
    # offsets are the running sum of previous token counts
    off = 0
    for i in range(10):
        n = i % 4 + 1
        assert a[i][0] == n and a[i][1] == off
        off += n


def test_pack_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(df).collect() == []


def test_pack_bins_materialization(spark):
    from next_plaid_spark.operators.packing import pack_bins

    rows = [(0, "a b c"), (1, "d e"), (2, "f g h i")]
    got = {r.bin_id: (r.n_tokens, r.tokens)
           for r in pack_bins(
               spark.createDataFrame(rows, "doc_id long, text string"),
               capacity=4).collect()}
    # stream = a b c d e f g h i → bins [a b c d][e f g h][i]
    assert got == {
        0: (4, ["a", "b", "c", "d"]),
        1: (4, ["e", "f", "g", "h"]),
        2: (1, ["i"]),
    }


def test_chunk_documents_windows(spark):
    """Hand-checked sliding windows: 10 tokens, chunk 4, stride 2 →
    1 + ceil(6/2) = 4 chunks; last chunk reaches the tail."""
    from next_plaid_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))), (1, ""), (2, "solo")],
        "doc_id long, text string",
    )
    rows = sorted(chunk_documents(docs, chunk_tokens=4, stride=2).collect(),
                  key=lambda r: (r.doc_id, r.chunk_id))
    d0 = [r for r in rows if r.doc_id == 0]
    assert [r.chunk_text for r in d0] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9"]
    assert [r.n_tokens for r in d0] == [4, 4, 4, 4]
    assert not [r for r in rows if r.doc_id == 1]  # empty doc → no chunks
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "solo" and d2[0].n_tokens == 1


def test_chunk_documents_coverage_invariant(spark, documents):
    """Every token position of every doc is covered by ≥1 chunk, and
    consecutive chunks overlap by chunk−stride tokens."""
    from next_plaid_spark.operators.corpus import chunk_documents
    from next_plaid_spark.functions.text import tokenize_unicode61

    chunks = chunk_documents(documents, chunk_tokens=24, stride=16)
    per_doc = (chunks.groupBy("doc_id")
               .agg(F.max(F.col("chunk_id") * 16 + F.col("n_tokens")).alias("covered"),
                    F.count("*").alias("nc")))
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokenize_unicode61(F.col("text"))).alias("n"))
    bad = per_doc.join(toks, "doc_id").filter(
        (F.col("covered") < F.col("n")) | (F.col("n") == 0)).count()
    assert bad == 0


def test_chunk_documents_bad_params(spark, documents):
    from next_plaid_spark.operators.corpus import chunk_documents

    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(documents, chunk_tokens=0)
    with _pt.raises(ValueError):
        chunk_documents(documents, stride=-1)


# ---------------------------------------------------------------------------
# T5 span corruption (corpus.span_corrupt)
# ---------------------------------------------------------------------------

def test_span_corrupt_reconstruction_invariant(spark):
    import re

    from next_plaid_spark.operators.corpus import span_corrupt

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 7) % 30)))
         for i in range(20)] + [(100, ""), (101, "single")],
        "doc_id long, text string",
    )
    rows = span_corrupt(docs, mask_rate=0.3, seed=1).collect()
    originals = {r.doc_id: r.text.split() for r in docs.collect() if r.text}
    assert len(rows) == 22

    sent = re.compile(r"^<extra_id_(\d+)>$")
    for r in rows:
        orig = originals.get(r.doc_id, [])
        # parse targets into span lists keyed by sentinel index
        spans, cur = {}, None
        tgt_toks = r.targets.split() if r.targets else []
        for t in tgt_toks:
            m = sent.match(t)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(t)
        if tgt_toks:
            # final sentinel terminates — its span list stays empty
            assert spans[max(spans)] == []
            del spans[max(spans)]
        # splice spans back into inputs → must equal the original tokens
        rebuilt = []
        for t in (r.inputs.split() if r.inputs else []):
            m = sent.match(t)
            rebuilt.extend(spans[int(m.group(1))] if m else [t])
        assert rebuilt == orig, r.doc_id
        assert r.n_masked == sum(len(v) for v in spans.values())


def test_training_shards_roundtrip_and_manifest(spark, tmp_path):
    """write_training_shards: deterministic shard boundaries, a manifest
    whose counts reconcile exactly with the bins, and a lossless
    roundtrip through read_training_shards."""
    import json

    from next_plaid_spark.operators.packing import (
        pack_bins, read_training_shards, write_training_shards)

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(7))) for i in range(40)],
        "doc_id long, text string",
    )
    bins = pack_bins(docs, capacity=16)
    expect = {r.bin_id: (r.n_tokens, r.tokens) for r in bins.collect()}

    out = str(tmp_path / "shards_out")
    manifest = write_training_shards(bins, out, bins_per_shard=4)
    assert manifest["total_bins"] == len(expect)
    assert manifest["total_tokens"] == sum(n for n, _ in expect.values())
    # deterministic boundaries: shard of bin b is b // 4
    for s in manifest["shards"]:
        assert s["first_bin"] // 4 == s["shard_id"]
        assert s["last_bin"] // 4 == s["shard_id"]
    # the file on disk matches the returned dict
    with open(f"{out}/manifest.json") as f:
        assert json.load(f) == manifest

    back = {
        r.bin_id: (r.n_tokens, r.tokens)
        for r in read_training_shards(spark, out).collect()
    }
    assert back == expect
