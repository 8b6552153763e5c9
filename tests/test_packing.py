"""Sequence packing (operators/packing.py): offsets/bins must match the
single-stream concat-and-chunk contract regardless of bucket boundaries."""

from __future__ import annotations

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
