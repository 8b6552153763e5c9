"""S4 converter: a synthesized legacy NPY index directory (the reference's
index.rs:400-520 layout, including the fastplaid f16 variant) converts
into a parquet PlaidIndex that searches identically to a natively-written
one."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from next_plaid_spark.operators.codec import CodecArtifacts, _pack_batch
from next_plaid_spark.sources.index_store import IndexMeta, write_index
from next_plaid_spark.sources.legacy_npy import convert_npy_index


@pytest.fixture()
def legacy_dir(tmp_path):
    rng = np.random.default_rng(9)
    k, dim, nbits = 4, 4, 2
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    cutoffs = np.asarray([-0.1, 0.0, 0.1], dtype=np.float32)
    weights = np.asarray([-0.15, -0.05, 0.05, 0.15], dtype=np.float32)

    # two chunks: 3 docs (2,3,1 tokens) + 2 docs (2,2 tokens)
    chunk_doclens = [[2, 3, 1], [2, 2]]
    src = str(tmp_path / "legacy")
    os.makedirs(src)
    np.save(os.path.join(src, "centroids.npy"), centroids.astype(np.float16))
    np.save(os.path.join(src, "bucket_cutoffs.npy"), cutoffs.astype(np.float16))
    np.save(os.path.join(src, "bucket_weights.npy"), weights.astype(np.float16))
    np.save(os.path.join(src, "avg_residual.npy"),
            np.full(dim, 0.05, dtype=np.float16))
    np.save(os.path.join(src, "cluster_threshold.npy"),
            np.asarray([0.3], dtype=np.float32))
    with open(os.path.join(src, "plan.json"), "w") as f:
        json.dump({"nbits": nbits, "num_chunks": 2}, f)

    expected = []   # (doc_id, token_idx, code, residual_bytes)
    doc_base = 0
    total_tokens = 0
    for ci, dl in enumerate(chunk_doclens):
        n_tok = sum(dl)
        codes = rng.integers(0, k, n_tok)
        bucket_idx = rng.integers(0, 1 << nbits, (n_tok, dim))
        res_bytes = _pack_batch(bucket_idx, nbits)
        res_mat = np.frombuffer(
            b"".join(res_bytes), dtype=np.uint8
        ).reshape(n_tok, -1)
        np.save(os.path.join(src, f"{ci}.codes.npy"), codes.astype(np.int64))
        np.save(os.path.join(src, f"{ci}.residuals.npy"), res_mat)
        with open(os.path.join(src, f"doclens.{ci}.json"), "w") as f:
            json.dump(dl, f)
        with open(os.path.join(src, f"{ci}.metadata.json"), "w") as f:
            json.dump({"num_documents": len(dl), "num_embeddings": n_tok,
                       "embedding_offset": total_tokens}, f)
        t = 0
        for di, n in enumerate(dl):
            for j in range(n):
                expected.append(
                    (doc_base + di, j, int(codes[t]), res_bytes[t]))
                t += 1
        doc_base += len(dl)
        total_tokens += n_tok
    n_docs = sum(len(dl) for dl in chunk_doclens)
    with open(os.path.join(src, "metadata.json"), "w") as f:
        json.dump({
            "num_chunks": 2, "nbits": nbits, "num_partitions": k,
            "num_embeddings": total_tokens, "num_documents": n_docs,
            "avg_doclen": total_tokens / n_docs, "embedding_dim": dim,
            "next_plaid_compatible": True,
        }, f)
    return src, expected, centroids, cutoffs, weights, nbits


def test_convert_matches_layout_and_native_search(spark, tmp_path, legacy_dir):
    src, expected, centroids, cutoffs, weights, nbits = legacy_dir

    idx = convert_npy_index(spark, src, str(tmp_path / "converted"))
    assert idx.meta.num_documents == 5 and idx.meta.num_embeddings == 10
    assert idx.meta.k == 4 and idx.meta.nbits == nbits
    # f16 artifacts arrive widened to f32
    assert idx.centroids_np().dtype == np.float32

    got = sorted(
        (r.doc_id, r.token_idx, r.code, bytes(r.residual))
        for r in idx.tokens.collect()
    )
    assert got == sorted(expected)

    # derived IVF: sorted deduped docs per code (index.rs:479-508)
    want_ivf = {}
    for d, _, c, _ in expected:
        want_ivf.setdefault(c, set()).add(d)
    got_ivf = {r.code: list(r.doc_ids) for r in idx.ivf.collect()}
    assert got_ivf == {c: sorted(ds) for c, ds in want_ivf.items()}

    # identical search results vs a natively-written index over the same
    # coded tokens (exact funnel config; converted codec drives decompress)
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams

    native = write_index(
        spark, str(tmp_path / "native"),
        tokens_coded=spark.createDataFrame(
            expected, "doc_id long, token_idx int, code long, residual binary"
        ),
        # the legacy dir stores f16 — the native twin must round the same
        centroids=centroids.astype(np.float16).astype(np.float32),
        meta=IndexMeta(
            k=4, dim=4, nbits=nbits, num_documents=5, num_embeddings=10,
            avg_doclen=2.0,
            codec=CodecArtifacts(
                nbits=nbits,
                bucket_cutoffs=cutoffs.astype(np.float16).astype(np.float32),
                bucket_weights=weights.astype(np.float16).astype(np.float32),
                avg_residual=np.full(4, 0.05, dtype=np.float32),
                cluster_threshold=0.3,
            ),
        ),
    )
    rng = np.random.default_rng(12)
    q = rng.standard_normal((2, 3, 4)).astype(np.float32)
    qt = spark.createDataFrame(
        [(int(i), int(j), q[i, j].tolist())
         for i in range(2) for j in range(3)],
        "query_id long, token_idx int, vec array<float>",
    )
    p = SearchParams(top_k=3, n_ivf_probe=4,
                     centroid_score_threshold=float("-inf"))
    a = sorted(tuple(r) for r in BatchSearcher(idx, p).search(qt).collect())
    b = sorted(tuple(r) for r in BatchSearcher(native, p).search(qt).collect())
    assert a == b and a
