"""S4: legacy NPY index converter — fastplaid / next-plaid → parquet index.

The reference persists an index as an NPY artifact directory
(next-plaid/src/index.rs:400-520):

    centroids.npy                 [K, dim]  f32 (f16 in fastplaid indexes)
    bucket_cutoffs.npy / bucket_weights.npy / avg_residual.npy /
    cluster_threshold.npy         codec artifacts
    plan.json / metadata.json     {nbits, num_chunks, counts, …}
    {i}.codes.npy                 per-chunk token→centroid codes (1-D)
    {i}.residuals.npy             per-chunk packed residuals [n_tok, bytes]
    doclens.{i}.json              per-chunk per-doc token counts
    {i}.metadata.json             chunk doc/embedding counts + offset
    ivf.npy / ivf_lengths.npy     inverted file (derived data)

``convert_npy_index`` reads that layout into this repo's parquet index:
small artifacts load driver-side (bounded: centroids + codec + json);
the corpus-sized per-chunk codes/residuals are read INSIDE Spark tasks —
one task per legacy chunk via ``mapInPandas`` over a chunk-descriptor
DataFrame — so a 1000-chunk corpus converts with 1000-way parallelism and
nothing corpus-sized ever crosses the driver. The packed residual BYTES
carry over untouched (the repo's quantizer writes the reference's exact
big-endian nbits packing — codec.rs:356-411 parity, test_pack_unpack)
and the IVF/doc_stats tables are re-derived by ``write_index`` under
identical semantics (sorted deduped doc ids per code, index.rs:479-508),
which also subsumes S3: the legacy multi-chunk layout merges into one
multi-file parquet table in the same pass.

fastplaid variants need no pre-pass: np.load handles the f16 floats
(astype to f32 here) and both ``<u1``/``|u1`` residual descriptors — the
dtype rewrites of the reference's convert_fastplaid_to_nextplaid
(mmap.rs:1757-1810) become plain casts.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from next_plaid_spark.operators.codec import CodecArtifacts
from next_plaid_spark.sources.index_store import (
    IndexMeta, PlaidIndex, write_index)


def _np1(path: str, dtype) -> np.ndarray:
    return np.load(path).astype(dtype)


def load_npy_codec(src: str) -> CodecArtifacts:
    """Codec artifacts from the legacy directory (f16-safe)."""
    with open(os.path.join(src, "plan.json")) as f:
        nbits = int(json.load(f)["nbits"])
    ct_p = os.path.join(src, "cluster_threshold.npy")
    ct = float(np.load(ct_p).astype(np.float32)[0]) if os.path.exists(ct_p) else 0.0
    return CodecArtifacts(
        nbits=nbits,
        bucket_cutoffs=_np1(os.path.join(src, "bucket_cutoffs.npy"), np.float32),
        bucket_weights=_np1(os.path.join(src, "bucket_weights.npy"), np.float32),
        avg_residual=_np1(os.path.join(src, "avg_residual.npy"), np.float32),
        cluster_threshold=ct,
    )


def legacy_tokens_df(spark: SparkSession, src: str) -> DataFrame:
    """(doc_id, token_idx, code, residual) from every legacy chunk — one
    Spark task per chunk; each task np.loads only its own chunk files."""
    with open(os.path.join(src, "metadata.json")) as f:
        n_chunks = int(json.load(f)["num_chunks"])
    descs = []
    doc_base = 0
    for i in range(n_chunks):
        with open(os.path.join(src, f"doclens.{i}.json")) as f:
            n_docs_chunk = len(json.load(f))
        descs.append((i, src, doc_base))
        doc_base += n_docs_chunk
    desc_df = spark.createDataFrame(
        descs, "chunk int, src string, doc_base long"
    ).repartition(max(1, len(descs)))

    def read_chunk(batches):
        import pandas as pd

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                codes = np.load(
                    os.path.join(r.src, f"{r.chunk}.codes.npy")
                ).astype(np.int64)
                res = np.load(os.path.join(r.src, f"{r.chunk}.residuals.npy"))
                res = np.ascontiguousarray(res.astype(np.uint8))
                with open(os.path.join(r.src, f"doclens.{r.chunk}.json")) as f:
                    doclens = np.asarray(json.load(f), dtype=np.int64)
                doc_ids = r.doc_base + np.repeat(
                    np.arange(len(doclens), dtype=np.int64), doclens
                )
                tok_idx = (np.arange(len(codes), dtype=np.int64)
                           - np.repeat(np.cumsum(doclens) - doclens, doclens))
                yield pd.DataFrame({
                    "doc_id": doc_ids,
                    "token_idx": tok_idx.astype(np.int32),
                    "code": codes,
                    "residual": [row.tobytes() for row in res],
                })

    return desc_df.mapInPandas(
        read_chunk,
        schema="doc_id long, token_idx int, code long, residual binary",
    )


def convert_npy_index(spark: SparkSession, src: str, dest: str, *,
                      bucket_tokens: int | None = None) -> PlaidIndex:
    """Convert a legacy NPY index directory into a parquet PlaidIndex."""
    with open(os.path.join(src, "metadata.json")) as f:
        m = json.load(f)
    centroids = np.load(os.path.join(src, "centroids.npy")).astype(np.float32)
    codec = load_npy_codec(src)
    meta = IndexMeta(
        k=int(m.get("num_partitions", centroids.shape[0])),
        dim=int(m.get("embedding_dim", centroids.shape[1])),
        nbits=codec.nbits,
        num_documents=int(m["num_documents"]),
        num_embeddings=int(m["num_embeddings"]),
        avg_doclen=float(m.get(
            "avg_doclen", m["num_embeddings"] / max(m["num_documents"], 1)
        )),
        codec=codec,
    )
    return write_index(
        spark, dest,
        tokens_coded=legacy_tokens_df(spark, src),
        centroids=centroids, meta=meta, bucket_tokens=bucket_tokens,
    )
