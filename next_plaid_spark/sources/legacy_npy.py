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


def export_npy_index(spark: SparkSession, index: PlaidIndex, dest: str, *,
                     docs_per_chunk: int = 50_000) -> int:
    """The reverse direction: a parquet PlaidIndex → the reference's NPY
    artifact directory (index.rs:400-520), so corpora can migrate BACK to
    a next-plaid deployment. Returns the number of chunks written.

    Docs are renumbered to dense 0..N−1 positions in doc_id order (the
    reference addresses documents positionally) via the same two-phase
    prefix sum as sequence packing — no corpus-wide single-partition
    window. Chunk c = rank // docs_per_chunk (the reference's 50k-doc
    chunking); each chunk's codes/residuals/doclens are assembled and
    np.saved INSIDE one Spark task (``applyInPandas`` over
    ``groupBy(chunk)``), so chunks export in parallel and only the
    (K-bounded) IVF assembly and small artifacts touch the driver."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    os.makedirs(dest, exist_ok=True)
    meta = index.meta
    codec = meta.codec
    np.save(os.path.join(dest, "centroids.npy"),
            index.centroids_np().astype(np.float32))
    np.save(os.path.join(dest, "bucket_cutoffs.npy"),
            codec.bucket_cutoffs.astype(np.float32))
    np.save(os.path.join(dest, "bucket_weights.npy"),
            codec.bucket_weights.astype(np.float32))
    np.save(os.path.join(dest, "avg_residual.npy"),
            codec.avg_residual.astype(np.float32))
    np.save(os.path.join(dest, "cluster_threshold.npy"),
            np.asarray([codec.cluster_threshold], dtype=np.float32))

    # dense rank per doc without a global window: per-bucket counts,
    # driver cumsum over |buckets| rows, within-bucket row_number
    bucket_size = 1 << 20
    dl = index.doclens.select(
        "doc_id", F.floor(F.col("doc_id") / bucket_size).alias("_b")
    )
    pre = {
        int(r._b): int(r.n)
        for r in dl.groupBy("_b").agg(F.count("*").alias("n")).collect()
    }
    base, acc = {}, 0
    for b in sorted(pre):
        base[b] = acc
        acc += pre[b]
    n_docs = acc
    base_df = spark.createDataFrame(
        [(b, off) for b, off in base.items()], "_b long, _off long"
    )
    w_in = Window.partitionBy("_b").orderBy("doc_id")
    ranks = (
        dl.withColumn("_r", F.row_number().over(w_in) - 1)
        .join(F.broadcast(base_df), "_b")
        .select("doc_id", (F.col("_off") + F.col("_r")).alias("rank"))
    )
    toks = index.tokens.join(ranks, "doc_id").select(
        "rank", "token_idx", "code", "residual",
        F.floor(F.col("rank") / docs_per_chunk).alias("chunk"),
    )
    n_chunks = (n_docs + docs_per_chunk - 1) // docs_per_chunk

    def write_chunk(key, pdf):
        import pandas as pd

        ci = int(key[0])
        pdf = pdf.sort_values(["rank", "token_idx"], kind="stable")
        codes = pdf["code"].to_numpy(dtype=np.int64)
        res = np.asarray(
            [np.frombuffer(r, dtype=np.uint8) for r in pdf["residual"]]
        )
        counts = pdf.groupby("rank", sort=True).size()
        np.save(os.path.join(dest, f"{ci}.codes.npy"), codes)
        np.save(os.path.join(dest, f"{ci}.residuals.npy"), res)
        with open(os.path.join(dest, f"doclens.{ci}.json"), "w") as f:
            json.dump([int(c) for c in counts], f)
        with open(os.path.join(dest, f"{ci}.metadata.json"), "w") as f:
            json.dump({
                "num_documents": int(len(counts)),
                "num_embeddings": int(len(codes)),
                "embedding_offset": 0,  # patched below in rank order
            }, f)
        return pd.DataFrame({"chunk": [ci], "n_tokens": [len(codes)]})

    chunk_stats = {
        int(r.chunk): int(r.n_tokens)
        for r in toks.groupBy("chunk").applyInPandas(
            write_chunk, schema="chunk long, n_tokens long"
        ).collect()
    }
    # embedding offsets are a running sum over chunk order
    off = 0
    for ci in range(n_chunks):
        p = os.path.join(dest, f"{ci}.metadata.json")
        with open(p) as f:
            m = json.load(f)
        m["embedding_offset"] = off
        off += chunk_stats.get(ci, 0)
        with open(p, "w") as f:
            json.dump(m, f)

    # IVF in dense-rank space, concatenated in code order with lengths —
    # K-bounded lists; the reference stores exactly this shape
    rank_map = {
        int(r.doc_id): int(r.rank) for r in ranks.collect()
    }
    ivf_rows = index.ivf.collect()
    by_code = {int(r.code): sorted(rank_map[int(d)] for d in r.doc_ids)
               for r in ivf_rows}
    ivf_data: list[int] = []
    ivf_lengths = np.zeros(meta.k, dtype=np.int32)
    for c in range(meta.k):
        docs = by_code.get(c, [])
        ivf_lengths[c] = len(docs)
        ivf_data.extend(docs)
    np.save(os.path.join(dest, "ivf.npy"),
            np.asarray(ivf_data, dtype=np.int64))
    np.save(os.path.join(dest, "ivf_lengths.npy"), ivf_lengths)

    with open(os.path.join(dest, "plan.json"), "w") as f:
        json.dump({"nbits": meta.nbits, "num_chunks": n_chunks}, f)
    with open(os.path.join(dest, "metadata.json"), "w") as f:
        json.dump({
            "num_chunks": n_chunks, "nbits": meta.nbits,
            "num_partitions": meta.k,
            "num_embeddings": meta.num_embeddings,
            "avg_doclen": meta.avg_doclen,
            "num_documents": n_docs,
            "embedding_dim": meta.dim,
            "next_plaid_compatible": True,
        }, f)
    return n_chunks
