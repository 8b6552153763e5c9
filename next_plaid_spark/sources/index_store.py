"""Index persistence — the Spark analog of the reference's NPY artifact
directory (SURVEY.md §1.2, next-plaid/src/index.rs:551-911).

One index = one directory of Parquet tables + a JSON sidecar:

    <path>/tokens/      doc_id, token_idx, code, residual   (the corpus)
    <path>/centroids/   code, vec                           (small)
    <path>/ivf/         code, doc_ids                       (inverted file)
    <path>/doc_stats/   doc_id, num_tokens, codes  (doclens + codes.npy
                        analogs from one shuffle; readers column-prune)
    <path>/meta.json    k, dim, nbits, codec artifacts, counts

Legacy layouts with separate ``doclens``/``doc_codes`` directories are
still readable (PlaidIndex falls back when ``doc_stats`` is absent).

Differences from the reference by design: no 50k-doc chunking (Spark
partitioning replaces it), no embedding_offset bookkeeping (joins on doc_id
replace pointer arithmetic), no mmap merge step (S3 — multi-file Parquet
reads natively). Atomicity comes from Spark's job commit protocol instead of
temp-file rename (utils.rs:16).

``tokens`` is repartitioned by ``doc_id`` (rerank gathers whole documents)
and ``ivf`` by ``code`` (probe joins on code) — at cluster scale these become
bucketed tables so the search-side joins co-locate without a shuffle.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from next_plaid_spark.operators.codec import CodecArtifacts


@dataclass
class IndexMeta:
    k: int
    dim: int
    nbits: int
    num_documents: int
    num_embeddings: int
    avg_doclen: float
    codec: CodecArtifacts

    def to_json(self) -> str:
        return json.dumps(
            {
                "k": self.k,
                "dim": self.dim,
                "nbits": self.nbits,
                "num_documents": self.num_documents,
                "num_embeddings": self.num_embeddings,
                "avg_doclen": self.avg_doclen,
                "codec": self.codec.to_dict(),
                "next_plaid_spark_version": 1,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "IndexMeta":
        d = json.loads(s)
        return cls(
            k=d["k"], dim=d["dim"], nbits=d["nbits"],
            num_documents=d["num_documents"], num_embeddings=d["num_embeddings"],
            avg_doclen=d["avg_doclen"], codec=CodecArtifacts.from_dict(d["codec"]),
        )


class PlaidIndex:
    """Handle over a persisted index (load side of MmapIndex,
    index.rs:995-1139 — reborn as lazily-read Parquet tables)."""

    def __init__(self, spark: SparkSession, path: str, meta: IndexMeta):
        self.spark = spark
        self.path = path
        self.meta = meta

    # -- tables ------------------------------------------------------------
    @property
    def tokens(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "tokens"))

    @property
    def centroids_df(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "centroids"))

    @property
    def ivf(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "ivf"))

    @property
    def doclens(self) -> DataFrame:
        p = os.path.join(self.path, "doc_stats")
        if os.path.exists(p):
            # Parquet column pruning: the codes arrays are never scanned
            return self.spark.read.parquet(p).select("doc_id", "num_tokens")
        return self.spark.read.parquet(os.path.join(self.path, "doclens"))

    @property
    def doc_codes(self) -> DataFrame | None:
        """(doc_id, codes ARRAY<BIGINT>) — each doc's distinct sorted codes,
        the Spark analog of the reference's per-doc contiguous codes.npy
        rows (index.rs:812-818 + doclens offsets). Precomputed at write
        time (one shared groupBy with doclens in ``doc_stats``) so the
        search-side codes-only stage is a read + semi-join, not a
        per-query-batch corpus aggregation. None for indexes written before
        this table existed (searcher falls back to aggregating)."""
        p = os.path.join(self.path, "doc_stats")
        if os.path.exists(p):
            return self.spark.read.parquet(p).select("doc_id", "codes")
        p = os.path.join(self.path, "doc_codes")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def centroids_np(self) -> np.ndarray:
        rows = self.centroids_df.orderBy("code").collect()
        return np.asarray([r.vec for r in rows], dtype=np.float32)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PlaidIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = IndexMeta.from_json(f.read())
        return cls(spark, path, meta)


def write_index(
    spark: SparkSession,
    path: str,
    *,
    tokens_coded: DataFrame,
    centroids: np.ndarray,
    meta: IndexMeta,
    token_partitions: int | None = None,
) -> PlaidIndex:
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F

    # No repartition before the write: nothing downstream relies on
    # doc-co-located token files (every per-doc consumer groupBys first,
    # and Spark attaches no partitioning metadata to plain parquet), so a
    # hash shuffle of the corpus's biggest table here would be pure cost —
    # at 100 TB, THE cost. ``token_partitions`` remains for explicit
    # output-file-count control (round-robin, cheaper than hash).
    out = tokens_coded
    if token_partitions:
        out = out.repartition(token_partitions)
    out.write.mode("overwrite").parquet(os.path.join(path, "tokens"))
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(centroids)],
        "code long, vec array<float>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))

    tokens = spark.read.parquet(os.path.join(path, "tokens"))
    # B9 doclens + the per-doc distinct sorted codes (codes.npy analog) in
    # ONE groupBy(doc_id) pass — the only full-corpus shuffle after the
    # encode; readers project just the column they need (Parquet pruning),
    # so doclens consumers never touch the codes arrays
    (
        tokens.groupBy("doc_id")
        .agg(
            F.count("*").alias("num_tokens"),
            F.array_sort(F.collect_set("code")).alias("codes"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "doc_stats"))
    )
    doc_stats = spark.read.parquet(os.path.join(path, "doc_stats"))
    # B8 IVF: sorted, deduped doc list per centroid (index.rs:479-508),
    # derived from doc_stats — input is each doc's distinct codes (≤ doclen
    # rows after explode), not the full token table, and (code, doc_id)
    # pairs arrive pre-deduped so collect_list suffices
    (
        doc_stats.select("doc_id", F.explode("codes").alias("code"))
        .groupBy("code")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .repartition(1 if meta.k < 65536 else 32, "code")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "ivf"))
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        f.write(meta.to_json())
    return PlaidIndex(spark, path, meta)
