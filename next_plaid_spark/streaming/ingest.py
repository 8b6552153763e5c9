"""Streaming ingest — S8's micro-batch queue reborn as Structured Streaming
``foreachBatch`` (SURVEY.md §1.1: the reference has no stateful streaming
semantics, only per-index mpsc batch queues —
next-plaid-api/src/handlers/documents.rs:223-430).

Each micro-batch of documents runs the same batch index-delta job
(operators/update.py); index snapshots advance ``v0 → v1 → …`` under a root
directory, and readers always load the latest complete version (the
arc-swap hot-reload analog, state.rs:31-47). The post-stream invariant —
streamed index ≡ batch rebuild of the same corpus — mirrors the reference's
metadata_sync_test.rs:54-300.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from next_plaid_spark.encoding import encode_documents
from next_plaid_spark.operators.update import update_index
from next_plaid_spark.sources.index_store import PlaidIndex


def _versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.exists(os.path.join(root, name, "meta.json")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_index(spark: SparkSession, root: str) -> PlaidIndex | None:
    vs = _versions(root)
    if not vs:
        return None
    return PlaidIndex.load(spark, os.path.join(root, f"v{vs[-1]}"))


class StreamingIndexWriter:
    """foreachBatch sink: documents stream → versioned index snapshots."""

    def __init__(self, spark: SparkSession, root: str, *, dim: int = 16,
                 nbits: int = 4, seed: int = 42,
                 bucket_tokens: int | None = None):
        self.spark = spark
        self.root = root
        self.dim = dim
        self.nbits = nbits
        self.seed = seed
        self.bucket_tokens = bucket_tokens

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tokens = encode_documents(batch_df, dim=self.dim)
        current = latest_index(self.spark, self.root)
        vs = _versions(self.root)
        out = os.path.join(self.root, f"v{(vs[-1] + 1) if vs else 0}")
        if current is None:
            from next_plaid_spark.plans.builder import IndexBuilder

            IndexBuilder(self.spark, nbits=self.nbits, seed=self.seed,
                         bucket_tokens=self.bucket_tokens).build(tokens, out)
        else:
            # on bucketed snapshots update_index routes the append through
            # the fused delta internally: per-batch IO is O(batch) — only
            # the buckets owning new doc_ids rewrite, clean ones hardlink
            # forward (S8 at cluster scale)
            update_index(self.spark, current, tokens, out, seed=self.seed)

    def attach(self, stream_df: DataFrame, checkpoint: str):
        """stream_df: streaming documents(doc_id, text, …). Returns the
        StreamingQuery (availableNow-compatible)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
