"""Streaming corpus curation — the training-data intake gate as a
Structured Streaming ``foreachBatch`` pipeline.

The reference has no curation surface (its only stream is the per-index
ingestion queue, next-plaid-api/src/handlers/documents.rs:223-430); this is
the extension layer a 100 TB pretraining pipeline runs on documents as they
arrive, composing the batch corpus operators (operators/corpus.py,
operators/textstats.py) into one micro-batch job:

  1. exact dedup   — content fingerprint (textstats.fingerprint), first
                     arrival wins: intra-batch by (fp, doc_id asc), then an
                     anti-join against the persisted fingerprint LEDGER of
                     everything ever kept (cross-micro-batch state).
  2. decontamination — n-gram overlap against a STATIC eval/benchmark
                     shingle set, precomputed once at construction and
                     broadcast into every micro-batch (the eval side never
                     recomputes; stream-static join discipline).
  3. quality gate  — textstats.quality_score threshold (stateless).

Kept docs append to ``<root>/kept``; their fingerprints append to
``<root>/fp_ledger``. Both are plain Parquet directories — at cluster scale
the ledger would be a Delta/Iceberg table with compaction and the anti-join
a storage-partitioned join on a bucketed ``fp``, but the plan shape (one
broadcast join, one ledger anti-join, stateless projections) is unchanged.

Stream ≡ batch: for a corpus streamed in ascending doc_id order (any batch
split), the kept set is IDENTICAL to ``curate_batch`` over the whole corpus
— verified in tests/test_streaming_curation.py. Out-of-order arrival keeps
first-arrival-wins dedup semantics (the streaming-native contract; batch
"min doc_id wins" coincides with it when arrival follows doc_id).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.operators.corpus import contamination, eval_shingle_set
from next_plaid_spark.operators.textstats import fingerprint, quality_score


def _dedup_first(docs_with_fp: DataFrame) -> DataFrame:
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        docs_with_fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def curate_batch(docs: DataFrame, eval_shingles: DataFrame, *, n: int = 3,
                 max_contamination: float = 0.5,
                 min_quality: float | None = None) -> DataFrame:
    """One-shot batch curation: dedup (min doc_id wins) → contamination
    gate → quality gate. Returns the kept docs plus their ``fp`` column.
    The streaming pipeline applies the same gates per micro-batch."""
    d = _dedup_first(docs.join(fingerprint(docs).select("doc_id", "fp"), "doc_id"))
    flagged = (
        contamination(d, n=n, eval_shingles=eval_shingles)
        .filter(F.col("contamination") > max_contamination)
        .select("doc_id")
    )
    d = d.join(flagged, "doc_id", "left_anti")
    if min_quality is not None:
        bad = (
            quality_score(d)
            .filter(F.col("quality") < min_quality)
            .select("doc_id")
        )
        d = d.join(bad, "doc_id", "left_anti")
    return d


class StreamingCurator:
    """foreachBatch sink: documents stream → curated corpus + fp ledger."""

    def __init__(self, spark: SparkSession, root: str,
                 eval_docs: DataFrame | None = None, *, n: int = 3,
                 max_contamination: float = 0.5,
                 min_quality: float | None = None):
        self.spark = spark
        self.root = root
        self.n = n
        self.max_contamination = max_contamination
        self.min_quality = min_quality
        self._ev_path = os.path.join(root, "eval_shingles")
        if not os.path.exists(self._ev_path):
            if eval_docs is None:
                raise ValueError("first run needs eval_docs to seed the shingle set")
            # benchmark shingle universe: computed ONCE, persisted, then
            # read + broadcast per micro-batch (it is the small static side)
            eval_shingle_set(eval_docs, n=n).write.parquet(self._ev_path)

    @property
    def _kept_path(self) -> str:
        return os.path.join(self.root, "kept")

    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.root, "fp_ledger")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ev = self.spark.read.parquet(self._ev_path)
        d = curate_batch(
            batch_df, ev, n=self.n,
            max_contamination=self.max_contamination,
            min_quality=self.min_quality,
        )
        if os.path.isdir(self._ledger_path):
            seen = self.spark.read.parquet(self._ledger_path)
            d = d.join(seen, "fp", "left_anti")
        # two writes per micro-batch; foreachBatch may replay a batch after
        # failure, so production would write both under a batch_id-derived
        # path (idempotent overwrite) — the gates themselves are replay-safe
        # (a replayed doc anti-joins its own ledger entry away)
        d = d.cache()
        d.drop("fp").write.mode("append").parquet(self._kept_path)
        d.select("fp").distinct().write.mode("append").parquet(self._ledger_path)
        d.unpersist()

    def attach(self, docs_stream: DataFrame, checkpoint: str):
        """Start the stream (availableNow: drain all ready input, stop)."""
        return (
            docs_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def kept(self) -> DataFrame:
        return self.spark.read.parquet(self._kept_path)
