"""StreamingAsofEnricher: stream (time-ordered batches) ≡ batch
asof_join_backward over the full event log, including cross-batch matches
that resolve through the one-row-per-key ledger."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from next_plaid_spark.operators.asof import asof_join_backward
from next_plaid_spark.streaming.enrich import StreamingAsofEnricher

SCHEMA = "event_id long, user_id long, ts long, event_type string, value double"

# batch 1: ts 0-99; batch 2: ts 100-199 (time-ordered arrival)
B1 = [
    (0, 1, 10, "view", 1.0),
    (1, 1, 20, "purchase", 9.0),   # matches view@10 (same batch)
    (2, 2, 30, "view", 2.0),
    (3, 1, 50, "view", 3.0),
    (4, 3, 60, "purchase", 7.0),   # user 3 has no view → NULL
]
B2 = [
    (5, 1, 110, "purchase", 5.0),  # matches view@50 via LEDGER (cross-batch)
    (6, 2, 120, "view", 4.0),
    (7, 2, 130, "purchase", 6.0),  # matches view@120 (same batch beats ledger)
    (8, 3, 140, "purchase", 8.0),  # still no view → NULL
]


def _batch_reference(spark):
    ev = spark.createDataFrame(B1 + B2, SCHEMA)
    lefts = ev.filter(F.col("event_type") == "purchase")
    rights = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value"), "event_id"
    )
    return asof_join_backward(
        lefts, rights, keys=["user_id"], ts_col="ts",
        payload_cols=["view_value"], tie_col="event_id",
    )


def test_stream_matches_batch(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("asofstream")
    src = str(tmp / "in")
    os.makedirs(src)
    for i, rows in enumerate((B1, B2)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/part{i}")

    enr = StreamingAsofEnricher(
        spark, str(tmp / "root"), keys=["user_id"], ts_col="ts",
        payload_cols=["view_value"],
        left_filter=F.col("event_type") == "purchase",
        right_filter=F.col("event_type") == "view",
        tie_col="event_id",
    )
    # the right side needs the payload under its output name
    stream = (
        spark.readStream.schema(spark.createDataFrame(B1, SCHEMA).schema)
        .option("maxFilesPerTrigger", "1").parquet(f"{src}/part*")
        .withColumn("view_value", F.col("value"))
    )
    q = enr.attach(stream, str(tmp / "ck"))
    q.awaitTermination(300)

    got = {
        r.event_id: (r.asof_view_value, r.asof_ts)
        for r in enr.enriched().collect()
    }
    want = {
        r.event_id: (r.asof_view_value, r.asof_ts)
        for r in _batch_reference(spark).collect()
    }
    assert got == want
    assert want[1] == (1.0, 10)     # same-batch match
    assert want[5] == (3.0, 50)     # cross-batch via ledger
    assert want[7] == (4.0, 120)    # same-batch beats ledger
    assert want[4] == (None, None)  # no right row for the key


def test_enrich_replay_is_idempotent(spark, tmp_path_factory):
    """r13: a replay of the last batch (committed writes, uncommitted
    checkpoint) must not double-emit its enriched rows, and must base its
    as-of matches on the PREVIOUS ledger, not the snapshot its own prior
    attempt wrote (whose per-key reduction may have dropped a right row a
    left should still match)."""
    enr = StreamingAsofEnricher(
        spark, str(tmp_path_factory.mktemp("asofreplay") / "root"),
        keys=["user_id"], ts_col="ts", payload_cols=["view_value"],
        left_filter=F.col("event_type") == "purchase",
        right_filter=F.col("event_type") == "view",
        tie_col="event_id",
    )

    def df(rows):
        return spark.createDataFrame(rows, SCHEMA).withColumn(
            "view_value", F.col("value"))

    enr.process_batch(df(B1), 0)
    enr.process_batch(df(B2), 1)
    clean = sorted(
        (r.event_id, r.asof_view_value, r.asof_ts)
        for r in enr.enriched().collect())

    enr.process_batch(df(B2), 1)   # full replay of the last batch
    got = sorted(
        (r.event_id, r.asof_view_value, r.asof_ts)
        for r in enr.enriched().collect())
    assert got == clean            # no duplicates, identical matches
