"""Event-time streaming analytics (streaming/windows.py): watermarked
tumbling windows, built-in session windows, and the custom stateful
sessionizer — each checked for exact batch parity, against BOTH ``ts``
dtypes the driver's testdata has shipped (BIGINT nanos and
timestamp[us]→TIMESTAMP_NTZ). The r4 regression class was exactly this:
code green against one physical type, broken by a regeneration that
flipped it — so every stream≡batch test here is parametrized over dtype.

Harness notes:
- The file-stream source orders micro-batches by file modification time, so
  the fixture stamps strictly increasing mtimes to make arrival order
  deterministic (ts-ascending). The stateful sessionizer itself does NOT
  rely on that order (it buffers unfinalized events); the mtimes only make
  the *test* deterministic.
- A sentinel event far past the corpus end advances the final watermark past
  every session/window deadline, so append-mode emits the complete result
  and the parity check is exact equality, not subset.
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.time import event_ts_micros, normalize_event_ts
from next_plaid_spark.streaming.windows import (
    SESSION_GAP_MIN,
    hourly_windows,
    session_windows,
    sessionize_stateful,
)

GAP_US = SESSION_GAP_MIN * 60 * 1_000_000
SENTINEL_USER = 10**6
_EPOCH = datetime.datetime(1970, 1, 1)


@pytest.fixture(scope="module", params=["nanos", "ntz"])
def events(request, spark, sf_dir):
    """The events table re-materialized under a specific ts dtype (both
    derived from the real file through the micros normalizer, so the two
    parametrizations carry identical instants)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = normalize_event_ts(raw)  # ts -> BIGINT epoch-micros
    if request.param == "nanos":
        ev = us.withColumn("ts", F.col("ts") * F.lit(1000))
    else:
        ev = us.withColumn(
            "ts", F.timestamp_micros(F.col("ts")).cast("timestamp_ntz")
        )
    # keep the driver column order (stream schemas must match exactly)
    return ev.select(*raw.columns).cache()


def _ts_value(events, ts_us: int):
    """A python literal for ``ts_us`` micros under the events frame's
    ts dtype (for building sentinel rows with createDataFrame)."""
    dt = dict(events.dtypes)["ts"]
    if dt == "bigint":
        return ts_us * 1000
    return _EPOCH + datetime.timedelta(microseconds=ts_us)


def _max_us(df) -> int:
    return df.select(F.max(event_ts_micros(df)).alias("m")).collect()[0]["m"]


def _sentinel(spark, events, ts_us: int):
    return spark.createDataFrame(
        [(10**9, _ts_value(events, ts_us), SENTINEL_USER, "sentinel", 0.0, "{}")],
        schema=events.schema,
    )


@pytest.fixture(scope="module")
def stream_dir(spark, events, tmp_path_factory):
    """events split into 4 ts-ordered files + a watermark-advancing
    sentinel, with strictly increasing mtimes."""
    root = tmp_path_factory.mktemp("event_stream")
    data = os.path.join(str(root), "data")
    os.makedirs(data)
    quarts = events.withColumn("_q", F.ntile(4).over(Window.orderBy("ts")))
    for i in range(1, 5):
        part = os.path.join(str(root), f"part{i}")
        quarts.filter(F.col("_q") == i).drop("_q").coalesce(1).write.parquet(part)
        src = glob.glob(os.path.join(part, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(data, f"{i:03d}.parquet"))
    sentinel = _sentinel(spark, events, _max_us(events) + 4 * 3600 * 10**6)
    spart = os.path.join(str(root), "sentinel")
    sentinel.coalesce(1).write.parquet(spart)
    shutil.copy(glob.glob(os.path.join(spart, "part-*.parquet"))[0],
                os.path.join(data, "999_sentinel.parquet"))
    for i, f in enumerate(sorted(os.listdir(data))):
        os.utime(os.path.join(data, f), (1e9 + i, 1e9 + i))
    return data


def _run_stream(spark, stream_dir, schema, build, name, tmp):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _island_sessions(events, extra_aggs=True):
    """Batch oracle: gap-islands on integer micros (>= gap starts a
    session), session_end = last event."""
    us_frame = normalize_event_ts(events).withColumnRenamed("ts", "us")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = us_frame.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) >= GAP_US), 1
        ).otherwise(0),
    )
    s = g.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.min("us").alias("session_start"),
        F.max("us").alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if extra_aggs:
        aggs.append(F.round(F.sum("value"), 2).alias("total_value"))
    return s.groupBy("user_id", "sid").agg(*aggs).drop("sid")


def test_session_windows_stream_equals_batch(spark, events, stream_dir, tmp_path):
    cols = ["user_id", "session_start", "n_events", "total_value"]
    batch = _rows(session_windows(events), cols)
    got = _run_stream(spark, stream_dir, events.schema, session_windows,
                      "sess_builtin", str(tmp_path))
    streamed = _rows(got.filter(F.col("user_id") != SENTINEL_USER), cols)
    assert streamed == batch


def test_sessionize_stateful_stream_equals_batch(spark, events, stream_dir, tmp_path):
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    batch_rows = _rows(_island_sessions(events), cols)

    got = _run_stream(spark, stream_dir, events.schema, sessionize_stateful,
                      "sess_stateful", str(tmp_path))
    streamed = _rows(
        got.filter(F.col("user_id") != SENTINEL_USER)
        .withColumn("total_value", F.round("total_value", 2)),
        cols,
    )
    assert streamed == batch_rows


def test_sessionize_stateful_out_of_order_arrival(spark, events, tmp_path):
    """The stateful sessionizer must not depend on cross-batch arrival
    order (the watermark is the only contract): deliver the 2nd quarter
    of events BEFORE the 1st — both inside one watermark horizon — and
    still require exact batch parity for every closed session."""
    half = events.filter(F.col("user_id") < 4)
    half_us = half.withColumn("_us", event_ts_micros(half))
    mid = half_us.approxQuantile("_us", [0.5], 0.0)[0]
    lo = half_us.filter(F.col("_us") <= mid).drop("_us")
    hi = half_us.filter(F.col("_us") > mid).drop("_us")
    # the watermark delay must cover the full out-of-order span (lo arrives
    # after hi), and the sentinel must then outrun that delay to flush
    sentinel = _sentinel(spark, events, _max_us(half) + 41 * 86400 * 10**6)
    data = os.path.join(str(tmp_path), "data")
    os.makedirs(data)
    # arrival order: hi, lo, sentinel — lo is "late" but the huge watermark
    # delay keeps every event admissible
    for i, part in enumerate([hi, lo, sentinel]):
        d = os.path.join(str(tmp_path), f"p{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(data, f"{i:03d}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (1e9 + i, 1e9 + i))

    def build(stream):
        return sessionize_stateful(stream, watermark="40 days")

    got = _run_stream(spark, data, events.schema, build,
                      "sess_ooo", str(tmp_path))

    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(
        got.filter(F.col("user_id") != SENTINEL_USER), cols
    ) == _rows(_island_sessions(half, extra_aggs=False), cols)


def test_hourly_windows_stream_equals_batch(spark, events, stream_dir, tmp_path):
    cols = ["hour_bucket", "event_type", "n_events", "total_value"]
    batch = _rows(hourly_windows(events), cols)

    got = _run_stream(spark, stream_dir, events.schema, hourly_windows,
                      "hourly_stream", str(tmp_path))
    streamed = _rows(got.filter(F.col("event_type") != "sentinel"), cols)
    assert streamed == batch


def test_hourly_windows_matches_batch_query(spark, events, sf_dir):
    """hourly_windows (window-function path) ≡ q_events_hourly (integer
    hour-bucket path) on the same batch input."""
    from next_plaid_spark import queries as q

    a = _rows(hourly_windows(events),
              ["hour_bucket", "event_type", "n_events", "total_value"])
    b = _rows(q.q_events_hourly(spark, sf_dir),
              ["hour_bucket", "event_type", "n_events", "total_value"])
    assert a == b


def test_sliding_windows_stream_equals_batch(spark, events, stream_dir, tmp_path):
    from next_plaid_spark.streaming.windows import sliding_windows

    cols = ["window_start", "event_type", "n_events", "total_value"]
    batch = _rows(sliding_windows(events), cols)

    got = _run_stream(spark, stream_dir, events.schema, sliding_windows,
                      "sliding_stream", str(tmp_path))
    streamed = _rows(got.filter(F.col("event_type") != "sentinel"), cols)
    assert streamed == batch


def test_sliding_windows_membership(spark, events):
    """Every event lands in exactly window/slide = 4 windows: total
    n_events across all windows = 4 × corpus size."""
    from next_plaid_spark.streaming.windows import sliding_windows

    total = sliding_windows(events).agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count() * 4


def test_sliding_windows_misaligned_raises(spark, events):
    from next_plaid_spark.streaming.windows import sliding_windows

    with pytest.raises(ValueError):
        sliding_windows(events, window_min=60, slide_min=25)
