"""Event-time streaming analytics over the ``events`` stream — watermarked
tumbling windows, built-in session windows, and a custom stateful
sessionizer (``applyInPandasWithState``).

The reference has no event-time streaming surface (its only stream is the
per-index ingestion queue, next-plaid-api/src/handlers/documents.rs:223-430,
covered by streaming/ingest.py); these operators are the Structured-
Streaming-native analytics layer a 100 TB event pipeline needs on top of
the batch ``events_*`` queries in queries.py:

- ``hourly_windows``      — q_events_hourly as a watermarked tumbling window
                            (identical code path batch/stream; on a stream,
                            append-mode emits each hour bucket exactly once,
                            when the watermark passes its end).
- ``session_windows``     — q_events_sessions' gap-islands as the built-in
                            ``F.session_window`` (Catalyst-native session
                            merge; batch mode is DuckDB-oracle-checked by the
                            ``events_session_windows`` entry).
- ``sessionize_stateful`` — the same sessions via ``applyInPandasWithState``
                            with event-time timeouts: the custom-stateful-
                            operator seam for session logic the built-in
                            window can't express (per-session payloads,
                            custom close rules). Guarantees exact batch
                            parity for every session the watermark has
                            closed, under ANY within-watermark arrival order
                            (state buffers unfinalized events; sessions are
                            finalized only once ``end + gap <= watermark``).

All event-time arithmetic runs on integer microseconds. The source ``ts``
dtype varies across testdata regenerations (BIGINT nanos under nanosAsLong,
or parquet timestamp[us] resolving as TIMESTAMP_NTZ) — ``with_event_time``
normalizes it via functions/time.py once, so batch/stream/oracle agree
bit-for-bit regardless of the physical type.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from next_plaid_spark.functions.time import event_ts_micros

SESSION_GAP_MIN = 30  # parity with queries.SESSION_GAP_MIN
DEFAULT_WATERMARK = "2 hours"

_US_PER_HOUR = 3_600_000_000


def with_event_time(events: DataFrame) -> DataFrame:
    """Add ``ts_us`` (BIGINT epoch-micros, dtype-sniffed from ``ts``) and
    ``event_time`` (TimestampType — required by watermarks and time
    windows). All downstream integer arithmetic uses ``ts_us``."""
    return events.withColumn(
        "ts_us", event_ts_micros(events)
    ).withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )


def hourly_windows(events: DataFrame, *,
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Tumbling 1-hour windows of (n_events, total_value) per event_type.

    Same aggregate as q_events_hourly (hour_bucket = window start, epoch
    hours); works unchanged on a batch DataFrame (withWatermark is a no-op)
    and on a stream (append mode: a bucket emits once, when the watermark
    passes its end — late rows inside the watermark still land in their
    bucket, later ones are dropped).
    """
    ev = with_event_time(events).withWatermark("event_time", watermark)
    return (
        ev.groupBy(
            F.window("event_time", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / _US_PER_HOUR)
            .cast("long").alias("hour_bucket"),
            "event_type", "n_events", "total_value",
        )
    )


def session_windows(events: DataFrame, *, gap_min: int = SESSION_GAP_MIN,
                    watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Per-user sessions via the built-in session window (gap-merge).

    Boundary semantics match the gap-islands formulation with ``>= gap``
    (session windows are half-open ``[t, t+gap)``: an event exactly ``gap``
    after the last does NOT merge) — verified bit-identical to the DuckDB
    island SQL by the ``events_session_windows`` oracle entry.
    """
    ev = with_event_time(events).withWatermark("event_time", watermark)
    return (
        ev.groupBy(
            "user_id",
            F.session_window("event_time", f"{gap_min} minutes").alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start"),
            "n_events", "total_value",
        )
    )


_SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, "
    "n_events long, total_value double"
)
# unfinalized events, buffered until the watermark can close their session
_SESSION_STATE_SCHEMA = "ev_us array<long>, ev_val array<double>"


def sessionize_stateful(events: DataFrame, *,
                        gap_min: int = SESSION_GAP_MIN,
                        watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Exact per-user sessionization as a custom stateful operator.

    Returns (user_id, session_start, session_end, n_events, total_value)
    with start/end in epoch micros (end = last event, not end-of-gap).

    Correctness contract: a session row is emitted exactly once, and only
    after the event-time watermark passes ``session_end + gap`` — at which
    point no admissible (non-late) event can extend or split it, so every
    emitted row equals the batch gap-islands result over the same events.
    Cross-batch arrival order doesn't matter: state holds the still-open
    suffix of each user's event buffer (bounded by the watermark horizon:
    events newer than ``watermark - gap``), and islands are recomputed over
    the merged buffer each batch. Event-time timeouts flush sessions for
    users with no new data once the watermark advances past their deadline.

    This is the ``applyInPandasWithState`` seam for session semantics the
    built-in ``session_window`` cannot express (arbitrary per-session
    payloads/close rules); with the default aggregates it matches
    ``session_windows`` minus the trailing-gap end convention.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000
    gap_ms = gap_us // 1000

    def flush(us: "np.ndarray", vals: "np.ndarray", wm_ms: int):
        """Split the sorted buffer into gap-islands; return (rows for every
        island finalized by the watermark, remaining buffer)."""
        if not len(us):
            return [], us, vals
        # island starts: first event, or gap >= gap_us from predecessor
        new_s = np.empty(len(us), dtype=bool)
        new_s[0] = True
        np.greater_equal(us[1:] - us[:-1], gap_us, out=new_s[1:])
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], len(us)) - 1
        rows = []
        keep_from = len(us)
        for s_i, e_i in zip(starts, ends):
            # finalized iff no admissible event can still join: watermark
            # (ms) has passed session_end + gap
            if (us[e_i] + gap_us) // 1000 + 1 <= wm_ms:
                rows.append((int(us[s_i]), int(us[e_i]), int(e_i - s_i + 1),
                             float(vals[s_i:e_i + 1].sum())))
            else:
                keep_from = s_i
                break
        return rows, us[keep_from:], vals[keep_from:]

    def fn(key: Tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"):
        uid = int(key[0])
        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            b_us, b_val = state.get
            us = np.asarray(b_us, dtype=np.int64)
            vals = np.asarray(b_val, dtype=np.float64)
            rows, us, vals = flush(us, vals, wm_ms)
            if len(us):
                state.update((us.tolist(), vals.tolist()))
                state.setTimeoutTimestamp(
                    max(int(us[-1]) // 1000 + gap_ms, wm_ms + 1)
                )
            else:
                state.remove()
        else:
            batch = pd.concat(list(pdfs))
            us = batch["ts_us"].to_numpy(dtype=np.int64)
            vals = batch["value"].to_numpy(dtype=np.float64)
            if state.exists:
                b_us, b_val = state.get
                us = np.concatenate([np.asarray(b_us, dtype=np.int64), us])
                vals = np.concatenate([np.asarray(b_val, dtype=np.float64), vals])
            order = np.argsort(us, kind="stable")
            us, vals = us[order], vals[order]
            rows, us, vals = flush(us, vals, wm_ms)
            if len(us):
                state.update((us.tolist(), vals.tolist()))
                state.setTimeoutTimestamp(
                    max(int(us[-1]) // 1000 + gap_ms, wm_ms + 1)
                )
            else:  # everything finalized (only possible if all data was old)
                state.remove()

        if rows:
            yield pd.DataFrame(
                [{"user_id": uid, "session_start": s, "session_end": e,
                  "n_events": n, "total_value": v} for (s, e, n, v) in rows]
            )

    ev = with_event_time(events).withWatermark("event_time", watermark)
    return (
        ev.select("user_id", "ts_us", "value", "event_time")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _SESSION_OUT_SCHEMA, _SESSION_STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
    )


def sliding_windows(events: DataFrame, *, window_min: int = 60,
                    slide_min: int = 15,
                    watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Overlapping (sliding) windows of (n_events, total_value) per
    event_type — the trending/rate-monitoring shape ``hourly_windows``
    can't express (each event lands in window_min/slide_min windows).

    Window starts are slide-aligned epoch multiples (Spark's default
    startTime=0), so the batch result is exactly reproducible in SQL:
    event at micros t belongs to starts (t÷slide − k)·slide for
    k ∈ [0, window/slide). Works unchanged on batch and stream (append
    mode emits each window once its end passes the watermark).
    """
    if window_min % slide_min:
        raise ValueError("window_min must be a multiple of slide_min "
                         "(slide-aligned starts are the parity contract)")
    ev = with_event_time(events).withWatermark("event_time", watermark)
    return (
        ev.groupBy(
            F.window("event_time", f"{window_min} minutes",
                     f"{slide_min} minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )
