"""Event-time normalization — the single read seam for ``events.ts``.

The driver's ``events.parquet`` has shipped ``ts`` under two different
physical types across testdata regenerations:

- parquet ``TIMESTAMP(NANOS)``  → with ``spark.sql.legacy.parquet.nanosAsLong``
  it resolves as BIGINT nanoseconds since the epoch;
- parquet ``timestamp[us]`` (no isAdjustedToUTC) → resolves as
  ``TIMESTAMP_NTZ`` (Spark 4 infers NTZ for non-UTC-adjusted micros).

Every downstream operator (hour buckets, gap-island sessionization,
watermarked streaming windows, the stateful sessionizer) does *integer*
event-time arithmetic, which is exact and engine-portable. This module is
the one place that knows about the dtype zoo: it sniffs the resolved Spark
type and rewrites ``ts`` to **BIGINT microseconds since the epoch (UTC)** —
the same value DuckDB's ``epoch_us(ts)`` produces on the same file, so the
oracle SQL mirrors it 1:1.

Why micros, not nanos: the driver data is micro-precision either way
(nanos files carry ``*000`` values), micros survive both source dtypes
without loss, and DuckDB's native TIMESTAMP is micro-precision — so
Spark-vs-oracle comparisons stay bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Column expression: ``col`` as BIGINT epoch-microseconds, whatever
    the source dtype.

    - BIGINT (legacy nanos read) → ``DIV 1000`` truncation (exact for
      micro-precision data; matches DuckDB's nanos→micros read).
    - TIMESTAMP → ``unix_micros`` (an instant; timezone-independent).
    - TIMESTAMP_NTZ → pin the session timezone to UTC, then cast→timestamp
      (NTZ wall-clock is interpreted as UTC, matching DuckDB, whose naive
      TIMESTAMP ``epoch_us`` also assumes UTC).
    """
    dtypes = dict(df.dtypes)
    if col not in dtypes:
        raise KeyError(f"column {col!r} not in DataFrame ({list(dtypes)})")
    dt = dtypes[col]
    if dt in ("bigint", "long"):
        return F.expr(f"{col} DIV 1000")
    if dt == "timestamp":
        return F.unix_micros(F.col(col))
    if dt == "timestamp_ntz":
        # cast NTZ→TZ reads the wall clock in the session timezone; pin it
        # to UTC so the instant is deterministic (and DuckDB-identical)
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        return F.unix_micros(F.col(col).cast("timestamp"))
    raise TypeError(
        f"events.{col} has unsupported dtype {dt!r}; expected BIGINT nanos, "
        "TIMESTAMP, or TIMESTAMP_NTZ"
    )


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Replace ``col`` with BIGINT epoch-microseconds. Apply exactly once,
    at the read seam (NOT idempotent on the BIGINT branch — a second pass
    would divide again)."""
    return df.withColumn(col, event_ts_micros(df, col))
