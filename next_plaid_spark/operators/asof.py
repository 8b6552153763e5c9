"""As-of (point-in-time) join — the attribution/feature-lookup primitive a
training-data pipeline needs that Spark has no built-in operator for.

``asof_join_backward(left, right)`` attaches to every left row the payload
of the latest right row with the same key and ``ts <= left.ts`` (inclusive
backward as-of — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

Scale shape — this is deliberately NOT a range join: Spark would plan
``l.ts >= r.ts`` as a broadcast-nested-loop (O(|L|·|R|) per key). Instead
both sides are unioned with a side marker and a SINGLE window pass per key
computes a running ``last(payload, ignorenulls)``:

    sort key:  (ts ASC, side ASC, tie ASC)   side: right=0 < left=1
    match   =  last(right row STRUCT, ignorenulls) over rows unbounded-prec..current

The whole right row (ts + every payload column) travels as ONE struct
through a single running ``last``, so the match is atomic: a right row
whose payload value is genuinely NULL is still the match (merge_asof
semantics — the NULL is returned, not an older row's value), every
``asof_<c>`` comes from the SAME matched row, and the tolerance check is
applied against that row's timestamp.

One shuffle on the key columns, sequential scan within each key — the same
cost as a sort-merge join, and AQE handles skewed keys. Right rows sharing
a (key, ts) resolve deterministically to the greatest tie column (running
``last`` under the explicit tie order).

No reference counterpart (next-plaid has no temporal operators); this
belongs to the LLM-pipeline extension surface alongside sessionization.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tie_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Inclusive backward as-of join.

    Returns ``left``'s columns plus, per payload column ``c``, a matched
    ``asof_<c>`` column, and ``asof_ts`` = the matched right row's
    timestamp (all NULL when no right row precedes). ``tolerance`` (same
    units as a numeric ``ts_col``) nulls out matches older than
    ``left.ts − tolerance`` — pandas ``merge_asof(tolerance=…)``.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    l_struct_t = left.select(F.struct(*left.columns).alias("s")).schema[0].dataType
    # the tie column disambiguates RIGHT rows sharing a (key, ts); left rows
    # each match independently, so their tie key is irrelevant
    l_tie = (
        F.col(tie_col)
        if tie_col is not None and tie_col in left.columns
        else F.lit(0)
    )

    # the ENTIRE right row travels as one struct: a single running last()
    # keeps the match atomic — NULL payload values are returned faithfully
    # (not skipped for an older row's value), and every asof_<c> + the
    # tolerance check come from the same matched row
    r_struct = F.struct(
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    r_struct_t = right.select(r_struct.alias("s")).schema[0].dataType

    left_u = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        l_tie.cast("long").alias("_tie"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tie = F.col(tie_col) if tie_col is not None and tie_col in right.columns else F.lit(0)
    right_u = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        r_tie.cast("long").alias("_tie"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        r_struct.alias("_r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = left_u.unionByName(right_u).withColumn(
        "_m", F.last(F.col("_r"), ignorenulls=True).over(w)
    )

    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col("_ts") - F.col("_m._r_ts")) <= F.lit(tolerance)
    )
    out = matched.filter(F.col("_side") == 1).select(
        F.col("_l.*"),
        *[
            F.when(in_tol, F.col(f"_m._r_{c}")).alias(f"asof_{c}")
            for c in payload_cols
        ],
        F.when(in_tol, F.col("_m._r_ts")).alias("asof_ts"),
    )
    return out
