"""Shuffle-bounded per-group top-k (SURVEY §7 risk register: "per-group
top-k at scale — rank-window shuffles everything; use bounded heaps").

A plain ``row_number() OVER (PARTITION BY g ORDER BY s)`` shuffles and
sorts EVERY input row on g before discarding all but k per group — at
100 TB the shuffle is the whole job. ``grouped_topk`` runs a map-side
prune first: each input partition keeps at most k rows per group it has
seen (a bounded heap, vectorized as a per-Arrow-batch pandas
sort+group-head), so the shuffle carries at most ``k × partitions`` rows
per group — independent of input size. The global rank window then runs
on the pruned remainder. Results are bit-identical to the plain window
(the global top-k under a total order is contained in every partition's
local top-k), verified by the ``top_orders_per_customer`` DuckDB oracle
entry which is backed by this operator.

The same two-phase discipline already runs inside the search funnel's
broadcast kernel (plans/searcher.py: chunk-local ``prune_to`` before the
rank window); this operator is the reusable relational form.

Measured trade (local[32], 20M rows, k=3): the plain window wins ~2×
single-node (3-5s vs 5-6s at 100-1000 groups) because a local shuffle is
memory-speed while the prune pays Arrow transfer of every input row. The
prune's win condition is a real cluster where the exchange is network-
bound and rows/group ≫ k × partitions: shuffle volume drops from N rows
to ≤ k × partitions × groups. ``local_prune=False`` skips the prune and
degrades to the plain window for single-node / low-fan-in shapes.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk(df: DataFrame, group_cols: Sequence[str], order_col: str,
                 k: int, *, descending: bool = True,
                 tie_cols: Sequence[str] = (),
                 rank_col: str | None = "rank",
                 local_prune: bool = True) -> DataFrame:
    """Top-k rows per group under (order_col, *tie_cols) — bit-identical to
    a row_number window, with map-side bounded pruning.

    tie_cols break order ties ascending (make the order total for
    deterministic results — the gotcha every reference top-k handles with
    (score DESC, id ASC)). rank_col=None omits the rank column.
    """
    import pandas as pd  # noqa: F401 — documents the map-side engine

    group_cols = list(group_cols)
    tie_cols = list(tie_cols)
    by = group_cols + [order_col] + tie_cols
    asc = [True] * len(group_cols) + [not descending] + [True] * len(tie_cols)
    cols = df.columns

    def prune(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # running bounded heap per partition: fold every Arrow batch into
        # an accumulator that never exceeds k rows per group seen, so both
        # memory and shuffle output are O(k × groups-in-partition)
        import pandas as pd

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            merged = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                merged.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(group_cols, sort=False)
                .head(k)
            )
        if acc is not None:
            yield acc

    pruned = df.mapInPandas(prune, schema=df.schema) if local_prune else df
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    order += [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = pruned.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    if rank_col is None:
        return ranked.drop("_rk")
    return ranked.select(*cols, F.col("_rk").alias(rank_col))
