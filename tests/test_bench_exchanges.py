"""Pin the cache-aware exchange counter (VERDICT r11 watch item 1).

The r10 string counter (``plan.toString().count("Exchange") -
count("ReusedExchange")``) double-counts cached subtrees: every
InMemoryTableScan consumer prints the FULL cached plan inline (with its
own nested AQE Final+Initial sections) and emits no ReusedExchange marks,
so adding a second multi-consumer ``.cache()`` to the funnel (the r11 Q7
survivor-cut cache, plans/searcher.py:1044) moved the bench batch500
reading 16/17 -> 28/29 with no real plan change. ``bench._exchanges``
now walks the physical tree: each Exchange counts once, ReusedExchange
zero, and each distinct cached relation's materialized plan is descended
exactly once (keyed by the shared cached-plan node), matching what
actually executes.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from bench import _exchanges


def _naive(df) -> int:
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.count("Exchange") - s.count("ReusedExchange")


def test_cached_subtree_counted_once(spark):
    # a cached shuffle (groupBy) consumed by TWO downstream shuffling
    # consumers: the cached subtree's exchange must count once, not once
    # per consumer and not once per AQE Final/Initial print.
    base = (
        spark.range(0, 2000)
        .withColumn("k", F.col("id") % 37)
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
        .cache()
    )
    try:
        left = base.withColumnRenamed("s", "s1")
        right = base.groupBy((F.col("k") % 5).alias("k5")).agg(
            F.sum("s").alias("s2")
        )
        joined = left.join(right, left.k % 5 == right.k5)
        joined.collect()

        n = _exchanges(joined)
        # real materialized DAG: 1 exchange inside the cached plan
        # (groupBy k), 1 for the right-side re-agg, plus the join
        # distribution (broadcast or shuffle) — a handful, and strictly
        # fewer than the consumer-multiplied string count.
        assert 2 <= n <= 6, n
        assert n < _naive(joined)
    finally:
        base.unpersist()


def test_uncached_plan_matches_shuffle_structure(spark):
    # no caches -> the walk is just "count Exchange nodes of the final
    # AQE plan once": a single groupBy is exactly one exchange.
    df = spark.range(0, 1000).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    assert _exchanges(df) == 1


def test_reused_exchange_not_counted(spark):
    # self-join on the same aggregated side: AQE emits ReusedExchange for
    # the identical subtree; the counter must not count the reuse.
    agg = spark.range(0, 4000).groupBy((F.col("id") % 11).alias("k")).count()
    j = agg.alias("a").join(agg.alias("b"), "k")
    j.collect()
    s = j._jdf.queryExecution().executedPlan().toString()
    n = _exchanges(j)
    if "ReusedExchange" in s:
        # one agg exchange (reused), plus the join's own distribution
        assert n <= 3, n
