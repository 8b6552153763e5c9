"""grouped_topk (operators/topk_agg.py): bit-identity with the plain rank
window, on skew, ties, and k > group size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.operators.topk_agg import grouped_topk


def _window_topk(df, k):
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("id").asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@pytest.fixture(scope="module")
def skewed(spark):
    # group 0 holds ~90% of rows (the skew case where map-side pruning
    # matters most); deterministic synthetic scores with heavy ties
    df = spark.range(0, 20_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id") % 97).alias("g"),
        (F.col("id") % 17).cast("double").alias("s"),
    )
    return df.repartition(8).cache()


@pytest.mark.parametrize("k", [1, 3, 50])
def test_matches_window(spark, skewed, k):
    got = sorted(
        tuple(r) for r in grouped_topk(
            skewed, ["g"], "s", k, tie_cols=["id"]
        ).select("g", "id", "s", "rank").collect()
    )
    want = sorted(
        tuple(r) for r in _window_topk(skewed, k)
        .select("g", "id", "s", "rank").collect()
    )
    assert got == want


def test_k_exceeds_group_size(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 4.0), (1, 3, 1.0)], "g long, id long, s double"
    )
    got = grouped_topk(df, ["g"], "s", 10, tie_cols=["id"])
    assert got.count() == 3
    assert got.filter("g = 0 and rank = 2").select("id").collect()[0][0] == 2


def test_ascending_and_no_rank(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 4.0), (0, 3, 6.0)], "g long, id long, s double"
    )
    got = grouped_topk(df, ["g"], "s", 1, descending=False,
                       tie_cols=["id"], rank_col=None)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["id"] == 2
    assert "rank" not in got.columns and "_rk" not in got.columns
