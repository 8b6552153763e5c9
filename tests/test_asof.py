"""asof_join_backward (operators/asof.py): independent reference =
pandas.merge_asof (backward, allow_exact_matches=True), on randomized
key/ts data including exact-ts ties and keys with no right rows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from next_plaid_spark.operators.asof import asof_join_backward


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "ts": rng.integers(0, 1000, n_l),
        "lid": np.arange(n_l),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, n_r),  # keys 10/11 have no right rows
        "ts": rng.integers(0, 1000, n_r),
        "rid": np.arange(n_r),
        "payload": rng.standard_normal(n_r).round(6),
    })
    # force some exact-ts collisions between sides and within the right side
    right.loc[:20, "ts"] = left.loc[:20, "ts"].to_numpy()
    right.loc[21:25, "ts"] = right.loc[15:19, "ts"].to_numpy()
    right.loc[21:25, "k"] = right.loc[15:19, "k"].to_numpy()
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    return left, right, ldf, rdf


def _pandas_asof(left, right, tolerance=None):
    # dedupe right per (k, ts) to the max rid — the operator's documented
    # tie rule (running last under event-id order); merge_asof itself takes
    # the last row in sort order, so pre-sorting by rid makes them agree
    r = right.sort_values(["k", "ts", "rid"]).drop_duplicates(
        ["k", "ts"], keep="last"
    )
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        r[["k", "ts", "rid", "payload"]]
        .rename(columns={"ts": "r_ts"})
        .sort_values("r_ts", kind="stable"),
        left_on="ts", right_on="r_ts", by="k",
        direction="backward", allow_exact_matches=True,
        tolerance=tolerance,
    )
    return {
        int(row.lid): (
            None if pd.isna(row.payload) else round(float(row.payload), 6),
            None if pd.isna(row.r_ts) else int(row.r_ts),
        )
        for row in out.itertuples()
    }


def test_matches_pandas_merge_asof(frames):
    left, right, ldf, rdf = frames
    got_rows = asof_join_backward(
        ldf, rdf, keys=["k"], ts_col="ts", payload_cols=["payload"],
        tie_col="rid",
    ).collect()
    got = {
        int(r.lid): (
            None if r.asof_payload is None else round(float(r.asof_payload), 6),
            None if r.asof_ts is None else int(r.asof_ts),
        )
        for r in got_rows
    }
    want = _pandas_asof(left, right)
    assert got == want
    assert len(got) == len(left)  # every left row survives


def test_tolerance(frames):
    left, right, ldf, rdf = frames
    tol = 50
    got = {
        int(r.lid): (
            None if r.asof_payload is None else round(float(r.asof_payload), 6),
            None if r.asof_ts is None else int(r.asof_ts),
        )
        for r in asof_join_backward(
            ldf, rdf, keys=["k"], ts_col="ts", payload_cols=["payload"],
            tie_col="rid", tolerance=tol,
        ).collect()
    }
    want = _pandas_asof(left, right, tolerance=tol)
    assert got == want


def test_asof_empty_right_side(spark):
    left = spark.createDataFrame(
        [(1, 10, 100)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame([], "k long, ts long, payload double")
    rows = asof_join_backward(
        left, right, keys=["k"], ts_col="ts", payload_cols=["payload"]
    ).collect()
    assert len(rows) == 1
    assert rows[0].asof_payload is None and rows[0].asof_ts is None


def test_asof_empty_left_side(spark):
    left = spark.createDataFrame([], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 5, 2.0)], "k long, ts long, payload double"
    )
    assert asof_join_backward(
        left, right, keys=["k"], ts_col="ts", payload_cols=["payload"]
    ).count() == 0


def test_null_payload_is_matched_not_skipped(spark):
    """A right row whose payload is genuinely NULL must BE the match
    (merge_asof returns the latest row's NULL), not be skipped for an
    older row's non-null value; and with several payload columns every
    asof_<c> must come from the SAME matched row."""
    left = spark.createDataFrame(
        [(1, 100, 0), (1, 250, 1)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [
            # (k, ts, rid, a, b): at ts=90 both set; at ts=200 a is NULL
            (1, 90, 0, 10.0, "old"),
            (1, 200, 1, None, "new"),
        ],
        "k long, ts long, rid long, a double, b string",
    )
    rows = {
        r.lid: r
        for r in asof_join_backward(
            left, right, keys=["k"], ts_col="ts",
            payload_cols=["a", "b"], tie_col="rid",
        ).collect()
    }
    # lid 0 matches ts=90 (both values from that row)
    assert rows[0].asof_a == 10.0 and rows[0].asof_b == "old"
    assert rows[0].asof_ts == 90
    # lid 1 matches ts=200 atomically: a is the faithful NULL, b is "new"
    assert rows[1].asof_a is None and rows[1].asof_b == "new"
    assert rows[1].asof_ts == 200
