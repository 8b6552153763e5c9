"""Events batch queries against the ACTUAL driver testdata — the fixture-
drift guard the r4 regression demanded. Every query here reads the real
``/root/testdata`` parquet (whatever ts dtype the driver regenerated it
with), executes it, and cross-checks it against the DuckDB oracle SQL the
driver will run — so a testdata dtype flip fails HERE, loudly, not in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import pytest

from next_plaid_spark import queries as q
from next_plaid_spark.functions.time import event_ts_micros, normalize_event_ts


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con.execute(sql).fetch_df()


def _cmp(spark_df, oracle_pdf, sort_cols):
    got = sorted(
        tuple(r) for r in spark_df.select(*sorted(spark_df.columns)).collect()
    )
    want = sorted(
        tuple(r) for r in
        oracle_pdf[sorted(oracle_pdf.columns)].itertuples(index=False)
    )
    assert got == want


@pytest.mark.parametrize("query,sql", [
    (q.q_events_hourly, q.SQL_EVENTS_HOURLY),
    (q.q_events_sessions, q.SQL_EVENTS_SESSIONS),
    (q.q_events_session_windows, q.SQL_EVENTS_SESSION_WINDOWS),
])
def test_events_query_matches_oracle_on_real_testdata(spark, sf_dir, query, sql):
    _cmp(query(spark, sf_dir), _oracle(sf_dir, sql), None)


def test_normalizer_handles_actual_testdata_dtype(spark, sf_dir):
    """Whatever dtype the driver shipped, the normalizer must produce
    BIGINT micros whose instants match DuckDB's epoch_us on the same file."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = normalize_event_ts(ev)
    assert dict(us.dtypes)["ts"] == "bigint"
    got = sorted(r["ts"] for r in us.orderBy("event_id").limit(50).collect())
    want = [
        r[0] for r in duckdb.sql(
            f"SELECT epoch_us(ts) FROM '{sf_dir}/events.parquet' "
            "ORDER BY event_id LIMIT 50"
        ).fetchall()
    ]
    assert got == sorted(want)


def test_normalizer_nanos_roundtrip(spark, sf_dir):
    """The legacy BIGINT-nanos path must land on the same micros."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = normalize_event_ts(ev)
    import pyspark.sql.functions as F

    nanos = base.withColumn("ts", F.col("ts") * F.lit(1000))
    again = nanos.withColumn("ts", event_ts_micros(nanos))
    a = sorted(r["ts"] for r in base.select("ts").collect())
    b = sorted(r["ts"] for r in again.select("ts").collect())
    assert a == b


def test_events_rolling_hand_computed(spark, tmp_path):
    """RANGE-frame semantics: trailing hour is CLOSED [t-1h, t] per user."""
    import os

    from next_plaid_spark.queries import _US_PER_HOUR, q_events_rolling

    rows = [
        # user 1: events at 0, 30min, 90min — third sees only itself+30min?
        (0, 1, 0, "view", 1.0),
        (1, 1, 30 * 60 * 1_000_000, "view", 2.0),
        (2, 1, 90 * 60 * 1_000_000, "view", 4.0),
        # exactly 1h after event 0 → still inside the closed frame
        (3, 2, 0, "view", 1.5),
        (4, 2, _US_PER_HOUR, "view", 2.5),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }),
        os.path.join(sf, "events.parquet"),
    )
    got = {r.event_id: (r.n_1h, r.cents_1h)
           for r in q_events_rolling(spark, sf).collect()}
    assert got[0] == (1, 100)
    assert got[1] == (2, 300)        # 0 and 30min both inside
    assert got[2] == (2, 600)        # 30min and 90min (0 fell out)
    assert got[4] == (2, 400)        # exactly-1h-ago edge is INCLUDED


def test_events_funnel_strict_sequence(spark, tmp_path):
    """A purchase BEFORE the user's first qualifying click must not count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from next_plaid_spark.queries import q_events_funnel

    MIN = 60 * 1_000_000
    rows = [
        # user 1: view@1m → click@2m → purchase@3m  (full funnel)
        (0, 1, 1 * MIN, "view"), (1, 1, 2 * MIN, "click"),
        (2, 1, 3 * MIN, "purchase"),
        # user 2: purchase@1m BEFORE view@2m/click@3m → no purchase credit
        (3, 2, 1 * MIN, "purchase"), (4, 2, 2 * MIN, "view"),
        (5, 2, 3 * MIN, "click"),
        # user 3: click@1m before view@2m → click doesn't count
        (6, 3, 1 * MIN, "click"), (7, 3, 2 * MIN, "view"),
        # user 4: only errors → counts in denominator only
        (8, 4, 1 * MIN, "error"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }),
        os.path.join(sf, "events.parquet"),
    )
    got = {r.stage: (r.n_users, r.conversion)
           for r in q_events_funnel(spark, sf).collect()}
    assert got["1_view"] == (3, 0.75)      # users 1, 2, 3
    assert got["2_click"] == (2, 0.5)      # users 1, 2 (user 3's click too early)
    assert got["3_purchase"] == (1, 0.25)  # user 1 only


def test_events_retention_hand_computed(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from next_plaid_spark.queries import _US_PER_DAY, q_events_retention

    D = _US_PER_DAY
    rows = [  # (event_id, user, ts)
        (0, 1, 0), (1, 1, 2 * D), (2, 1, 2 * D + 5),  # u1: days 0, 2
        (3, 2, 0), (4, 2, 1 * D),                      # u2: days 0, 1
        (5, 3, 1 * D),                                 # u3: day 1 cohort
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }),
        os.path.join(sf, "events.parquet"),
    )
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in q_events_retention(spark, sf).collect()}
    assert got == {
        (0, 0): 2,  # u1, u2 start day 0
        (0, 1): 1,  # u2 returns day 1
        (0, 2): 1,  # u1 returns day 2 (two events, ONE user-day)
        (1, 0): 1,  # u3 cohort day 1
    }
