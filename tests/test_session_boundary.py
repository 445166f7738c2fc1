"""Pin the exact-gap boundary of the three sessionization operators.

All three MERGE an event exactly ``gap`` after the previous one:

* native session_window: extents print half-open [start, last + gap), but
  Spark merges TOUCHING windows, so the exact-gap event continues the
  session (break at diff > gap) — measured here, not assumed;
* lag+sum batch sessionizer (q_sessionize_events): breaks at diff > gap;
* streaming stateful operator (_merge_event): merges at diff <= gap.

Writing this test found a real bug: the q_session_windows DuckDB oracle
originally broke at ``>= gap`` (claiming half-open semantics), which no
registry run caught because the sf events table has no exact-gap pair. The
oracle now breaks at ``> gap`` and this test pins the native operator AND
the oracle to the same boundary on an exact-gap fixture.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Window as W, functions as F

from complete_ocr_spark.streaming.stateful import _merge_event

GAP_US = 1_800_000_000  # 30 min — queries.SESSION_GAP_US
T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events_df(spark):
    # three events: t0, t0 + exactly gap, t0 + 3*gap (the last is a clear
    # second/third session under every boundary convention)
    rows = [
        (1, T0, 1.0),
        (1, T0 + timedelta(microseconds=GAP_US), 2.0),
        (1, T0 + timedelta(microseconds=3 * GAP_US), 3.0),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


def test_native_session_window_merges_at_exact_gap(spark):
    e = _events_df(spark)
    gap = f"{GAP_US // 1_000_000} seconds"
    sessions = (
        e.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("last"))
        .collect()
    )
    # exact-gap event merged into the first window -> sessions of 2 and 1
    assert sorted(r["n"] for r in sessions) == [1, 2]
    # window end = last event + gap (the extent the oracle reproduces)
    for r in sessions:
        end_us = int(r["session_window"]["end"].timestamp() * 1_000_000)
        last_us = int(r["last"].timestamp() * 1_000_000)
        assert end_us == last_us + GAP_US


def test_session_windows_oracle_matches_native_on_exact_gap(spark, tmp_path):
    """Run q_session_windows AND its DuckDB oracle over the exact-gap fixture
    (as an events table) and compare rows — the registry check at sf cannot
    reach this boundary."""
    import duckdb

    from complete_ocr_spark.queries import SQL_SESSION_WINDOWS, q_session_windows

    events = _events_df(spark).withColumn(
        "event_id", F.monotonically_increasing_id()
    ).withColumn("event_type", F.lit("click"))
    path = str(tmp_path / "events.parquet")
    events.coalesce(1).write.parquet(path)

    sdf = q_session_windows(spark, str(tmp_path))
    s_rows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}/*.parquet'")
    d_rows = sorted(tuple(r) for r in con.sql(SQL_SESSION_WINDOWS).fetchall())
    con.close()
    assert len(s_rows) == 2  # the exact-gap pair merged + the far event
    assert s_rows == d_rows


def test_lag_sum_sessionizer_merges_at_exact_gap(spark):
    e = _events_df(spark).withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    w = W.partitionBy("user_id").orderBy("ts_us")
    brk = F.when(F.col("ts_us") - F.lag("ts_us").over(w) > GAP_US, 1).otherwise(0)
    sessions = (
        e.withColumn("sid", F.sum(brk).over(w))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # exact-gap event stays in session 0 -> sessions of 2 and 1 events
    assert sorted(r["n"] for r in sessions) == [1, 2]


def test_streaming_merge_event_merges_at_exact_gap():
    intervals: list[list] = []
    t0 = 1_000_000
    _merge_event(intervals, t0, 1.0, GAP_US)
    _merge_event(intervals, t0 + GAP_US, 2.0, GAP_US)  # exactly gap: merges
    assert len(intervals) == 1 and intervals[0][2] == 2
    _merge_event(intervals, t0 + 2 * GAP_US + 1, 3.0, GAP_US)  # gap+1: new
    assert len(intervals) == 2
