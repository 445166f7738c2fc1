"""Custom stateful streaming operator: cross-batch gap sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a window function (q_sessionize_events);
on a live feed a user's session spans micro-batches, so the operator keeps
the user's OPEN sessions as typed GroupState:

* state = the set of open session intervals (start, last, n, sum) — a SET,
  not a single session, because on-time events may arrive out of order
  across micro-batches: an event can extend an interval on either side
  (within ``gap`` of [start, last]), open an earlier disjoint interval, or
  BRIDGE two intervals into one (counts and sums combine);
* a session is emitted exactly once, when the watermark passes
  ``last + gap`` strictly — from then on every on-time event t satisfies
  t >= watermark > last + gap, so nothing that could still extend or merge
  into an emitted session can ever arrive (the append-mode safety argument);
* an idle user's sessions flush via EVENT-TIME TIMEOUT (no new event
  needed) — the data-driven extent a fixed windowed aggregation cannot
  express.

Emitted (start, end, n_events) extents and counts equal a batch gap-
sessionization of the on-time events under ANY within-watermark disorder
(tested); float ``sum_value`` is summed in arrival/merge order, so it can
differ from a batch recomputation in the last ulp — ingest values as
decimals where exactness matters, as the batch queries do.

State per user is bounded by the number of open intervals (disorder window /
gap, typically 1); the shuffle is the groupBy(user) hash partition — both
bounded, so the operator holds at 10^12 events.

Exact-gap boundary: an event exactly ``gap`` after an interval's last event
MERGES into it (diff <= gap), matching both the batch lag+sum sessionizer
(q_sessionize_events breaks at diff > gap) and Spark's native session_window
(which merges touching windows) — tests/test_session_boundary.py pins all
three to the same boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id bigint, start_us bigint, end_us bigint, n_events bigint, sum_value double"
)
SESSION_STATE_SCHEMA = (
    "starts array<bigint>, lasts array<bigint>, ns array<bigint>, sums array<double>"
)
DEFAULT_GAP_US = 1_800_000_000  # 30 min, matching queries.SESSION_GAP_US


def _merge_event(intervals: list[list], t: int, v: float, gap_us: int) -> None:
    """Insert event t into the open-interval set (each [start, last, n, sum]),
    extending / bridging any intervals within gap of it."""
    touched = [iv for iv in intervals
               if iv[0] - gap_us <= t <= iv[1] + gap_us]
    if not touched:
        intervals.append([t, t, 1, v])
        intervals.sort(key=lambda iv: iv[0])
        return
    merged = touched[0]
    merged[0] = min(merged[0], t)
    merged[1] = max(merged[1], t)
    merged[2] += 1
    merged[3] += v
    for iv in touched[1:]:  # t bridged several intervals -> combine them
        merged[0] = min(merged[0], iv[0])
        merged[1] = max(merged[1], iv[1])
        merged[2] += iv[2]
        merged[3] += iv[3]
        intervals.remove(iv)


def make_session_fn(gap_us: int = DEFAULT_GAP_US):
    """applyInPandasWithState body: (user_id) group -> closed-session rows."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        user = int(key[0])
        if state.exists:
            starts, lasts, ns, sums = state.get
            intervals = [list(iv) for iv in zip(starts, lasts, ns, sums)]
        else:
            intervals = []
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
            vals = rows["value"].to_numpy()
            for i in ts_us.argsort(kind="stable"):
                _merge_event(intervals, int(ts_us[i]), float(vals[i]), gap_us)
        # flush every interval the watermark has strictly passed: future
        # on-time events have t >= wm, so t - last > gap for these — closed
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [iv for iv in intervals if iv[1] + gap_us < wm_us]
        intervals = [iv for iv in intervals if iv[1] + gap_us >= wm_us]
        if intervals:
            state.update((
                [iv[0] for iv in intervals],
                [iv[1] for iv in intervals],
                [iv[2] for iv in intervals],
                [iv[3] for iv in intervals],
            ))
            fire_ms = min(iv[1] for iv in intervals) // 1000 + gap_us // 1000
            # Spark requires the timeout to sit beyond the current watermark
            state.setTimeoutTimestamp(max(fire_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        yield pd.DataFrame(
            [(user, iv[0], iv[1], iv[2], iv[3]) for iv in sorted(closed)],
            columns=["user_id", "start_us", "end_us", "n_events", "sum_value"],
        )

    return fn


def run_streaming_sessions(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
    gap_us: int = DEFAULT_GAP_US,
    watermark_delay: str = "10 minutes",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Stream (user_id, ts, value) event files into closed-session rows."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    sessions = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_us),
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
