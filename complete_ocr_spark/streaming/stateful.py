"""Custom stateful streaming operator: cross-batch gap sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a window function (q_sessionize_events);
on a live feed a user's session spans micro-batches, so the operator keeps
the OPEN session per user as typed GroupState:

* arriving events extend the open session or close it (gap exceeded) — a
  closed session is emitted exactly once, append-mode;
* an idle user's open session is closed by an EVENT-TIME TIMEOUT: when the
  watermark passes ``last_event + gap`` the state times out and the session
  flushes without any new event from that user — the piece a pure windowed
  aggregation cannot express (session windows have data-driven extents).

State per user is one 4-tuple regardless of stream length; the shuffle is
the groupBy(user) hash partition — both bounded, so the operator holds at
10^12 events. Arrow moves each group's batch rows into pandas; the per-group
fold is the same sequential arithmetic as the batch oracle, so closed
sessions match a batch recomputation exactly (tests/test_streaming_state.py).
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
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, sum_value double"
DEFAULT_GAP_US = 1_800_000_000  # 30 min, matching queries.SESSION_GAP_US


def make_session_fn(gap_us: int = DEFAULT_GAP_US):
    """applyInPandasWithState body: (user_id) group -> closed-session rows."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        user = int(key[0])
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            closed.append((user, start, last, n, sv))
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
            order = ts_us.argsort(kind="stable")
            vals = rows["value"].to_numpy()
            if state.exists:
                start, last, n, sv = state.get
            else:
                start = None
            for i in order:
                t, v = int(ts_us[i]), float(vals[i])
                if start is None:
                    start, last, n, sv = t, t, 1, v
                elif t - last > gap_us:
                    closed.append((user, start, last, n, sv))
                    start, last, n, sv = t, t, 1, v
                else:
                    last, n, sv = t, n + 1, sv + v
            state.update((start, last, n, sv))
            # event-time timeout: fire when the watermark passes last + gap
            state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            closed,
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
