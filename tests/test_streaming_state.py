"""Stateful streaming sessionization (applyInPandasWithState): a session
spans micro-batches, closes on gap within arriving data, and an IDLE user's
open session is flushed by the event-time timeout when the watermark passes
last_event + gap."""

from __future__ import annotations

import os
from datetime import datetime

from complete_ocr_spark.streaming.stateful import run_streaming_sessions

SCHEMA = "user_id bigint, ts timestamp, value double"


def _ts(h, m, s=0):
    return datetime(2026, 1, 1, h, m, s)


def _us(h, m, s=0):
    return int(_ts(h, m, s).timestamp() * 1_000_000)


def _run(spark, src, out, ckpt, delay="10 minutes"):
    q = run_streaming_sessions(
        spark, source_dir=src + "/*", out_dir=out, checkpoint_dir=ckpt,
        schema=SCHEMA, watermark_delay=delay,
    )
    q.awaitTermination(300)


def _sessions(spark, out):
    return sorted(
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    )


def test_sessions_span_batches_and_idle_timeout_flushes(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def write(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f"{src}/{name}")

    # batch 1: user 1 starts a session
    write("f1", [(1, _ts(10, 0), 1.0), (1, _ts(10, 10), 0.5)])
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == []  # session still open

    # batch 2: same session continues ACROSS the micro-batch boundary
    write("f2", [(1, _ts(10, 20), 2.0)])
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == []

    # batch 3: user 2 at 12:00 advances the watermark to 11:50, which passes
    # user 1's timeout (10:20 + 30 min = 10:50) -> idle session flushes with
    # NO new event from user 1
    write("f3", [(2, _ts(12, 0), 7.0)])
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == [
        (1, _us(10, 0), _us(10, 20), 3, 3.5),
    ]

    # batch 4: user 1 returns (fresh session — old state was removed) and
    # closes it within the same batch by exceeding the gap in-data; user 3 at
    # 15:00 advances the watermark past everything still open
    write("f4", [(1, _ts(13, 0), 1.0), (1, _ts(13, 5), 1.0),
                 (1, _ts(14, 0), 4.0)])
    _run(spark, src, out, ckpt)
    write("f5", [(3, _ts(15, 0), 0.0)])
    _run(spark, src, out, ckpt)
    got = _sessions(spark, out)
    assert (1, _us(13, 0), _us(13, 5), 2, 2.0) in got   # closed by in-data gap
    assert (1, _us(14, 0), _us(14, 0), 1, 4.0) in got   # closed by timeout
    assert (2, _us(12, 0), _us(12, 0), 1, 7.0) in got   # idle flush of user 2
    # user 3's own session is still open
    assert not any(u == 3 for (u, *_rest) in got)


def test_out_of_order_events_across_batches(spark, tmp_path):
    """The review scenario: an on-time but out-of-order event arriving in a
    later micro-batch must extend the open session without regressing its
    end — a following event within gap of the TRUE max must not split."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def write(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f"{src}/{name}")

    # batch 1: 10:00 and 10:10 (watermark after: 10:00)
    write("f1", [(1, _ts(10, 0), 1.0), (1, _ts(10, 10), 0.5)])
    _run(spark, src, out, ckpt)
    # batch 2: 10:02 arrives LATE but on-time (>= watermark 10:00) plus
    # 10:38 — within gap of the true last (10:10 + 30min) -> same session
    write("f2", [(1, _ts(10, 2), 2.0), (1, _ts(10, 38), 4.0)])
    _run(spark, src, out, ckpt)
    # close everything via a far-future clock advance
    write("f3", [(9, _ts(23, 0), 0.0)])
    _run(spark, src, out, ckpt)
    got = [s for s in _sessions(spark, out) if s[0] == 1]
    assert got == [(1, _us(10, 0), _us(10, 38), 4, 7.5)]


def test_out_of_order_bridging_merges_open_intervals(spark, tmp_path):
    """An event landing between two open intervals, within gap of both,
    must merge them into one session (counts and sums combine)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def write(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f"{src}/{name}")

    # two intervals 50 min apart (gap 30min): [10:00] and [10:50]; a 60-min
    # watermark delay keeps the later bridging event on-time
    write("f1", [(1, _ts(10, 0), 1.0), (1, _ts(10, 50), 1.0)])
    _run(spark, src, out, ckpt, delay="60 minutes")
    # 10:25 is within 30min of both 10:00 and 10:50 -> bridges them
    write("f2", [(1, _ts(10, 25), 1.0)])
    _run(spark, src, out, ckpt, delay="60 minutes")
    write("f3", [(9, _ts(23, 0), 0.0)])
    _run(spark, src, out, ckpt, delay="60 minutes")
    got = [s for s in _sessions(spark, out) if s[0] == 1]
    assert got == [(1, _us(10, 0), _us(10, 50), 3, 3.0)]


def test_merge_event_equals_batch_gap_partition_any_order():
    """Property: after inserting ANY permutation of events, the open-interval
    set equals the batch gap-partition of those events (extents, counts,
    sums) — the invariant the streaming operator's correctness rests on."""
    from hypothesis import given, settings, strategies as st

    from complete_ocr_spark.streaming.stateful import _merge_event

    GAP = 100

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40),
        st.randoms(use_true_random=False),
    )
    def check(times, rnd):
        events = [(t, 1.0) for t in times]
        rnd.shuffle(events)
        intervals: list = []
        for t, v in events:
            _merge_event(intervals, t, v, GAP)
        # brute-force gap partition of the sorted events
        want = []
        for t in sorted(times):
            if want and t - want[-1][1] <= GAP:
                want[-1][1] = max(want[-1][1], t)
                want[-1][2] += 1
            else:
                want.append([t, t, 1])
        got = sorted((iv[0], iv[1], iv[2]) for iv in intervals)
        assert got == [tuple(w) for w in want]
        # pairwise > gap separation invariant
        for a, b in zip(got, got[1:]):
            assert b[0] - a[1] > GAP

    check()
