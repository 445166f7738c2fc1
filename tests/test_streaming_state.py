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


def _run(spark, src, out, ckpt):
    q = run_streaming_sessions(
        spark, source_dir=src + "/*", out_dir=out, checkpoint_dir=ckpt,
        schema=SCHEMA,
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
