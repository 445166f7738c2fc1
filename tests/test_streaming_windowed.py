"""Watermarked tumbling-window aggregation: a window is emitted exactly once
(when the watermark passes its end), late events beyond the watermark are
dropped instead of corrupting emitted windows, and still-open windows stay in
state."""

from __future__ import annotations

import os
from datetime import datetime

from complete_ocr_spark.streaming.windowed import (
    run_windowed_event_counts,
    windowed_event_counts,
)

SCHEMA = "ts timestamp, event_type string, value double"


def _ts(h, m, s=0):
    return datetime(2026, 1, 1, h, m, s)


def _run(spark, src, out, ckpt):
    q = run_windowed_event_counts(
        spark, source_dir=src + "/*", out_dir=out, checkpoint_dir=ckpt,
        schema=SCHEMA,
    )
    q.awaitTermination(300)


def _read_out(spark, out):
    return {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }


def test_window_emits_once_and_drops_late_events(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def write(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f"{src}/{name}")

    us = lambda h, m: int(_ts(h, m).timestamp() * 1_000_000)

    # batch 1: the 10:00-10:05 window fills (watermark still at epoch)
    write("f1", [(_ts(10, 0, 30), "click", 1.0),
                 (_ts(10, 1, 30), "view", 2.5),
                 (_ts(10, 2, 0), "click", 0.5)])
    _run(spark, src, out, ckpt)

    # batch 2: 10:30 event -> watermark becomes 10:20 AFTER this batch
    write("f2", [(_ts(10, 30, 10), "click", 3.0)])
    _run(spark, src, out, ckpt)

    # batch 3: a LATE 10:01 event (behind the 10:20 watermark -> dropped)
    # plus an 11:00 event that advances the watermark to 10:50 — availableNow
    # runs a final flush batch, so both the 10:00 and 10:30 windows emit here
    write("f3", [(_ts(10, 1, 0), "click", 99.0),
                 (_ts(11, 0, 0), "view", 1.0)])
    _run(spark, src, out, ckpt)
    got3 = _read_out(spark, out)
    assert got3[(us(10, 0), "click")] == (2, 1.5)  # 99.0 NOT included
    assert got3[(us(10, 0), "view")] == (1, 2.5)
    assert got3[(us(10, 30), "click")] == (1, 3.0)
    assert (us(11, 0), "view") not in got3  # its window is still open

    # batch 4: clock-advancing event closes the 11:00 window; 12:00 stays open
    write("f4", [(_ts(12, 0, 0), "click", 1.0)])
    _run(spark, src, out, ckpt)
    got4 = _read_out(spark, out)
    assert got4[(us(11, 0), "view")] == (1, 1.0)
    assert (us(12, 0), "click") not in got4  # still held in state

    # emitted rows equal a batch recomputation over the ON-TIME events
    batch = windowed_event_counts(
        spark.createDataFrame(
            [(_ts(10, 0, 30), "click", 1.0), (_ts(10, 1, 30), "view", 2.5),
             (_ts(10, 2, 0), "click", 0.5), (_ts(10, 30, 10), "click", 3.0),
             (_ts(11, 0, 0), "view", 1.0)],
            SCHEMA,
        )
    )
    want = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got4 == want
