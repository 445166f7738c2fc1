#!/usr/bin/env python3
"""Round-7 same-session A/Bs (round-6 verdict #5 and #6), interleaved
best-of-K in ONE Spark session so VM session noise cancels:

A) q_corpus_curation under the round-6 curate.py vs the round-7 refactor
   (shared annotate_gates/heuristic_reason helpers + the media-tier hook)
   at sf0.1 — pins that the refactor is perf-neutral, so any BENCH_r07 vs
   BENCH_r06 curation delta is session noise, readable off the canary.
B) avg_hash pooling: round-6 per-cell Python double loop vs the round-7
   int64 integral-image + vectorized bit pack, timed through the real
   media_phash/frame_phash kernels over a synthetic 12k-image + 800-video
   media table (the committed 133-row fixture is too small to time).

Usage: python3 scripts/ab_r7.py  (prints one JSON line)
R6 sources must be extracted first:
  git show <r6-sha>:complete_ocr_spark/functions/curate.py > /tmp/r6_curate_src.py
  git show <r6-sha>:complete_ocr_spark/functions/media_dedup.py > /tmp/r6_media_src.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def _load(name: str, path: str):
    """Materialize an extracted round-6 module file INSIDE the package (so
    Spark WORKERS can unpickle kernel closures that reference it by module
    name — a driver-only importlib module dies with ModuleNotFoundError in
    the executor), with its relative imports (.dedup, .text, .multimodal)
    resolving against the CURRENT package — isolating exactly the
    file-under-test's delta. Callers must _cleanup() afterwards; these
    temp files are never committed."""
    import shutil

    pkg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "complete_ocr_spark", "functions",
    )
    dst = os.path.join(pkg_dir, f"{name}.py")
    shutil.copyfile(path, dst)
    _TEMP_FILES.append(dst)
    return importlib.import_module(f"complete_ocr_spark.functions.{name}")


_TEMP_FILES: list[str] = []


def _cleanup() -> None:
    for p in _TEMP_FILES:
        try:
            os.remove(p)
        except OSError:
            pass


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from complete_ocr_spark.config import build_spark
    from complete_ocr_spark.functions import curate as curate_r7
    from complete_ocr_spark.functions import media_dedup as media_r7
    from complete_ocr_spark import queries as Q

    curate_r6 = _load("_r6_curate_ab", "/tmp/r6_curate_src.py")
    media_r6 = _load("_r6_media_ab", "/tmp/r6_media_src.py")

    spark = build_spark(
        app_name="ab_r7", master="local[32]", shuffle_partitions=32
    )
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    kw = dict(
        languages=Q._CUR_LANGS, min_quality=Q._CUR_MIN_Q,
        max_dup_line_frac=Q._CUR_MAX_DLF, max_top_bigram_frac=Q._CUR_MAX_TBF,
        min_bigram_tokens=Q._CUR_MIN_BGT, max_symbol_ratio=Q._CUR_MAX_SYM,
        max_dup_segment_frac=Q._CUR_MAX_SEGF,
        seg_win=Q._SEG_WIN, seg_stride=Q._SEG_STRIDE,
        max_hamming=Q._SH_MAX_HAMMING, n_blocks=4,
        embeddings=e, emb_dim=Q._SRP_DIM, semantic_threshold=Q._CUR_SEM_THR,
        sem_bits=Q._CUR_SEM_BITS, sem_tables=Q._CUR_SEM_TABLES,
    )
    sel = ("doc_id", "lang", "quality", "n_tokens", "dup_line_frac",
           "top_bigram_frac", "sym_ratio", "keep", "drop_reason")

    def run_curate(mod):
        mod.curate_corpus(d, "doc_id", "text", **kw).select(*sel).write.format(
            "noop"
        ).mode("overwrite").save()

    # synthetic media for the kernel A/B: n images + videos, bytes from a
    # cheap deterministic keystream (decode cost dominates either way)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(12000):
        w = h = 64
        rows.append((f"img-{i:06d}", w, h, 1,
                     rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()))
    for i in range(800):
        w = h = 48
        nf = 8
        rows.append((f"vid-{i:05d}", w, h, nf,
                     rng.integers(0, 256, nf * w * h,
                                  dtype=np.uint8).tobytes()))
    media = spark.createDataFrame(
        rows,
        "media_ref string, width int, height int, n_frames int, payload binary",
    ).localCheckpoint()
    print(f"media rows: {media.count()}", file=sys.stderr)

    def run_media(mod):
        mod.media_phash(media).write.format("noop").mode("overwrite").save()
        mod.frame_phash(media).write.format("noop").mode("overwrite").save()

    arms = {
        "curate_r6": lambda: run_curate(curate_r6),
        "curate_r7": lambda: run_curate(curate_r7),
        "avg_hash_r6": lambda: run_media(media_r6),
        "avg_hash_r7": lambda: run_media(media_r7),
    }
    for fn in arms.values():  # warm pass, unmeasured
        fn()
    times: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(REPS):
        for k, fn in arms.items():  # interleaved
            t0 = time.perf_counter()
            fn()
            times[k].append(round(time.perf_counter() - t0, 3))
    # value parity inside the same session, both A/Bs
    r6c = curate_r6.curate_corpus(d, "doc_id", "text", **kw).select(*sel)
    r7c = curate_r7.curate_corpus(d, "doc_id", "text", **kw).select(*sel)
    curate_equal = (
        r6c.exceptAll(r7c).isEmpty() and r7c.exceptAll(r6c).isEmpty()
    )
    m6 = media_r6.media_phash(media)
    m7 = media_r7.media_phash(media)
    media_equal = m6.exceptAll(m7).isEmpty() and m7.exceptAll(m6).isEmpty()
    out = {
        "reps": times,
        "best": {k: min(v) for k, v in times.items()},
        "curate_values_equal": curate_equal,
        "avg_hash_values_equal": media_equal,
        "sf_dir": SF_DIR,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    finally:
        _cleanup()
