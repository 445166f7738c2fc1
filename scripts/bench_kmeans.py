#!/usr/bin/env python3
"""A/B: k-means mean-aggregation shapes (round-3 verdict #4).

perdim  — posexplode to n x dim rows, DECIMAL sums via groupBy(cell, dim)
vector  — fixed-point int64 arrays, Arrow partial-sum kernel + zip_with fold

Interleaved best-of-REPS on a synthetic vector table (this VM's noise swings
single runs ~2.5x — see BASELINE.md protocol). Usage:
    python3 scripts/bench_kmeans.py [n_vecs] [dim] [cells] [iters] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from complete_ocr_spark.config import build_spark
from complete_ocr_spark.functions import similarity

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CELLS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 3


def main() -> None:
    spark = build_spark("bench_kmeans", master="local[32]", shuffle_partitions=32)
    path = f"/tmp/bench_kmeans_vecs_{N}_{DIM}.parquet"
    if not os.path.exists(path):
        rng = np.random.RandomState(42)
        rows = [
            (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(N)
        ]
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").write.parquet(path)
    df = spark.read.parquet(path)
    cents0 = similarity.ivf_centroids(DIM, CELLS)

    def run(mode: str) -> float:
        t0 = time.perf_counter()
        similarity.ivf_train_kmeans(
            df, "vec_id", "embedding", cents0, n_iters=ITERS, agg_mode=mode
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for mode in ("perdim", "vector"):  # warm codegen/Arrow paths
        run(mode)
    times: dict[str, list[float]] = {"perdim": [], "vector": []}
    for _ in range(REPS):
        for mode in ("perdim", "vector"):  # interleaved
            times[mode].append(round(run(mode), 3))
    print(f"n={N} dim={DIM} cells={CELLS} iters={ITERS} reps={REPS}")
    for mode, ts in times.items():
        print(f"{mode:7s} best={min(ts):.3f}s all={ts}")
    print(f"speedup(best perdim / best vector) = "
          f"{min(times['perdim']) / min(times['vector']):.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
