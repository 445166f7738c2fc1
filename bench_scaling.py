#!/usr/bin/env python3
"""Two-cluster-size scaling protocol (BASELINE.md §3).

No multi-node cluster exists in this sandbox, so the north_rule's N vs 4N
executor criterion is evidenced by running the identical job at two local
parallelism levels on the same input:

    N  = local[8]    4N = local[32]

Each level runs bench.py (extraction only, min of 2 measured runs) in its own
process so JVMs don't share state. Prints one JSON line:
{"docs_per_sec_n8": ..., "docs_per_sec_n32": ..., "scaling_efficiency": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_DOCS = int(os.environ.get("BENCH_N_DOCS", "16000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int) -> dict:
    """One cluster size: the WHOLE process tree (JVM task threads, GC, Python
    workers, shuffle IO) is pinned to exactly `cpus` CPUs via taskset — a
    local[N] JVM otherwise borrows unpinned cores for its Python workers and
    GC, which overstates small-N throughput and understates scaling."""
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_N_DOCS=str(N_DOCS),
        BENCH_EXTRACT_ONLY="1",
    )
    cmd = [sys.executable, os.path.join(HERE, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    """Interleave the two levels and keep the best run of each: the sandbox is
    a shared VM with bursty steal time, so single runs swing ±30%; best-of-k
    isolates the engine's scaling from the neighbor noise."""
    reps = int(os.environ.get("BENCH_SCALING_REPS", "3"))
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run_level(8))
        hi_runs.append(run_level(32))
    lo = max(lo_runs, key=lambda r: r["docs_per_sec"])
    hi = max(hi_runs, key=lambda r: r["docs_per_sec"])
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    print(
        json.dumps(
            {
                "n_docs": N_DOCS,
                "reps": reps,
                "docs_per_sec_n8": lo["docs_per_sec"],
                "docs_per_sec_n32": hi["docs_per_sec"],
                "docs_per_sec_n8_all": [r["docs_per_sec"] for r in lo_runs],
                "docs_per_sec_n32_all": [r["docs_per_sec"] for r in hi_runs],
                "extract_sec_n8": lo["queries"]["extract_pipeline"],
                "extract_sec_n32": hi["queries"]["extract_pipeline"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
