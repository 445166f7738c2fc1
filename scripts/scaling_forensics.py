#!/usr/bin/env python3
"""Event-log decomposition of the N vs 4N scaling loss (BASELINE.md §3).

Runs the extraction pipeline once at a given parallelism with the Spark event
log enabled, then parses the log into a per-run accounting:

    capacity   = wall_clock x cores          (what perfect scaling buys)
    busy       = sum of task run times       (what tasks actually used)
    idle       = capacity - busy             (scheduler gaps, barriers,
                                              stragglers, driver-only phases)
    cpu        = sum of executor CPU time    (on-core work)
    gc         = sum of JVM GC time
    shuffle_io = fetch wait + shuffle write time
    runtime-cpu gap = busy - cpu - gc - shuffle_io (off-core: Python worker
                      wait is inside run time but not executor CPU)

Run at two levels (taskset-pinned) and compare the fractions: the scaling
efficiency deficit decomposes into (a) the hardware ceiling (measure with the
pure-Python pool probe below), (b) growth in idle fraction, (c) growth in
GC/shuffle fractions.

    taskset -c 0-7  python3 scripts/scaling_forensics.py 8
    taskset -c 0-31 python3 scripts/scaling_forensics.py 32

Pure-Python ceiling probe (same kernels, multiprocessing, no Spark):

    python3 scripts/scaling_forensics.py --ceiling
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("BENCH_N_DOCS", "16000"))


def ceiling() -> None:
    """Hardware ceiling: the page kernel under multiprocessing at 8 vs 32
    pinned procs (run under taskset yourself, once per level)."""
    import subprocess
    import textwrap

    code = textwrap.dedent(
        """
        import sys, time
        sys.path.insert(0, %r)
        from multiprocessing import Pool
        from complete_ocr_spark.synth import resolve_descriptor
        from complete_ocr_spark.kernels.page import extract_page_np
        def work(i):
            mr = f"synth://page/doc-{i%%4000:08d}/{i%%17}"
            return len(extract_page_np(resolve_descriptor(mr), i %% 17, mr))
        procs = int(sys.argv[1])
        with Pool(procs) as p:
            p.map(work, range(200), chunksize=10)
            t0 = time.perf_counter()
            p.map(work, range(12000), chunksize=50)
            print(procs, round(12000 / (time.perf_counter() - t0), 1))
        """
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out = {}
    for procs, pin in ((8, "0-7"), (32, "0-31")):
        r = subprocess.run(
            ["taskset", "-c", pin, sys.executable, "-c", code, str(procs)],
            capture_output=True, text=True,
        )
        p, rate = r.stdout.split()
        out[f"pages_per_sec_{p}"] = float(rate)
    out["ceiling_efficiency"] = round(
        out["pages_per_sec_32"] / (4 * out["pages_per_sec_8"]), 3
    )
    print(json.dumps(out))


def main(cpus: int) -> None:
    from complete_ocr_spark.config import build_spark
    from complete_ocr_spark.pipeline import run_extraction
    from complete_ocr_spark.synth import write_docs_parquet

    docs_path = f"/tmp/bench_docs_sf0.1_{N_DOCS}.parquet"
    if not os.path.exists(docs_path):
        write_docs_parquet(docs_path, N_DOCS, workers=os.cpu_count() or 1)
    evdir = f"/tmp/evlog_{cpus}_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    spark = build_spark(
        "forensics", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    docs = spark.read.parquet(docs_path)
    run_extraction(spark, docs.limit(400)).count()  # warm (logged, cheap)
    t_mark = int(time.time() * 1000)  # jobs after this = the measured query
    t0 = time.perf_counter()
    run_extraction(spark, docs).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()

    # Spark 4 writes a rolling dir (eventlog_v2_*/events_*); flat file otherwise
    paths = sorted(p for p in glob.glob(f"{evdir}/**", recursive=True)
                   if os.path.isfile(p) and "appstatus" not in os.path.basename(p))
    stages: dict[int, dict] = {}
    job_stages: dict[int, set] = {}
    lines = (ln for p in paths for ln in open(p))
    if True:
        for line in lines:
            e = json.loads(line)
            if e["Event"] == "SparkListenerJobStart":
                if e["Submission Time"] >= t_mark:
                    job_stages[e["Job ID"]] = {
                        s["Stage ID"] for s in e["Stage Infos"]
                    }
            if e["Event"] != "SparkListenerTaskEnd":
                continue
            m = e.get("Task Metrics") or {}
            sid = e["Stage ID"]
            s = stages.setdefault(
                sid, {"tasks": 0, "run": 0, "cpu": 0, "gc": 0, "fetch_wait": 0,
                      "shuf_write": 0, "deser": 0, "result_ser": 0},
            )
            s["tasks"] += 1
            s["run"] += m.get("Executor Run Time", 0)
            s["cpu"] += m.get("Executor CPU Time", 0) / 1e6
            s["gc"] += m.get("JVM GC Time", 0)
            s["fetch_wait"] += (m.get("Shuffle Read Metrics") or {}).get("Fetch Wait Time", 0)
            s["shuf_write"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Write Time", 0) / 1e6
            s["deser"] += m.get("Executor Deserialize Time", 0)
            s["result_ser"] += m.get("Result Serialization Time", 0)
    shutil.rmtree(evdir, ignore_errors=True)

    # keep only the measured query's jobs (AQE splits one query into several)
    measured = set().union(*job_stages.values())
    stages = {sid: s for sid, s in stages.items() if sid in measured}

    tot = {k: round(sum(s[k] for s in stages.values()) / 1000.0, 2)
           for k in ("run", "cpu", "gc", "fetch_wait", "shuf_write", "deser", "result_ser")}
    capacity = wall * cpus
    busy = tot["run"]
    out = {
        "cpus": cpus,
        "n_docs": N_DOCS,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(N_DOCS / wall, 1),
        "capacity_core_sec": round(capacity, 1),
        "busy_core_sec": busy,
        "idle_frac": round(1 - busy / capacity, 3),
        "cpu_core_sec": tot["cpu"],
        "gc_core_sec": tot["gc"],
        "shuffle_io_core_sec": round(tot["fetch_wait"] + tot["shuf_write"], 2),
        "offcore_gap_core_sec": round(busy - tot["cpu"] - tot["gc"], 2),
        "n_stages": len(stages),
        "n_tasks": sum(s["tasks"] for s in stages.values()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if sys.argv[1:] == ["--ceiling"]:
        ceiling()
    else:
        main(int(sys.argv[1]))
