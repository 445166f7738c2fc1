#!/usr/bin/env python3
"""Benchmark harness (driver contract: prints ONE JSON line at the end).

Headline: end-to-end interleaved-document extraction (scan parquet -> explode
-> branch UDFs -> reassemble -> write docs_out) — documents/sec. Plus the
heavy operator queries from the registry at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)      -> master local[N], shuffle partitions N
  BENCH_N_DOCS        (default 4000*sf/0.1) synthetic docs for the extraction leg
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    # FROZEN canary first (see _canary): cross-round session-noise anchor
    "canary",
    "q01_pricing_summary",
    "q_order_bbox",
    "q_sessionize_events",
    "q_asof_last_click",
    "q_minhash_lsh",
    "q_fingerprint_groups",
    "q_ann_topk",
    "q_embed_near_dup_srp",
    "q_simhash64",
    "q_minhash_bands",
    "q_strip_text_blocks",
    "q_nested_hocr",
    "q_simhash_near_dup_mb",
    "q_stream_dedup_flags",
    "q_ann_ivf_bcast",
    "q_ann_pq",
    # round-5 additions (round-4 verdict #6 + the new segment operator): the
    # heaviest curation/cluster surfaces measured, not inferred
    "q_corpus_curation",
    "q_dup_clusters_incr",
    "q_segment_dedup",
    "q_cdc_dedup",
    # round 6: the CDC-scheme curation variant (q05_region_revenue folded to
    # anchors to make driver-window room; its join shape stays covered by
    # q01/q_top3/broadcast plan tests), the incremental segment-dedup batch
    # form (driver-coordination bound like q_dup_clusters_incr), and the
    # media perceptual-dedup tier (committed fixture, kernel + banded join)
    "q_corpus_curation_cdc",
    "q_stream_seg_dedup",
    "q_media_near_dup",
    # round 7: the incremental curation runner (driver-coordination bound
    # like the other foreachBatch batch forms) and the media-gate curation
    # variant (fixture-bound clusters + the md5 link join)
    "q_curate_incr",
    "q_corpus_curation_media",
    # round 7b: the two heaviest training-data-prep surfaces — the
    # broadcast-gram decontamination scan (corpus-side gram explosion is
    # the dominant map cost) and the two-level prefix-sum packing layout
    "q_decontaminate",
    "q_pack_sequences",
    # round 7c: distributed BPE tokenizer training at sf (24 merge rounds
    # over the sf documents table — the fixture-bound hash-gated forms
    # stay out of the bench, this is the corpus-sized cost)
    "q_bpe_train_scale",
    # round 7c: DSIR importance resampling end-to-end at sf (weight fit =
    # two bounded-key groupBys; scoring = zero-shuffle broadcast fold +
    # TakeOrderedAndProject)
    "q_dsir_select",
    # round 7c: scan-route BM25 at sf (zero-shuffle projection + top-k;
    # the indexed route's cost is the pruned-bucket read, fixture-bound)
    "q_bm25_topk",
    # round 8: the composed end-to-end training-data product (curate ->
    # strip -> decontaminate -> redact -> mix -> upsample -> BPE -> pack,
    # one lineage-tracked job; the audit is the returned frame). The cost
    # is the whole chain: the query rebuilds its scratch product per call
    "q_training_data",
]

N_REPS = int(os.environ.get("BENCH_REPS", "3"))


def _canary(spark, sf_dir):
    """FROZEN round-7 canary — NEVER edit (round-6 verdict #4): a fixed
    aggregation whose code is pinned forever, so the VM session-noise
    factor between any two rounds' BENCH artifacts is computable from the
    artifacts alone (canary_r{N} / canary_r{M} estimates the session
    ratio; this VM swings ±10-40% between sessions)."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("n"),
        )
    )


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _docs_parquet(sf: float, n_docs: int) -> str:
    """Deterministic synthetic docs table, cached across runs (generation is
    not part of the measured time)."""
    path = f"/tmp/bench_docs_sf{sf}_{n_docs}.parquet"
    if not os.path.exists(path):
        from complete_ocr_spark.synth import write_docs_parquet

        write_docs_parquet(path, n_docs, workers=os.cpu_count() or 1)
    return path


def main() -> None:
    from complete_ocr_spark.config import build_spark
    from complete_ocr_spark.pipeline import run_extraction
    from complete_ocr_spark.queries import ANCHOR_REGISTRY, REGISTRY

    sf = _sf_label(SF_DIR)
    n_docs = int(os.environ.get("BENCH_N_DOCS", str(max(200, int(4000 * sf / 0.1)))))
    docs_path = _docs_parquet(sf, n_docs)

    spark = build_spark(
        app_name="complete_ocr_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )

    # --- warm-up: JVM/codegen/Arrow path (not measured) -------------------
    run_extraction(spark, spark.read.parquet(docs_path).limit(400)).count()

    # --- headline: end-to-end extraction, scan -> write; best of N_REPS ----
    # fresh output path per run: repeated overwrite of the SAME local path
    # degrades monotonically (local-FS delete/rename interaction), which would
    # understate steady-state throughput
    runs = []
    for i in range(N_REPS):
        out_dir = f"/tmp/bench_docs_out_{os.getpid()}_{i}"
        t0 = time.perf_counter()
        docs = spark.read.parquet(docs_path)
        run_extraction(spark, docs).write.mode("overwrite").parquet(out_dir)
        runs.append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(out_dir, ignore_errors=True)
    extract_sec = min(runs)

    # --- operator queries: warm once (codegen/JIT), then INTERLEAVED reps —
    # this VM's noise swings single runs ~2.5x (BASELINE.md protocol), so the
    # recorded value is best-of-N_REPS with every rep kept in queries_reps
    # benchmark over BOTH registries (anchors keep their bench slots after
    # driver-window folds: q_ann_topk/q_segment_dedup since r7), plus the
    # frozen canary that lives here so no registry refactor can touch it
    reg = {
        name: fn
        for name, (fn, _sql) in {**REGISTRY, **ANCHOR_REGISTRY}.items()
    }
    reg["canary"] = _canary
    bench_queries = [] if os.environ.get("BENCH_EXTRACT_ONLY") else BENCH_QUERIES
    if os.environ.get("BENCH_ONLY"):
        # supplemental sessions: measure a named subset (always with the
        # canary so the artifact stays cross-session comparable) without
        # perturbing the frozen headline suite above
        only = [q.strip() for q in os.environ["BENCH_ONLY"].split(",") if q.strip()]
        unknown = [q for q in only if q not in reg]
        if unknown:
            raise ValueError(f"BENCH_ONLY names unknown queries: {unknown}")
        bench_queries = (["canary"] if "canary" not in only else []) + only
    reps: dict[str, list[float]] = {name: [] for name in bench_queries}
    for name in bench_queries:  # warm pass (not measured)
        reg[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for _ in range(N_REPS):
        for name in bench_queries:  # interleaved: each rep sweeps the suite
            t0 = time.perf_counter()
            reg[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.perf_counter() - t0, 3))
    qtimes = {name: min(ts) for name, ts in reps.items()}

    total = round(extract_sec + sum(qtimes.values()), 3)
    from complete_ocr_spark.queries import _CI_BATCHES, _SD_BATCHES

    # q_dup_clusters_incr's time is DRIVER-COORDINATION cost, not data-path
    # cost: it runs _SD_BATCHES sequential real foreachBatch bodies (~12
    # small jobs each), so its number scales with the batch count, not with
    # sf — read it as incremental-maintenance overhead per batch, not as a
    # per-row throughput (round-5 verdict, "What's wrong" #2)
    notes = {
        "q_dup_clusters_incr": {
            "batches_executed": _SD_BATCHES,
            "bound_by": "driver coordination (sequential foreachBatch bodies)",
        },
        "q_stream_seg_dedup": {
            "batches_executed": _SD_BATCHES,
            "bound_by": "driver coordination (sequential foreachBatch bodies)",
        },
        "q_media_near_dup": {
            "input": "committed 133-row media fixture (constant across sf)",
            "measures": "banded pair join + CC over the stored signatures; "
                        "the decode+hash kernel is INDEX-BUILD (memoized, "
                        "paid in the unmeasured warm pass — the q_ann_pq "
                        "trained-codebook convention)",
        },
        "q_corpus_curation": {
            "r6": "gained the SemDeDup semantic tier (SRP candidates + "
                  "cosine verify + CC over lexical survivors); measured "
                  "same-session delta ~+2.7s at sf0.1 — compare vs r5 "
                  "accordingly",
        },
        "q_cdc_dedup": {
            "r6": "boundary hash now a rolling 3-token window (one lag "
                  "window pass added, same doc partitioning)",
        },
        "q_curate_incr": {
            "batches_executed": _CI_BATCHES,
            "bound_by": "driver coordination (sequential foreachBatch "
                        "bodies: per batch = gates + fp probe + the real "
                        "segment and dedup stream bodies + 3 table writes)",
        },
        "q_bpe_train_scale": {
            "bound_by": "n_merges (24) sequential greedy rounds — inherent "
                        "to BPE's argmax loop; each round is one "
                        "vocab-sized groupBy + a 1-row driver read, "
                        "corpus-independent after the first word-count scan",
        },
        "q_training_data": {
            "bound_by": "the whole composed chain, rebuilt per rep: "
                        "curation (incl. its near-dup leg) + strip + "
                        "decon + redact + mix + upsample + BPE training "
                        "(16 sequential merge rounds) + encode + pack + "
                        "5 bucketed table writes + lineage — the "
                        "end-to-end training-data product, not one "
                        "operator",
        },
        "canary": {
            "frozen": "round 7 — code pinned forever; use "
                      "canary_rN/canary_rM as the cross-round session-noise "
                      "ratio before comparing any other query",
        },
    }
    result = {
        "metric": "end_to_end_extraction_plus_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": dict(
            {"extract_pipeline": round(extract_sec, 3)}, **qtimes
        ),
        "queries_reps": dict({"extract_pipeline": runs}, **reps),
        "notes": notes,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 2),
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
