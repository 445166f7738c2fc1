#!/usr/bin/env python3
"""Round-9 stage-level profiling (guide §1: measure first, noop sink).

Times isolated sub-stages of the heavy queries at $SPARK_GRAFT_SF_DIR so
optimization targets the measured cost, not the guessed one. Not part of
the frozen bench contract (bench.py untouched); numbers land in
OPTIMIZATION_r09.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROF_REPS", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, out, reps=REPS):
    # warm once, then best-of-reps
    fn()
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    out[name] = min(ts)
    print(f"{name:45s} {min(ts):8.3f}  {ts}", flush=True)


def main():
    from complete_ocr_spark.config import build_spark
    from complete_ocr_spark import queries as Q
    from complete_ocr_spark.functions import curate, dedup, prep, similarity

    spark = build_spark(
        app_name="profile_r09", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    out = {}
    d = Q._t(spark, SF_DIR, "documents")
    e = Q._t(spark, SF_DIR, "embeddings")

    # ---- curation sub-stages ------------------------------------------
    gate_args = ("text", Q._CUR_LANGS, Q._CUR_MIN_Q, Q._CUR_MAX_DLF,
                 Q._CUR_MAX_TBF, Q._CUR_MIN_BGT, Q._CUR_MAX_SYM)

    timed(spark, "cur/gates_annotate", lambda: noop(
        curate.annotate_gates(d, "text")), out)
    timed(spark, "cur/gates_pass_filter", lambda: noop(
        curate.annotate_gates(d, "text").filter(
            curate.heuristic_pass(*gate_args)).select("doc_id", "text")), out)

    def passed():
        return curate.annotate_gates(d, "text").filter(
            curate.heuristic_pass(*gate_args)).select("doc_id", "text")

    def exact_survivors():
        p = passed()
        fp = p.select(F.col("doc_id").alias("doc"),
                      dedup.normalized(F.col("text")).alias("norm")
                      ).withColumn("fp", F.md5("norm"))
        fp_canon = fp.groupBy("fp").agg(F.min("doc").alias("keep_id"))
        exact_drops = (fp.join(fp_canon, "fp")
                       .filter(F.col("doc") != F.col("keep_id"))
                       .select("doc"))
        return p.join(exact_drops.withColumnRenamed("doc", "doc_id"),
                      "doc_id", "left_anti").select("doc_id", "text")

    timed(spark, "cur/exact_survivors", lambda: noop(exact_survivors()), out)

    surv = exact_survivors().localCheckpoint()

    timed(spark, "cur/seg_stride_strip", lambda: noop(
        dedup.strip_dup_segments(surv, "doc_id", "text",
                                 win=Q._SEG_WIN, stride=Q._SEG_STRIDE)), out)
    timed(spark, "cur/near_simhash_sigs", lambda: noop(
        dedup.simhash64(surv, "doc_id", "text")), out)
    timed(spark, "cur/near_pairs", lambda: noop(
        dedup.simhash_hamming_pairs(surv, "doc_id", "text",
                                    max_hamming=Q._SH_MAX_HAMMING,
                                    n_blocks=4)), out)
    timed(spark, "cur/near_clusters_cc", lambda: noop(
        dedup.dup_clusters(surv, "doc_id", "text",
                           max_hamming=Q._SH_MAX_HAMMING, n_blocks=4)), out,
          reps=1)
    timed(spark, "cur/semantic_tier", lambda: noop(
        similarity.embedding_near_dup_srp(
            surv.select("doc_id").join(
                e.select(F.col("vec_id").alias("doc_id"),
                         F.col("embedding").alias("_v")), "doc_id"),
            "doc_id", "_v", dim=Q._SRP_DIM, threshold=Q._CUR_SEM_THR,
            n_bits=Q._CUR_SEM_BITS, n_tables=Q._CUR_SEM_TABLES)), out)
    timed(spark, "cur/full_q_corpus_curation", lambda: noop(
        Q.q_corpus_curation(spark, SF_DIR)), out, reps=1)

    # ---- decontaminate sub-stages -------------------------------------
    bench = d.filter(F.col("doc_id") % Q._DECON_MOD == Q._DECON_REM)
    corpus = d.filter(F.col("doc_id") % Q._DECON_MOD != Q._DECON_REM)
    timed(spark, "dec/bench_grams", lambda: noop(
        prep.benchmark_grams(bench, "doc_id", "text", Q._DECON_N)), out)
    timed(spark, "dec/corpus_grams", lambda: noop(
        prep._gram_hashes(corpus, "doc_id", "text", Q._DECON_N)), out)
    timed(spark, "dec/full", lambda: noop(
        prep.decontaminate(corpus, bench, "doc_id", "text", n=Q._DECON_N)),
          out)

    # ---- DSIR sub-stages ----------------------------------------------
    raw, target = Q._dsir_split(spark, SF_DIR)
    timed(spark, "dsir/raw_bucket_counts", lambda: noop(
        prep.dsir_bucket_counts(raw, "doc_id", "text", Q._DSIR_BUCKETS)),
          out)
    timed(spark, "dsir/target_bucket_counts", lambda: noop(
        prep.dsir_bucket_counts(target, "doc_id", "text", Q._DSIR_BUCKETS)),
          out)
    timed(spark, "dsir/full_select", lambda: noop(
        Q.q_dsir_select(spark, SF_DIR)), out, reps=1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
