"""BM25 retrieval (functions/retrieval.py): independent float-BM25 oracle
parity, scan==indexed bit-equality, posting-store correctness, and the
partition-pruned plan shape. The cross-engine hash gates live in
test_queries_duckdb (q_bm25_topk driver slot, q_bm25_indexed anchor)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from complete_ocr_spark.functions import retrieval


def _bm25_py(rows, terms, k1=1.2, b=0.75):
    """Independent float BM25 (the textbook formulation, no fixed-point):
    {doc_id: (dl, n_matched, float_score)} over non-empty docs."""
    toks = {
        i: " ".join(t.lower().strip().split()).split(" ")
        for i, t in rows
        if "".join(" ".join(t.lower().strip().split()).split(" ")) != ""
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        score, matched = 0.0, 0
        for term in sorted(set(terms)):
            df = sum(1 for v in toks.values() if term in v)
            tf = tk.count(term)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if matched:
            out[i] = (len(tk), matched, score)
    return out


CORPUS = [
    (1, "spark shuffle join broadcast join join"),       # tf(join)=3, short
    (2, "a long document about many things and also a single join "
        "mention inside far more words than the others have here"),
    (3, "broadcast broadcast broadcast"),                # no query term
    (4, "shuffle join"),                                 # shortest match
    (5, "   "),                                          # featureless
    (6, "join shuffle join partition exchange"),
]
TERMS = ["join", "shuffle"]


def test_bm25_matches_independent_float_oracle(spark):
    exp = _bm25_py(CORPUS, TERMS)
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dl"], r["n_matched"], r["score_micros"])
        for r in retrieval.bm25_topk(df, "doc_id", "text", TERMS, k=10).collect()
    }
    assert set(got) == set(exp)
    for i, (dl, m, fscore) in exp.items():
        gdl, gm, gmicros = got[i]
        assert (gdl, gm) == (dl, m)
        # fixed-point e6 arithmetic vs float: agree to ~1e-4 relative
        assert abs(gmicros / 1e6 - fscore) <= max(1e-4 * fscore, 2e-5), (i, gmicros, fscore)
    exp_rank = sorted(exp, key=lambda i: (-exp[i][2], i))
    got_rank = sorted(got, key=lambda i: (-got[i][2], i))
    assert got_rank == exp_rank


def test_bm25_featureless_and_nonmatching_excluded(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    ids = {r["doc_id"] for r in
           retrieval.bm25_topk(df, "doc_id", "text", TERMS, k=10).collect()}
    assert 3 not in ids  # no query term
    assert 5 not in ids  # whitespace-only


def test_bm25_unseen_term_gets_max_idf_and_zero_hits(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    n_docs, _ = retrieval.corpus_stats(df, "text")
    idf = retrieval.idf_micros(df, "text", ["join", "zzz_not_in_corpus"], n_docs)
    # df=0 term: idf = ln(1 + (N+0.5)/0.5) — the largest idf in the table
    assert idf["zzz_not_in_corpus"] > idf["join"]
    assert idf["zzz_not_in_corpus"] == math.floor(
        1_000_000 * math.log(1 + (n_docs + 0.5) / 0.5))


def test_index_route_equals_scan_route(spark, tmp_path):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    scan = [tuple(r) for r in
            retrieval.bm25_topk(df, "doc_id", "text", TERMS, k=10).collect()]
    path = str(tmp_path / "idx")
    retrieval.build_term_index(df, "doc_id", "text", path, n_buckets=8)
    idx = [tuple(r) for r in
           retrieval.bm25_topk_indexed(spark, path, TERMS, k=10,
                                       n_buckets=8).collect()]
    assert scan == idx


def test_posting_store_tf_dl_and_stats(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "b a b c b"), (2, "a a")], ["doc_id", "text"])
    path = str(tmp_path / "idx")
    retrieval.build_term_index(df, "doc_id", "text", path, n_buckets=4)
    posts = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in spark.read.parquet(path + "/postings").collect()
    }
    assert posts == {
        (1, "a"): (1, 5), (1, "b"): (3, 5), (1, "c"): (1, 5),
        (2, "a"): (2, 2),
    }
    srow = spark.read.parquet(path + "/stats").head()
    assert (srow["n_docs"], srow["total_tokens"]) == (2, 7)


def test_indexed_query_prunes_posting_partitions(spark, tmp_path):
    """The at-rest read must carry a PartitionFilter on tb — the query
    touches only its terms' buckets, plan-constant in corpus size."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    path = str(tmp_path / "idx")
    retrieval.build_term_index(df, "doc_id", "text", path, n_buckets=8)
    q = retrieval.bm25_topk_indexed(spark, path, TERMS, k=10, n_buckets=8)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scans = plan.split("FileScan parquet")[1:]
    assert scans, plan
    assert any("PartitionFilters" in seg and "tb" in
               seg.split("PartitionFilters:")[1].split("]")[0]
               for seg in scans), plan


def test_scan_route_stats_phase_is_one_job(spark):
    """Round-8 contract: the scan route's whole stats phase (n_docs,
    total_tokens, per-term df) is ONE corpus pass — corpus_stats_with_df
    launches one aggregate query — at most 2 Spark jobs (AQE materializes
    the partial-agg exchange as its own job, then the result stage; both
    read the corpus-scan output once). The old route ran the stats agg
    PLUS a separate df explode/groupBy pass: >= 4 jobs, 2 corpus scans."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    sc = spark.sparkContext
    sc.setJobGroup("bm25-stats-pass", "single-pass stats", False)
    try:
        n, tt, dfm = retrieval.corpus_stats_with_df(df, "text", TERMS)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("bm25-stats-pass")
    assert len(jobs) <= 2, jobs
    # and the fold is correct: same numbers the two-pass route produced
    assert (n, tt) == retrieval.corpus_stats(df, "text")
    assert dfm == {"join": 4, "shuffle": 3}


def test_term_validation_fires_before_any_job(spark):
    """Empty list / quoted / backslashed / empty-string terms raise at
    entry, BEFORE any corpus job launches (previously an empty list
    reached F.expr('') only after two corpus passes)."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    sc = spark.sparkContext
    for bad in [[], ["ok", "in'ject"], ["back\\slash"], [""], ["ok", 7]]:
        sc.setJobGroup("bm25-validate", "no jobs expected", False)
        try:
            with pytest.raises((ValueError, TypeError)):
                retrieval.bm25_topk(df, "doc_id", "text", bad, k=5)
            with pytest.raises((ValueError, TypeError)):
                retrieval.score_postings(
                    df.limit(0).selectExpr(
                        "doc_id", "cast(1 as bigint) dl",
                        "'x' term", "cast(1 as bigint) tf"),
                    bad, 10, 100, 5)
        finally:
            sc.setJobGroup(None, None)
        assert sc.statusTracker().getJobIdsForGroup("bm25-validate") == []


def test_length_norm_survives_web_scale_constants(spark):
    """The driver-folded Q kills the dl*N overflow: with N=1e10 docs and
    kilotoken dl (the regime where the old dl*N*1e6 int64 product wrapped
    silently), scores stay positive, finite and correctly ordered. The
    corpus scalars are injected directly (score_postings takes them as
    ints) — no 1e10-row fixture needed."""
    n_docs, total_tokens = 10**10, 10**13  # avgdl = 1000
    post = spark.createDataFrame(
        [(1, 1000, "join", 5), (2, 4000, "join", 5), (3, 1000, "join", 1)],
        "doc_id: bigint, dl: bigint, term: string, tf: bigint",
    )
    rows = {r["doc_id"]: r["score_micros"]
            for r in retrieval.score_postings(
                post, ["join"], n_docs, total_tokens, 10).collect()}
    assert all(0 < v < 2**62 for v in rows.values()), rows
    # same tf, 4x the length => strictly lower score; higher tf wins
    assert rows[1] > rows[2] and rows[1] > rows[3]
    # cross-check doc 1 against the float formulation to 1e-4 relative
    # (df = 3: all three posting rows carry the term)
    idf = math.log(1 + (n_docs - 3 + 0.5) / (3 + 0.5))
    exp = idf * 5 * 2.2 / (5 + 1.2 * (0.25 + 0.75 * 1000 / 1000))
    assert abs(rows[1] / 1e6 - exp) <= 1e-4 * exp


def test_doc_term_pairs_positional_tf_on_adversarial_runs(spark):
    """The positional run-boundary tf (round-8 rewrite of the quadratic
    array_position form): singleton runs, long runs, first/last-position
    runs, and an all-distinct doc all produce exact (term, tf) postings."""
    docs = spark.createDataFrame(
        [
            (1, "z a a a a m z z b"),          # runs at both ends + middle
            (2, "only"),                        # single token
            (3, "d c b a"),                     # all distinct (worst case
                                                # for the old array_position)
            (4, "t t t t t t t"),               # one run = whole doc
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in retrieval.doc_term_pairs(docs, "doc_id", "text", 4).collect()
    }
    assert got == {
        (1, "a"): (4, 9), (1, "b"): (1, 9), (1, "m"): (1, 9), (1, "z"): (3, 9),
        (2, "only"): (1, 1),
        (3, "a"): (1, 4), (3, "b"): (1, 4), (3, "c"): (1, 4), (3, "d"): (1, 4),
        (4, "t"): (7, 7),
    }
