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
