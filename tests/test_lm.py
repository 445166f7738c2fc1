"""Hashed-bigram LM perplexity filter (functions/lm.py) vs the independent
hashlib+Counter+math.log oracle (oracle/lm.py): exact table and score
parity, in-domain-vs-garbage separation, evidence rules, and plan shape.
The cross-engine gate is the q_lm_perplexity anchor (full-CTE ln oracle,
the dsir_weights precedent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complete_ocr_spark.functions import lm
from complete_ocr_spark.oracle import lm as OLM

NB = 256

TARGET = [
    (100 + i,
     "the spark engine shuffles partitioned batches of arrow pages "
     "and the reader prunes nested columns in a distributed plan")
    for i in range(6)
] + [(200 + i, "a query optimizer rewrites relational trees into "
               "physical operators with pruned scans") for i in range(4)]

DOCS = [
    (1, "the spark engine shuffles partitioned batches of arrow pages"),
    (2, "a query optimizer rewrites relational trees"),
    (3, "zxq vbn mlk poi uyt rew qas dfg hjk"),   # out-of-domain garbage
    (4, "single"),                                 # < 2 tokens: no evidence
    (5, "   "),                                    # empty
]
SCHEMA = "doc_id bigint, text string"


@pytest.fixture(scope="module")
def fitted(spark):
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    t = lm.lm_tables(tgt, "doc_id", "text", n_buckets=NB)
    rows = t.orderBy("bucket").collect()
    return rows


def test_tables_match_oracle(fitted):
    w1, w2, uc, bc = OLM.tables([t for _, t in TARGET], NB)
    assert [r["w1_micros"] for r in fitted] == w1
    assert [r["w2_micros"] for r in fitted] == w2
    assert [r["uni_count"] for r in fitted] == uc
    assert [r["bi_count"] for r in fitted] == bc


def test_scores_match_oracle(spark, fitted):
    w1 = [r["w1_micros"] for r in fitted]
    w2 = [r["w2_micros"] for r in fitted]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micros"], r["avg_nll_micros"])
        for r in lm.lm_score(
            spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", w1, w2
        ).collect()
    }
    want = {d: (n, nll, avg) for d, n, nll, avg in OLM.score(
        [(d, t) for d, t in DOCS], w1, w2, NB)}
    assert got == want
    assert set(got) == {1, 2, 3}  # 4 and 5 carry no bigram evidence


def test_in_domain_scores_below_garbage(spark, fitted):
    w1 = [r["w1_micros"] for r in fitted]
    w2 = [r["w2_micros"] for r in fitted]
    got = {r["doc_id"]: r["avg_nll_micros"] for r in lm.lm_score(
        spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", w1, w2
    ).collect()}
    assert got[1] < got[3] and got[2] < got[3]
    # an exact target sentence is MUCH less surprising than garbage
    assert got[3] - got[1] > 1_000_000


def test_perplexity_filter_end_to_end(spark):
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    docs = spark.createDataFrame(DOCS, SCHEMA)
    out = {r["doc_id"]: r["pass"] for r in lm.perplexity_filter(
        docs, tgt, "doc_id", "text",
        max_avg_nll_micros=4_500_000, n_buckets=NB).collect()}
    assert out[1] is True and out[2] is True and out[3] is False


def test_score_plan_is_shuffle_free(spark, fitted):
    w1 = [r["w1_micros"] for r in fitted]
    w2 = [r["w2_micros"] for r in fitted]
    plan = lm.lm_score(
        spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", w1, w2
    )._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the 1-row table broadcast
    assert "Exchange hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_table_length_guard(spark):
    with pytest.raises(ValueError, match="one entry per bucket"):
        lm.lm_score(spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text",
                    [0] * 4, [0] * 8)


def test_curate_perplexity_tier(spark, fitted):
    """The perplexity gate in the curation chain: trips only on
    above-bound avg surprise, ranks after the heuristics and before
    exact_dup, passes no-evidence docs (< 2 tokens), and the audit
    column equals lm_score's avg bit for bit."""
    from complete_ocr_spark.functions.curate import curate_corpus

    w1 = [r["w1_micros"] for r in fitted]
    w2 = [r["w2_micros"] for r in fitted]
    rows = [
        (1, "the spark engine shuffles partitioned batches of arrow pages"),
        (2, "zxq vbn mlk poi uyt rew qas dfg hjk the"),   # out-of-domain
        (3, "zxq vbn mlk poi uyt rew qas dfg hjk the"),   # exact dup of 2:
                                                          # perplexity wins
        (4, "single"),                                    # no evidence: pass
    ]
    d = spark.createDataFrame(rows, SCHEMA)
    out = {r["doc_id"]: r for r in curate_corpus(
        d, "doc_id", "text", languages=("en", "unknown"), min_quality=0.0,
        max_symbol_ratio=1.0, max_dup_line_frac=1.0, max_top_bigram_frac=1.0,
        lm_w1_micros=w1, lm_w2_micros=w2,
        max_avg_nll_micros=4_500_000,
    ).collect()}
    assert out[1]["keep"] and out[1]["drop_reason"] is None
    assert out[2]["drop_reason"] == "perplexity"
    assert out[3]["drop_reason"] == "perplexity"   # not exact_dup
    assert out[4]["keep"] and out[4]["avg_nll_micros"] is None
    scored = {r["doc_id"]: r["avg_nll_micros"] for r in lm.lm_score(
        d, "doc_id", "text", w1, w2).collect()}
    for i in (1, 2, 3):
        assert out[i]["avg_nll_micros"] == scored[i], i


def test_curate_perplexity_tier_guards(spark):
    from complete_ocr_spark.functions.curate import curate_corpus

    d = spark.createDataFrame([(1, "a b")], SCHEMA)
    with pytest.raises(ValueError, match="BOTH"):
        curate_corpus(d, "doc_id", "text", lm_w1_micros=[0] * 8).collect()
