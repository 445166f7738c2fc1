"""Distributed BPE (functions/bpe.py) vs the independent Counter/dict
reference (oracle/bpe.py): randomized training parity, encode parity,
tie-break determinism, stop conditions, and the train->encode round-trip
invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from complete_ocr_spark.functions import bpe
from complete_ocr_spark.oracle import bpe as obpe


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id: bigint, text: string"
    )


def _train_spark(spark, texts, n_merges, **kw):
    return [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe.bpe_train(_df(spark, texts), "text", n_merges, **kw).collect()
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_train_parity_randomized(spark, seed):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "del", "delta", "aaa", "aaaa",
             "ab", "abab", "banana", "bandana", "tab", "table", "x"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(0, 10)))
             for _ in range(150)]
    texts += ["", "  ", None, "Tab TABLE\ttab\nalpha"]
    got = _train_spark(spark, texts, 30)
    want, _ = obpe.train(texts, 30)
    assert got == want and len(got) > 10


def test_encode_parity_including_unseen_words(spark):
    train_texts = ["low lower lowest", "new newer newest", "low low new"]
    merges, _ = obpe.train(train_texts, 20, min_pair_count=1)
    ops = [(m[1], m[2]) for m in merges]
    probe = train_texts + ["slow slowest brand-new", "", "LOW\nnew"]
    enc = bpe.bpe_encode(_df(spark, probe), ["id"], "text", ops)
    got = {r["id"]: (r["n_tokens"], r["token_str"]) for r in enc.collect()}
    for i, t in enumerate(probe):
        toks = obpe.encode(t, merges)
        assert got[i] == (len(toks), " ".join(toks)), (i, t)


def test_tiebreak_is_lexicographic(spark):
    # (b,a) and (a,c) tie at count 2; (a,c) < (b,a) must win rank 0
    texts = ["ba ba", "ac ac"]
    got = _train_spark(spark, texts, 1, min_pair_count=1)
    # every word contributes (<char>,</w>) pairs too — compute the true
    # argmax from the oracle and pin both engines to it
    want, _ = obpe.train(texts, 1, min_pair_count=1)
    assert got == want
    assert got[0][1:3] == min(got[0][1:3], tuple(got[0][1:3]))


def test_leftmost_first_overlap(spark):
    # 'aaa' with merge (a,a): leftmost-first gives [aa, a, </w>], never
    # [a, aa, </w>]
    texts = ["aaa aaa aaa"]
    m = _train_spark(spark, texts, 2, min_pair_count=1)
    ops = [(x[1], x[2]) for x in m]
    assert ("a", "a") == ops[0]
    toks = obpe.encode("aaa", m)
    enc = bpe.bpe_encode(_df(spark, ["aaa"]), ["id"], "text", ops)
    row = enc.collect()[0]
    assert row["token_str"] == " ".join(toks)
    assert toks[0] in ("aa", "aaa")  # leftmost merge happened first


def test_min_pair_count_stops_early(spark):
    texts = ["q w e r t y"]  # every pair unique -> count 1 < 2
    assert _train_spark(spark, texts, 10, min_pair_count=2) == []
    # min_pair_count=1 learns something
    assert len(_train_spark(spark, texts, 3, min_pair_count=1)) == 3


def test_empty_corpus(spark):
    assert _train_spark(spark, ["", "   ", None], 5) == []


def test_encode_roundtrip_strips_to_normalized_words(spark):
    texts = ["Hello   World", "hello hellos"]
    merges, _ = obpe.train(texts, 15, min_pair_count=1)
    ops = [(m[1], m[2]) for m in merges]
    enc = bpe.bpe_encode(_df(spark, texts), ["id"], "text", ops)
    for r in enc.collect():
        toks = r["token_str"].split(" ") if r["token_str"] else []
        words = "".join(toks).split(bpe.END)
        assert words[-1] == ""
        assert [w for w in words if w] == obpe.norm_words(texts[r["id"]])


def test_checkpoint_every_does_not_change_result(spark):
    texts = ["banana band bandana " * 3, "ban ban banana"]
    a = _train_spark(spark, texts, 12, checkpoint_every=2)
    b = _train_spark(spark, texts, 12, checkpoint_every=100)
    want, _ = obpe.train(texts, 12)
    assert a == b == want and len(a) >= 8  # corpus exhausts below 12


def test_local_fast_path_matches_distributed_loop(spark, monkeypatch):
    """Round 9: small vocabularies train driver-side (_train_local). The
    fast path must emit byte-identical merges to the distributed
    map-reduce loop (forced by shrinking the vocab bound to 0) and to the
    independent oracle."""
    texts = ["low lower lowest", "new newer newest", "low low new",
             "aaa aaaa ab abab banana bandana", "", None, "Tab TABLE\ttab"]
    fast = _train_spark(spark, texts, 20, min_pair_count=1)
    monkeypatch.setattr(bpe, "_BPE_LOCAL_MAX_WORDS", 0)
    dist = _train_spark(spark, texts, 20, min_pair_count=1)
    monkeypatch.undo()
    want, _ = obpe.train(texts, 20, min_pair_count=1)
    assert fast == dist == want and len(fast) > 5
