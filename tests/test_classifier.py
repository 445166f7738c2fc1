"""Hashed-classifier TRAINING (functions/classifier.py) vs the independent
integer-LR oracle (oracle/classifier.py): exact weight/history parity,
"training learns" telemetry, trainer -> scorer drop-in consistency, and
guard behavior.  The committed goldens are additionally hash-gated via
ANCHOR_REGISTRY (q_clf_train / q_clf_scored in test_queries_duckdb)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complete_ocr_spark.functions import classifier as C, prep
from complete_ocr_spark.oracle import classifier as OC

NB, ITERS, LR = 64, 8, 1_000_000


@pytest.fixture(scope="module")
def fixture_rows():
    return C.synthetic_labeled_corpus()


@pytest.fixture(scope="module")
def fixture_df(spark, fixture_rows):
    return spark.createDataFrame(
        fixture_rows, "doc_id: bigint, y: bigint, text: string"
    )


@pytest.fixture(scope="module")
def trained(spark, fixture_df):
    return C.train_hashed_classifier(
        fixture_df, "doc_id", "text", "y",
        n_buckets=NB, n_iters=ITERS, lr_bp=LR,
    )


def test_weights_match_independent_oracle(trained, fixture_rows):
    w, bias, hist = trained
    ow, obias, ohist = OC.train(fixture_rows, NB, ITERS, LR)
    assert w == ow
    assert bias == obias
    assert hist == ohist


def test_training_learns(trained):
    _w, _bias, hist = trained
    # iteration 0 scores with all-zero weights: p = 0.5 for every doc
    assert hist[0]["n_correct"] == 120  # the degenerate >= 0.5 tie side
    assert hist[-1]["n_correct"] >= 230  # separable fixture: ~98% train acc
    assert hist[-1]["sum_abs_err"] < hist[0]["sum_abs_err"]


def test_trained_weights_are_scorer_drop_in(spark, trained, fixture_df,
                                            fixture_rows):
    """prep.hashed_quality_score with the trained table reproduces the
    oracle's margins exactly — the trainer and the round-7 scorer share
    one feature/margin definition."""
    w, bias, _ = trained
    scored = prep.hashed_quality_score(
        fixture_df, "doc_id", "text", w, bias_micros=bias,
        threshold_micros=0,
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_mean_micros"])
        for r in scored.filter(F.col("n_tokens") > 0).collect()
    }
    want = {d: (n, m) for d, n, m in OC.score(fixture_rows, w, bias, NB)}
    assert got == want


def test_separable_fixture_margins_separate_classes(trained, fixture_rows):
    w, bias, _ = trained
    margins = {d: m for d, _n, m in OC.score(fixture_rows, w, bias, NB)}
    pos = [margins[d] for d, y, _ in fixture_rows if y == 1]
    neg = [margins[d] for d, y, _ in fixture_rows if y == 0]
    # class means separated by a wide integer margin (not just signs)
    assert sum(pos) // len(pos) > 100_000
    assert sum(neg) // len(neg) < -100_000


def test_empty_docs_are_dropped(spark):
    df = spark.createDataFrame(
        [(0, 1, "alpha alpha"), (1, 0, "   "), (2, 0, "beta beta")],
        "doc_id: bigint, y: bigint, text: string",
    )
    feats = C.featurize(df, "doc_id", "text", "y", 16)
    assert sorted(r["doc_id"] for r in feats.collect()) == [0, 2]


def test_featurize_counts_match_counter(spark, fixture_df, fixture_rows):
    """The map-side run-length bucket counts equal an independent
    Counter over the same hash — the compact feature row is exact."""
    import random

    feats = {r["doc_id"]: r for r in
             C.featurize(fixture_df, "doc_id", "text", "y", NB).collect()}
    rng = random.Random(8)
    for doc_id, _y, text in rng.sample(fixture_rows, 20):
        toks = OC.norm_tokens(text)
        from collections import Counter

        want = Counter(OC.bucket(t, NB) for t in toks)
        row = feats[doc_id]
        got = {f["b"]: f["cnt"] for f in row["fb"]}
        assert got.pop(NB) == 1  # bias pseudo-feature
        assert got == dict(want)
        assert row["n_tokens"] == len(toks)


def test_bad_labels_raise(spark):
    df = spark.createDataFrame(
        [(0, 2, "alpha beta")], "doc_id: bigint, y: bigint, text: string"
    )
    with pytest.raises(ValueError, match="0/1"):
        C.train_hashed_classifier(df, "doc_id", "text", "y",
                                  n_buckets=8, n_iters=1)


def test_param_guards(spark, fixture_df):
    with pytest.raises(ValueError, match="n_iters"):
        C.train_hashed_classifier(fixture_df, "doc_id", "text", "y",
                                  n_buckets=8, n_iters=0)
    with pytest.raises(ValueError, match="lr_bp"):
        C.train_hashed_classifier(fixture_df, "doc_id", "text", "y",
                                  n_buckets=8, n_iters=1, lr_bp=0)


def test_featurize_is_shuffle_free(spark, fixture_df):
    """The corpus-sized half of every round is map-only: no Exchange in
    the featurize plan (the gradient groupBy's bounded-key exchange is
    the ONLY shuffle training performs)."""
    plan = C.featurize(fixture_df, "doc_id", "text", "y",
                       NB)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sigmoid_table_shape():
    sig = C.sigmoid_table_micros()
    assert len(sig) == 4096
    assert sig[0] < 10  # sigmoid(-12) ~ 6e-6
    assert sig[-1] > 999_990
    assert all(a <= b for a, b in zip(sig, sig[1:]))  # monotone
    # both implementations build the identical table
    assert sig == OC.sigmoid_table()


def test_val_split_matches_oracle_and_never_trains(spark, fixture_df,
                                                   fixture_rows):
    """val_bp holds out a salted-hash slice: weights/history equal the
    independent oracle's, val rows never contribute gradients (training
    on the non-val subset directly gives the same weights), and the
    history carries per-round val telemetry."""
    w, bias, hist = C.train_hashed_classifier(
        fixture_df, "doc_id", "text", "y",
        n_buckets=NB, n_iters=4, lr_bp=LR, val_bp=2_500,
    )
    ow, obias, ohist = OC.train(fixture_rows, NB, 4, LR, val_bp=2_500)
    assert (w, bias, hist) == (ow, obias, ohist)
    assert hist[0]["val_docs"] > 0
    assert hist[0]["val_docs"] + hist[0]["n_docs"] == len(fixture_rows)
    # val rows are pure telemetry: training on the train subset alone
    # (val rows REMOVED) yields identical weights
    train_ids = {d for d, _y, _t in fixture_rows
                 if not OC._is_val(d, 2_500)}
    sub = fixture_df.filter(F.col("doc_id").isin(list(train_ids)))
    w2, bias2, _ = C.train_hashed_classifier(
        sub, "doc_id", "text", "y", n_buckets=NB, n_iters=4, lr_bp=LR)
    assert (w2, bias2) == (w, bias)
    # val accuracy improves on the separable fixture too
    assert hist[-1]["val_correct"] >= hist[0]["val_correct"]


def test_val_round_is_single_pass(spark, fixture_df, monkeypatch):
    """Round-9 shape pin (round-8 verdict #3): with val_bp on, each round
    issues ONE bounded stats collect (train+val conditional sums in one
    corpus pass) plus one gradient collect — not a separate val scoring
    job. Counted via DataFrame.collect, the only driver-read primitive
    the trainer uses."""
    from pyspark.sql.classic.dataframe import DataFrame

    calls = []
    orig = DataFrame.collect

    def counted(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "collect", counted)
    n_iters = 3
    C.train_hashed_classifier(
        fixture_df, "doc_id", "text", "y",
        n_buckets=NB, n_iters=n_iters, lr_bp=LR, val_bp=2_500,
    )
    # per round: stats collect + grads collect; plus the one-time label
    # guard count, train count and checkpoint probes outside the loop
    # (count() does not route through collect) — so collects == 2/round
    assert len(calls) == 2 * n_iters


def test_val_bp_guard(spark, fixture_df):
    with pytest.raises(ValueError, match="val_bp"):
        C.train_hashed_classifier(fixture_df, "doc_id", "text", "y",
                                  n_buckets=8, n_iters=1, val_bp=10_000)
