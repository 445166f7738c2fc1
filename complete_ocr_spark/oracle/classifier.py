"""Independent pure-Python reference for the hashed-classifier trainer
(Counter/dict based, no Spark, no shared code with
functions/classifier.py beyond the published update-rule spec).

Implements the same integer fixed-point full-batch logistic regression:
md5-hashed unigram buckets, quantized sigmoid lookup, truncate-toward-
zero division everywhere (Spark's ``div``), exact-int weight updates.
Used by scripts/gen_goldens.py to mint the committed golden the Spark
trainer is hash-gated against, and by tests/test_classifier.py for
direct cross-implementation parity.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

_WS = " \t\n\x0b\f\r"  # Java \s — matches the engine's normalized()


def norm_tokens(text: str) -> list[str]:
    return [w for w in text.strip(_WS).lower().translate(
        str.maketrans(_WS, " " * len(_WS))).split(" ") if w]


def bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def sigmoid_table(z_max_micros: int = 12_000_000,
                  bits: int = 12) -> list[int]:
    n = 1 << bits
    step = 2 * z_max_micros / n
    return [
        math.floor(1e6 / (1.0 + math.exp(
            -(-z_max_micros + (i + 0.5) * step) / 1e6)))
        for i in range(n)
    ]


def _is_val(doc_id, val_bp: int) -> bool:
    return (int(hashlib.md5(f"clfval:{doc_id}".encode()).hexdigest()[:8],
                16) % 10_000) < val_bp


def train(rows, n_buckets: int, n_iters: int, lr_bp: int,
          z_max_micros: int = 12_000_000, sig_bits: int = 12,
          val_bp: int = 0):
    """rows: iterable of (doc_id, y, text).  Returns (weights, bias,
    history) exactly as train_hashed_classifier does."""
    sig = sigmoid_table(z_max_micros, sig_bits)
    nsig = len(sig)
    docs, val_docs = [], []
    for doc_id, y, text in rows:
        toks = norm_tokens(text or "")
        if not toks:
            continue
        if y not in (0, 1):
            raise ValueError("labels must be 0/1")
        rec = (int(y), len(toks),
               Counter(bucket(t, n_buckets) for t in toks))
        (val_docs if val_bp and _is_val(doc_id, val_bp) else docs).append(rec)
    if not docs:
        raise ValueError("no non-empty docs")
    n_docs = len(docs)
    w = [0] * (n_buckets + 1)

    def eval_doc(y, n_tok, cnts):
        dot = sum(w[b] * c for b, c in cnts.items()) + w[n_buckets]
        margin = tdiv(dot, n_tok)
        idx = min(max(tdiv((margin + z_max_micros) * nsig,
                           2 * z_max_micros), 0), nsig - 1)
        p = sig[idx]
        return p, y * 1_000_000 - p

    history = []
    for it in range(n_iters):
        grads = [0] * (n_buckets + 1)
        sum_abs_err = 0
        n_correct = 0
        for y, n_tok, cnts in docs:
            p, err = eval_doc(y, n_tok, cnts)
            sum_abs_err += abs(err)
            n_correct += int((p >= 500_000) == (y == 1))
            for b, c in cnts.items():
                grads[b] += tdiv(err * c, n_tok)
            grads[n_buckets] += tdiv(err, n_tok)
        row = {"iter": it, "n_docs": n_docs,
               "sum_abs_err": sum_abs_err,
               "n_correct": n_correct}
        if val_bp:
            vs, vc = 0, 0
            for y, n_tok, cnts in val_docs:
                p, err = eval_doc(y, n_tok, cnts)
                vs += abs(err)
                vc += int((p >= 500_000) == (y == 1))
            row.update({"val_docs": len(val_docs),
                        "val_sum_abs_err": vs, "val_correct": vc})
        history.append(row)
        for b in range(n_buckets + 1):
            w[b] += tdiv(lr_bp * grads[b], 10_000 * n_docs)
    return w[:-1], w[-1], history


def score(rows, weights, bias, n_buckets: int):
    """[(doc_id, n_tokens, score_mean_micros)] for non-empty docs — the
    hashed_quality_score margin, same integer spec."""
    out = []
    for doc_id, _y, text in rows:
        toks = norm_tokens(text or "")
        if not toks:
            continue
        dot = sum(weights[bucket(t, n_buckets)] for t in toks) + bias
        out.append((doc_id, len(toks), tdiv(dot, len(toks))))
    return out
