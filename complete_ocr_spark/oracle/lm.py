"""Independent pure-Python reference for the hashed-bigram perplexity
filter (hashlib + Counter + math.log, no Spark, no shared code with
functions/lm.py beyond the published model spec).  Used by
tests/test_lm.py for cross-implementation parity."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

_WS = " \t\n\x0b\f\r"


def norm_tokens(text: str) -> list[str]:
    return [w for w in (text or "").strip(_WS).lower().translate(
        str.maketrans(_WS, " " * len(_WS))).split(" ") if w]


def bucket(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def tables(texts, n_buckets: int):
    """-> (w1_micros, w2_micros, uni_counts, bi_counts) lists by bucket."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = norm_tokens(t)
        if not toks:
            continue
        for w in toks[:-1]:
            uni[bucket(w, n_buckets)] += 1
        for a, b in zip(toks, toks[1:]):
            bi[bucket(f"{a} {b}", n_buckets)] += 1
    w1 = [math.floor(math.log(uni.get(b, 0) + n_buckets) * 1_000_000)
          for b in range(n_buckets)]
    w2 = [math.floor(math.log(bi.get(b, 0) + 1) * 1_000_000)
          for b in range(n_buckets)]
    return (w1, w2,
            [uni.get(b, 0) for b in range(n_buckets)],
            [bi.get(b, 0) for b in range(n_buckets)])


def score(rows, w1, w2, n_buckets: int):
    """rows: iterable of (doc_id, text) -> [(doc_id, n_bigrams,
    nll_micros, avg_nll_micros)] for docs with >= 2 tokens."""
    out = []
    for doc_id, text in rows:
        toks = norm_tokens(text)
        if len(toks) < 2:
            continue
        s = 0
        for a, b in zip(toks, toks[1:]):
            s += w2[bucket(f"{a} {b}", n_buckets)] - w1[bucket(a, n_buckets)]
        nll = -s
        out.append((doc_id, len(toks) - 1, nll, tdiv(nll, len(toks) - 1)))
    return out
