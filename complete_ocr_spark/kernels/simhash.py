"""Arrow-batched SimHash-64 kernel — the measured alternative to the
64-wide Catalyst vote aggregation in ``functions.dedup.simhash64``.

Bit-exact parity contract with the Catalyst form (tested):

* token stream = ``split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')``
  reproduced as ``_WS.sub(" ", text.strip(" ").lower()).split(" ")`` —
  ``strip(" ")`` because Spark ``trim`` removes ASCII spaces only, the
  explicit ``[ \\t\\n\\x0b\\f\\r]`` class because Java regex ``\\s`` is ASCII
  while Python's is Unicode-aware, and ``str.split(" ")`` because Spark
  ``split`` (limit -1) keeps empty tokens;
* per-token bit b = bit (b % 4) of hex digit b // 4 of md5(token);
* vote = +1/-1 per token OCCURRENCE (not distinct); signature bit = vote > 0.

The kernel caches the per-token ±1 vote vector across every batch a task
sees (web corpora repeat tokens heavily) and reduces each document with one
numpy matmul. CPU cost sits in hashlib.md5 + numpy instead of 64 Catalyst
conditional projections per token — which of the two wins is measured, not
assumed (bench_simhash.py; result recorded in BASELINE.md).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd

SIMHASH64_SCHEMA = "doc string, simhash_hi bigint, simhash_lo bigint"  # string-id form; dedup.simhash64 adapts the id type

# Java regex \s (ASCII) — NOT Python \s (Unicode)
_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_POW2 = (1 << np.arange(32, dtype=np.uint64)).astype(np.float64)


def _token_votes(tok: str, cache: dict) -> np.ndarray:
    v = cache.get(tok)
    if v is None:
        d = hashlib.md5(tok.encode("utf-8")).hexdigest()
        bits = np.fromiter(
            ((int(d[b // 4], 16) >> (b % 4)) & 1 for b in range(64)),
            dtype=np.int64,
            count=64,
        )
        v = bits * 2 - 1
        cache[tok] = v
    return v


def _doc_signature(text: str, cache: dict) -> tuple[int, int]:
    toks = _WS.sub(" ", text.strip(" ").lower()).split(" ")
    counts = Counter(toks)
    mat = np.stack([_token_votes(t, cache) for t in counts])
    votes = np.asarray(list(counts.values()), dtype=np.int64) @ mat
    pos = (votes > 0).astype(np.float64)
    lo = int(pos[:32] @ _POW2)
    hi = int(pos[32:] @ _POW2)
    return hi, lo


def simhash64_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc, text) rows -> (doc, simhash_hi, simhash_lo).

    Rows with NULL text emit nothing — in the Catalyst form the explode of a
    null token array drops the document the same way."""
    cache: dict = {}
    for pdf in batches:
        docs, his, los = [], [], []
        for doc, text in zip(pdf["doc"], pdf["text"]):
            if text is None:
                continue
            hi, lo = _doc_signature(text, cache)
            docs.append(doc)
            his.append(hi)
            los.append(lo)
        yield pd.DataFrame(
            {
                "doc": docs,
                "simhash_hi": pd.Series(his, dtype="int64"),
                "simhash_lo": pd.Series(los, dtype="int64"),
            }
        )
