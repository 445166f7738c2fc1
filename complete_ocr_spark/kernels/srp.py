"""Arrow-batched SRP-LSH bucket kernel — the measured alternative to the
per-bit Catalyst ``aggregate(zip_with(...))`` folds in
``functions.similarity.srp_bucket``.

Parity contract with the Catalyst form (and the DuckDB oracle):

* bit j of table t = ``round(dot(v, plane_tj), 6) >= 0``. Under HALF_UP
  rounding that predicate is exactly ``dot > -5e-7`` (ties at -5e-7 round
  AWAY to -1e-6 < 0), so the kernel applies that threshold to the BLAS
  matmul result directly — no Python-side rounding-mode mismatch. The
  matmul's pairwise summation can differ from Spark's sequential fold only
  in the last ulp (~1e-16), which flips the predicate only if the true dot
  lies within ~1e-15 of -5e-7 — the same vanishing-measure caveat the
  6-decimal rounding already carries engine-to-engine (and the DuckDB
  parity gate would surface it deterministically).
* embeddings arrive float32 and are widened to float64 before the product,
  matching the fold's per-element ``cast("double")``.

One batch does n x (T*b) dot products as T (n x dim) @ (dim x b) matmuls —
the vectorized form of the brief's "F.aggregate/zip_with for the dot
product, or a vectorized Pandas UDF" scale note.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

def make_srp_buckets_batch(planes_by_table: list[list[list[float]]]):
    """mapInPandas kernel factory: (vid, v) rows -> (vid, tbl, bucket), one
    output row per (input row, table). The caller derives the output schema
    from its id column's type (ids may be bigint or string), so an empty
    batch yields nothing rather than guessing a vid dtype."""
    mats = [np.asarray(p, dtype=np.float64).T for p in planes_by_table]  # dim x b
    pows = [
        (1 << np.arange(m.shape[1], dtype=np.uint64)).astype(np.float64)
        for m in mats
    ]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            vids = pdf["vid"].to_numpy()
            frames = []
            for t, (m, p) in enumerate(zip(mats, pows)):
                bits = (e @ m) > -5e-7  # == round(dot, 6) >= 0 under HALF_UP
                buckets = (bits.astype(np.float64) @ p).astype(np.int64)
                frames.append(
                    pd.DataFrame(
                        {"vid": vids,
                         "tbl": np.full(len(vids), t, dtype=np.int32),
                         "bucket": buckets}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return fn
