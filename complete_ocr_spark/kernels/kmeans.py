"""Arrow-batched partial aggregation for distributed Lloyd k-means.

The per-dimension form of ``similarity.ivf_train_kmeans`` materializes
n x dim narrow rows through a posexplode generator and hash-aggregates them
JVM-side. This kernel is the vector-wise alternative (round-3 verdict #4):
each Arrow batch collapses its member vectors to ONE partial sum per cell —
a numpy column sum over an (n_batch, dim) int64 matrix — so the aggregation
input shrinks from n x dim rows to (#batches x cells) array rows before any
shuffle, and the final per-cell combine is a zip_with fold over a bounded
partial list.

Exactness contract (what keeps q_ivf_train hash-green across engines): the
driver scales coordinates JVM-side to 10^6-fixed-point int64 BEFORE the
kernel (round(x, 6) * 1e6 via DECIMAL — Spark's HALF_UP, not numpy's
round-half-even), so the kernel only ever adds integers: partial sums are
exact and order-independent, bit-identical to the oracle's DECIMAL(28,6)
sums. int64 headroom: |coord| <= ~10^3 scales to 10^9; overflow needs
> ~9·10^9 members per cell — and training runs on samples far below that
(similarity.ivf_train_kmeans docstring).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def partial_cell_sums_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(cell int, sv array<long>) rows -> one (cell, psum, pcnt) partial per
    distinct cell per Arrow batch."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        cells = pdf["cell"].to_numpy()
        mat = np.vstack(pdf["sv"].to_numpy()).astype(np.int64, copy=False)
        out_cells: list[int] = []
        out_sums: list[list[int]] = []
        out_cnts: list[int] = []
        for c in np.unique(cells):
            m = cells == c
            out_cells.append(int(c))
            out_sums.append(mat[m].sum(axis=0, dtype=np.int64).tolist())
            out_cnts.append(int(m.sum()))
        yield pd.DataFrame({"cell": out_cells, "psum": out_sums, "pcnt": out_cnts})
