"""Gap-sessionization kernel (W1/W2, SURVEY.md §2.6).

The reference assigns table rows by scanning y-sorted cells and bumping a
counter when the consecutive y1 gap exceeds a threshold
(src/table_cellwise_detection.py:149-156) and columns analogously per row
(:229-239). The vectorized form is the classic cumulative-sum-of-breaks.
"""

from __future__ import annotations

import numpy as np


def gap_sessionize(sorted_vals: np.ndarray, threshold: float) -> np.ndarray:
    """Given values already in scan order, return int session ids starting at 0,
    incremented whenever ``vals[i+1] - vals[i] > threshold`` (strict)."""
    v = np.asarray(sorted_vals, dtype=np.int64)
    if len(v) == 0:
        return np.empty(0, dtype=np.int64)
    breaks = (np.diff(v) > threshold).astype(np.int64)
    return np.concatenate([[0], np.cumsum(breaks)])
