"""CTC greedy-collapse recognition kernel (FIXTURES.md §3).

Replaces the reference's per-word / per-cell tesseract subprocess
(src/get_nested_ocr.py:292, src/table_cellwise_detection.py:186) at the same
boundary: glyph-code sequence -> text. Vectorized with NumPy masks.
"""

from __future__ import annotations

import numpy as np

from ..synth import ALPHABET

_LUT = np.array(list(" " + ALPHABET))  # code 0 -> unused (blank dropped)


def ctc_decode_np(codes) -> str:
    """Merge repeats, drop blanks (0), map code i -> ALPHABET[i-1]."""
    c = np.asarray(codes, dtype=np.int64)
    if c.size == 0:
        return ""
    keep = np.empty(c.size, dtype=bool)
    keep[0] = True
    keep[1:] = c[1:] != c[:-1]
    keep &= c != 0
    return "".join(_LUT[c[keep]])
