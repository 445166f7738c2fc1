"""Vectorized box geometry kernels (NumPy) for the detection pandas-UDFs.

These are the engine-side counterparts of the reference's per-pair loops:
``iou`` (src/table_cellwise_detection.py:38-50), ``do_overlap`` (:23-27) and
``torchvision.ops.nms`` (:52-59) — implemented as broadcast matrix ops so one
Arrow batch of pages amortizes the Python cost (SURVEY.md §2.5 O1, §2.2 P4).
"""

from __future__ import annotations

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of two (n,4)/(m,4) int box arrays -> (n,m) float64."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    xA = np.maximum(a[:, None, 0], b[None, :, 0])
    yA = np.maximum(a[:, None, 1], b[None, :, 1])
    xB = np.minimum(a[:, None, 2], b[None, :, 2])
    yB = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(0, xB - xA) * np.maximum(0, yB - yA)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union.astype(np.float64)


def strict_overlap_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,m) bool: strict open-interval rectangle intersection (P4 semantics —
    touching edges do NOT overlap)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    disjoint = (
        (a[:, None, 0] >= b[None, :, 2])
        | (a[:, None, 2] <= b[None, :, 0])
        | (a[:, None, 3] <= b[None, :, 1])
        | (a[:, None, 1] >= b[None, :, 3])
    )
    return ~disjoint


def nms_indices(boxes: np.ndarray, scores: np.ndarray, threshold: float) -> np.ndarray:
    """Greedy NMS; returns kept indices in score-descending (tie: input order)
    processing order, suppressing IoU strictly greater than ``threshold``."""
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-np.asarray(scores, dtype=np.float64), kind="stable")
    M = iou_matrix(boxes, boxes)
    alive = np.ones(n, dtype=bool)
    kept: list[int] = []
    for i in order:
        if not alive[i]:
            continue
        kept.append(int(i))
        alive &= M[i] <= threshold
        alive[i] = False
    return np.asarray(kept, dtype=np.int64)
