"""Unit + property tests for the NumPy kernels vs the oracle transcription."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from complete_ocr_spark.kernels.boxes import iou_matrix, nms_indices, strict_overlap_matrix
from complete_ocr_spark.kernels.ctc import ctc_decode_np
from complete_ocr_spark.kernels.sessionize import gap_sessionize
from complete_ocr_spark.oracle.reference_oracle import (
    ctc_decode,
    do_overlap,
    iou,
    nms,
)

boxes_st = st.lists(
    st.tuples(
        st.integers(0, 500), st.integers(0, 500), st.integers(1, 200), st.integers(1, 200)
    ).map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]]),
    min_size=1,
    max_size=20,
)


@given(boxes_st, boxes_st)
@settings(max_examples=50, deadline=None)
def test_overlap_matrix_matches_reference(a, b):
    M = strict_overlap_matrix(np.array(a), np.array(b))
    for i, ba in enumerate(a):
        for j, bb in enumerate(b):
            assert M[i, j] == do_overlap(ba, bb)


def test_overlap_touching_edges_do_not_overlap():
    # strict-inequality edge of src/table_cellwise_detection.py:23-27
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[10, 0, 20, 10], [0, 10, 10, 20], [9, 9, 30, 30]])
    assert strict_overlap_matrix(a, b).tolist() == [[False, False, True]]


@given(boxes_st)
@settings(max_examples=50, deadline=None)
def test_iou_matrix_matches_reference(bs):
    M = iou_matrix(np.array(bs), np.array(bs))
    for i in range(len(bs)):
        for j in range(len(bs)):
            assert M[i, j] == pytest.approx(iou(bs[i], bs[j]))


@given(boxes_st, st.floats(0.0001, 0.9))
@settings(max_examples=60, deadline=None)
def test_nms_matches_oracle_and_pairwise_bound(bs, thr):
    rng = np.random.RandomState(0)
    scores = np.round(rng.rand(len(bs)), 6)
    items = [{"box": b, "score": float(s)} for b, s in zip(bs, scores)]
    kept_o = nms(items, thr)
    kept_k = nms_indices(np.array(bs), scores, thr)
    assert [items[i] for i in kept_k] == kept_o
    # property: pairwise IoU of survivors <= thr
    kb = np.array(bs)[kept_k]
    M = iou_matrix(kb, kb)
    np.fill_diagonal(M, 0)
    assert (M <= thr).all()


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=50), st.floats(0, 100))
@settings(max_examples=50, deadline=None)
def test_sessionize_monotone_and_matches_scan(vals, thr):
    v = sorted(vals)
    ids = gap_sessionize(np.array(v), thr)
    # monotone non-decreasing, steps of at most 1, starts at 0
    assert ids[0] == 0
    assert all(0 <= b - a <= 1 for a, b in zip(ids, ids[1:]))
    # matches the reference's scan loop (src/table_cellwise_detection.py:150-156)
    assign, expect = 0, [0]
    for i in range(len(v) - 1):
        if v[i + 1] - v[i] > thr:
            assign += 1
        expect.append(assign)
    assert ids.tolist() == expect


@given(st.lists(st.integers(0, 26), max_size=40))
@settings(max_examples=80, deadline=None)
def test_ctc_decode_matches_oracle(codes):
    assert ctc_decode_np(codes) == ctc_decode(codes)


def test_ctc_examples():
    # collapse repeats then drop blanks: [1,1,0,1,2,2] -> "aab"
    assert ctc_decode_np([1, 1, 0, 1, 2, 2]) == "aab"
    assert ctc_decode_np([0, 0, 0]) == ""
    assert ctc_decode_np([]) == ""
