"""Golden equality: vectorized page kernel == oracle transcription, including
the hand-picked edge cases the reference trips on (SURVEY.md §5.2.2)."""

from __future__ import annotations

from complete_ocr_spark.kernels.page import extract_page_np
from complete_ocr_spark.oracle import extract_page
from complete_ocr_spark.oracle.reference_oracle import (
    get_hocr_from_table_response,
    get_tables_from_page,
)
from complete_ocr_spark.synth import resolve_descriptor


def _as_dicts(tuples):
    return [{"kind": k, "text": t, "media_ref": m} for k, t, m in tuples]


def test_page_kernel_equals_oracle_bulk():
    for i in range(300):
        mr = f"synth://page/doc-{i:08d}/{i % 13}"
        assert _as_dicts(extract_page_np(resolve_descriptor(mr), i % 13, mr)) == extract_page(
            mr, i % 13
        ), mr


def test_single_cell_table():
    dets = [
        {"box": [10, 10, 200, 100], "score": 0.9, "label": "table"},
        {"box": [20, 20, 100, 60], "score": 0.8, "label": "cell"},
    ]
    resp = get_tables_from_page(dets)
    assert len(resp) == 1 and resp[0]["nrows"] == 1
    hocr, bbox = get_hocr_from_table_response(resp[0], {1: [3, 1, 20]})
    assert '<td  title = "bbox 20 20 100 60" >cat</td>' in hocr
    assert bbox == [10, 10, 200, 100]


def test_table_without_cells_emits_nothing():
    dets = [{"box": [10, 10, 200, 100], "score": 0.9, "label": "table"}]
    assert get_tables_from_page(dets) == []


def test_touching_cell_does_not_join_table():
    # strict overlap: a cell sharing only the table's edge is excluded
    dets = [
        {"box": [10, 10, 200, 100], "score": 0.9, "label": "table"},
        {"box": [200, 10, 280, 60], "score": 0.8, "label": "cell"},
    ]
    assert get_tables_from_page(dets) == []


def test_element_below_all_lines_is_dropped():
    # the as-of merge's break-never-fires drop (pdf_ocr_frcnn_tesseract_ocr.py:181-199)
    dets = [
        {"box": [10, 10, 100, 30], "score": 0.95, "label": "word"},
        {"box": [10, 500, 300, 700], "score": 0.9, "label": "Figure"},
    ]
    desc = {"detections": dets, "glyphs": {0: [1, 2]}, "width": 800, "height": 1000}
    out = extract_page_np(desc, 0, "synth://page/x/0")
    kinds = [k for k, _, _ in out]
    assert kinds == ["text"]  # figure y1=500 > line y1=10 → never inserted


def test_bug_compatible_mean_width_uses_height():
    # cells 100 wide but only 10 tall: bug-width=10 → gap 50 > 0.5*10 → every
    # cell its own column (correct width would have merged columns differently)
    dets = [{"box": [0, 0, 500, 40], "score": 0.99, "label": "table"}] + [
        {"box": [x, 5, x + 100, 15], "score": 0.9, "label": "cell"}
        for x in (5, 155, 305)
    ]
    resp = get_tables_from_page(dets)
    hocr, _ = get_hocr_from_table_response(resp[0], {})
    assert hocr.count("<td") == 3  # 3 columns, one row
