"""Vectorized per-page extraction kernel.

The engine-side (NumPy) implementation of the reference's per-page body
(src/pdf_ocr_frcnn_tesseract_ocr.py:123-204 + src/table_cellwise_detection.py):
detection threshold (P1) -> per-class NMS (O1) -> cell∈table overlap join (J1)
-> row/col gap sessionization (W1/W2, bug-compatible A2 width) -> grid bbox
union (A4/W4) -> CTC recognition stand-in (U6/U7) -> table/figure markup
(F1/F2) -> table-mask word anti-join (U9) -> line grouping -> as-of positional
merge (J2).

This runs *inside* the media-branch pandas UDF, one call per page of an Arrow
batch — page-local, shuffle-free. Golden-tested for exact equality against
``complete_ocr_spark.oracle.extract_page``.
"""

from __future__ import annotations

import numpy as np

from ..config import (
    COL_DETERMINING_THRESHOLD,
    DET_THRESHOLD,
    FIGURE_SCORE_THRESHOLD,
    NMS_CELL_THRESHOLD,
    NMS_TABLE_THRESHOLD,
    ROW_DETERMINING_THRESHOLD,
)
from .boxes import nms_indices, strict_overlap_matrix
from .ctc import ctc_decode_np
from .sessionize import gap_sessionize

_EMPTY_BOXES = np.empty((0, 4), dtype=np.int64)


def _recognize(glyphs: dict, det_idx: np.ndarray) -> str:
    """Merged-crop recognition stand-in: CTC decode over the concatenation of
    the member detections' glyph sequences, in gather order."""
    cat: list[int] = []
    for i in det_idx:
        cat.extend(glyphs.get(int(i), ()))
    return ctc_decode_np(cat)


def _table_hocr(boxes: np.ndarray, det_idx: np.ndarray, tab_box: np.ndarray,
                glyphs: dict) -> str:
    """Table structure + markup for one table's member cells.

    ``boxes``/``det_idx`` are the cells overlapping this table, in NMS output
    order (the reference's ``cells`` list order at
    src/table_cellwise_detection.py:134-136).
    """
    # row sessionization over y1+y2-sorted cells (:143-156)
    order = np.argsort(boxes[:, 1] + boxes[:, 3], kind="stable")
    sb, si = boxes[order], det_idx[order]
    mean_h = int((boxes[:, 3] - boxes[:, 1]).mean())
    row_of = gap_sessionize(sb[:, 1], ROW_DETERMINING_THRESHOLD * mean_h)
    nrows = int(row_of[-1]) + 1

    # per-row x-sort + column sessionization (bug-compatible mean "width" from
    # height indices, :226-227), then the dense-grid emission (:241-265)
    row_members: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    max_col_per_row = []
    for r in range(nrows):
        m = row_of == r
        rb, ri = sb[m], si[m]
        xo = np.argsort(rb[:, 0], kind="stable")
        rb, ri = rb[xo], ri[xo]
        mean_w = int((rb[:, 3] - rb[:, 1]).mean())  # BUG-compatible (A2)
        col_of = gap_sessionize(rb[:, 0], COL_DETERMINING_THRESHOLD * mean_w)
        row_members.append((rb, ri, col_of))
        max_col_per_row.append(int(col_of[-1]))
    ncols = max(max_col_per_row) + 1

    parts = [
        '<table class="ocr_tab" border=1 style="margin: 0px auto; text-align: center;"',
        f' title = "bbox {tab_box[0]} {tab_box[1]} {tab_box[2]} {tab_box[3]}" >',
    ]
    for r in range(nrows):
        rb, ri, col_of = row_members[r]
        parts.append("<tr>")
        for j in range(ncols):
            m = col_of == j
            if not m.any():
                parts.append("<td  >" + "" + "</td>")
                continue
            mb = rb[m]
            x1, y1 = mb[:, 0].min(), mb[:, 1].min()
            x2, y2 = mb[:, 2].max(), mb[:, 3].max()
            text = _recognize(glyphs, ri[m])
            parts.append(f'<td  title = "bbox {x1} {y1} {x2} {y2}" >' + text + "</td>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


def _page_arrays(descriptor: dict):
    """Descriptor -> (boxes, scores, labels, idx) numpy views."""
    dets = descriptor["detections"]
    n = len(dets)
    boxes = (
        np.array([d["box"] for d in dets], dtype=np.int64).reshape(n, 4)
        if n
        else _EMPTY_BOXES
    )
    scores = np.array([d["score"] for d in dets], dtype=np.float64)
    labels = np.array([d["label"] for d in dets])
    return boxes, scores, labels, np.arange(n, dtype=np.int64)


def _detect_tables(boxes, scores, labels, idx) -> list[tuple[np.ndarray, np.ndarray]]:
    """P1 threshold -> per-class NMS (O1) -> cell∈table overlap join (J1).

    Returns [(table_box, member_cell_indices), ...]; tables without cells emit
    nothing (src/pdf_ocr_frcnn_tesseract_ocr.py:141 — len check on tabledata).
    The FRCNN head emits score-sorted boxes, so the stand-in sorts by
    (-score, index) first (see oracle.get_tables_from_page docstring)."""
    tc = idx[(labels == "table") | (labels == "cell")]
    tc = tc[np.argsort(-scores[tc], kind="stable")]
    tc = tc[scores[tc] >= DET_THRESHOLD]  # P1
    t_idx = tc[labels[tc] == "table"]
    c_idx = tc[labels[tc] == "cell"]

    # per-class NMS (O1)
    t_keep = t_idx[nms_indices(boxes[t_idx], scores[t_idx], NMS_TABLE_THRESHOLD)]
    c_keep = c_idx[nms_indices(boxes[c_idx], scores[c_idx], NMS_CELL_THRESHOLD)]

    out: list[tuple[np.ndarray, np.ndarray]] = []
    if len(t_keep):
        ov = (
            strict_overlap_matrix(boxes[t_keep], boxes[c_keep])
            if len(c_keep)
            else np.zeros((len(t_keep), 0), dtype=bool)
        )
        for ti in range(len(t_keep)):
            members = c_keep[ov[ti]]
            if len(members) == 0:
                continue
            out.append((boxes[t_keep[ti]], members))
    return out


def _group_lines(wb: np.ndarray, w_idx: np.ndarray):
    """W1 y-gap sessionize over y1+y2-sorted word boxes, x-sorted per line.

    Returns [(line_bbox, member_boxes, member_indices), ...]."""
    order = np.argsort(wb[:, 1] + wb[:, 3], kind="stable")
    sw, swi = wb[order], w_idx[order]
    mean_h = int((wb[:, 3] - wb[:, 1]).mean())
    line_of = gap_sessionize(sw[:, 1], ROW_DETERMINING_THRESHOLD * mean_h)
    lines = []
    for li in range(int(line_of[-1]) + 1):
        m = line_of == li
        lb, lwi = sw[m], swi[m]
        xo = np.argsort(lb[:, 0], kind="stable")
        lb, lwi = lb[xo], lwi[xo]
        bbox = np.array([lb[:, 0].min(), lb[:, 1].min(), lb[:, 2].max(), lb[:, 3].max()])
        lines.append((bbox, lb, lwi))
    return lines


def extract_page_np(descriptor: dict, page: int, media_ref: str,
                    variant: str = "src") -> list[tuple]:
    """One page -> output spans [(kind, text, media_ref), ...] in reading order.

    ``variant="src"`` = Current Version semantics (figure detection on the
    unmasked page, src/pdf_ocr_frcnn_tesseract_ocr.py:159); ``"optimized"`` =
    optimized_code/main.py:84-106, where the detector sees the table-masked
    array — figures overlapping a masked table are suppressed and numbering
    runs over the survivors."""
    glyphs = descriptor["glyphs"]
    boxes, scores, labels, idx = _page_arrays(descriptor)

    tabledata: list[tuple[str, np.ndarray]] = []
    masked: list[np.ndarray] = []
    for tab_box, members in _detect_tables(boxes, scores, labels, idx):
        hocr = _table_hocr(boxes[members], members, tab_box, glyphs)
        tabledata.append((hocr, tab_box))
        masked.append(tab_box)

    # figures: score >= 0.8, detection order (F2)
    figuredata: list[tuple[str, np.ndarray, int]] = []
    f_idx = idx[(labels == "Figure") & (scores >= FIGURE_SCORE_THRESHOLD)]
    if variant == "optimized" and masked and len(f_idx):
        hit = strict_overlap_matrix(boxes[f_idx], np.stack(masked)).any(axis=1)
        f_idx = f_idx[~hit]
    for fn, fi in enumerate(f_idx):
        b = boxes[fi]
        name = f"/Cropped_Images/figure_{page}_{fn}.jpg"
        markup = f'<img class="ocr_im" title="bbox {b[0]} {b[1]} {b[2]} {b[3]}" src="../{name}">'
        figuredata.append((markup, b, fn))

    # words surviving the table mask (U9: set subtraction, not pixel fill)
    w_idx = idx[labels == "word"]
    if len(w_idx) and masked:
        hit = strict_overlap_matrix(boxes[w_idx], np.stack(masked)).any(axis=1)
        w_idx = w_idx[~hit]

    # line grouping (same W1 sessionization) + markup
    line_boxes: list[np.ndarray] = []
    line_markup: list[str] = []
    if len(w_idx):
        for bbox, lb, lwi in _group_lines(boxes[w_idx], w_idx):
            text = " ".join(ctc_decode_np(glyphs.get(int(i), ())) for i in lwi)
            line_boxes.append(bbox)
            line_markup.append(
                f'<span class="ocr_line" title="bbox {bbox[0]} {bbox[1]} {bbox[2]} {bbox[3]}">{text}</span>'
            )

    # as-of positional merge (J2): insert before first line with y1 strictly
    # greater; un-insertable elements drop (bug-compatible)
    pre: list[list[tuple]] = [[] for _ in line_boxes]
    if line_boxes:
        line_y1 = np.array([b[1] for b in line_boxes], dtype=np.int64)
        page_key = media_ref.split("synth://page/", 1)[-1]
        for hocr, b in tabledata:
            gt = line_y1 > int(b[1])
            if gt.any():
                pre[int(gt.argmax())].append(("text", hocr, None))
        for markup, b, fn in figuredata:
            gt = line_y1 > int(b[1])
            if gt.any():
                pre[int(gt.argmax())].append(
                    ("media_ref", markup, f"synth://figure/{page_key}/{fn}")
                )

    out: list[tuple] = []
    for li in range(len(line_boxes)):
        out.extend(pre[li])
        out.append(("text", line_markup[li], None))
    return out


def page_text_views_np(descriptor: dict) -> tuple[str, int, int]:
    """U4 text-view asymmetry: (txt_unmasked, n_words_unmasked, n_words_masked).

    The reference's .txt sink OCRs the UNMASKED page
    (src/pdf_ocr_frcnn_tesseract_ocr.py:136-138, before the masking at
    :141-156) while the .hocr sink OCRs the masked one (:169): table-region
    words appear in .txt only. image_to_string stand-in: newline-joined line
    texts over ALL words; masked count drops table-overlapping words (U9)."""
    glyphs = descriptor["glyphs"]
    boxes, scores, labels, idx = _page_arrays(descriptor)
    masked = [tab_box for tab_box, _m in _detect_tables(boxes, scores, labels, idx)]

    w_idx = idx[labels == "word"]
    if not len(w_idx):
        return "", 0, 0
    texts = []
    for _bbox, _lb, lwi in _group_lines(boxes[w_idx], w_idx):
        texts.append(" ".join(ctc_decode_np(glyphs.get(int(i), ())) for i in lwi))
    n_unmasked = len(w_idx)

    wm_idx = w_idx
    if masked:
        hit = strict_overlap_matrix(boxes[wm_idx], np.stack(masked)).any(axis=1)
        wm_idx = wm_idx[~hit]
    return "\n".join(texts), int(n_unmasked), int(len(wm_idx))
