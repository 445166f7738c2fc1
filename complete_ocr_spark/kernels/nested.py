"""Vectorized Nested-OCR page kernel (the engine side of oracle/nested.py).

NumPy grouping + f-string serialization of the nested hOCR export
(src/get_nested_ocr.py:34-134): ``ocr_page / ocr_carea / ocr_par / ocr_line /
ocrx_word`` with monotone id counters (A7) and per-word ``x_wconf``. Golden
test asserts byte equality against the oracle's ElementTree build, so every
serialization quirk (ET's `` />`` self-closing empties, attribute order, the
reference's in-string-continuation whitespace runs) is pinned here.

Runs inside a mapInPandas batch — page-local, shuffle-free, replaces the
reference's per-word tesseract subprocess (src/get_nested_ocr.py:292) with the
batched CTC decode. Word text is CTC-alphabet lowercase, so no XML escaping is
required (ET would escape ``&<>`` — impossible here by construction).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..config import NESTED_BLOCK_GAP_FACTOR, ROW_DETERMINING_THRESHOLD
from ..synth import resolve_descriptor
from .ctc import ctc_decode_np
from .sessionize import gap_sessionize

# ET serialization of the constant head (oracle/nested.py export_as_xml):
# elements without children/text self-close with a space (`` />``).
_HEAD = (
    '<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en"><head>'
    "<title>docTR - XML export (hOCR)</title>"
    '<meta http-equiv="Content-Type" content="text/html; charset=utf-8" />'
    '<meta name="ocr-system" content="python-doctr" />'
    '<meta name="ocr-capabilities" content="ocr_page ocr_carea ocr_par ocr_line ocrx_word" />'
    "</head><body>"
)
_CONT20 = " " * 20  # swallowed indentation, src/get_nested_ocr.py:88-89,98-99
_CONT24 = " " * 24  # :112-114

NESTED_SCHEMA = (
    "doc_id string, offset int, media_ref string, hocr string, "
    "page_text string, n_blocks int, n_lines int, n_words int"
)


def _px(norm: np.float32, dim: int) -> int:
    """Normalized float32 -> pixel, the F7 edge: int(round(v * dim))
    (src/get_nested_ocr.py:88,112,127)."""
    return int(round(float(norm) * dim))


def _group_page(desc: dict):
    """Descriptor -> (lines, block_of): the words->lines->blocks grouping
    shared by the export and the W5 singular-word kernel. ``lines`` is a list
    of (line_bbox, member_boxes, member_det_indices, member_scores); empty if
    the page has no word detections."""
    dets = desc["detections"]
    w_rows = [(i, d["box"], d["score"]) for i, d in enumerate(dets) if d["label"] == "word"]
    if not w_rows:
        return [], None

    idx = np.array([r[0] for r in w_rows], dtype=np.int64)
    boxes = np.array([r[1] for r in w_rows], dtype=np.int64)
    scores = np.array([r[2] for r in w_rows], dtype=np.float64)
    order = np.argsort(boxes[:, 1] + boxes[:, 3], kind="stable")
    sb, si, ss = boxes[order], idx[order], scores[order]
    mean_h = int((boxes[:, 3] - boxes[:, 1]).mean())
    line_of = gap_sessionize(sb[:, 1], ROW_DETERMINING_THRESHOLD * mean_h)

    # per-line member gather (x-sorted) + line pixel bboxes
    lines: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
    for li in range(int(line_of[-1]) + 1):
        m = line_of == li
        lb, lwi, lsc = sb[m], si[m], ss[m]
        xo = np.argsort(lb[:, 0], kind="stable")
        lb, lwi, lsc = lb[xo], lwi[xo], lsc[xo]
        bbox = np.array([lb[:, 0].min(), lb[:, 1].min(), lb[:, 2].max(), lb[:, 3].max()])
        lines.append((bbox, lb, lwi, lsc))

    # blocks: coarser gap pass over line y1
    line_y1 = np.array([ln[0][1] for ln in lines], dtype=np.int64)
    line_h = np.array([ln[0][3] - ln[0][1] for ln in lines], dtype=np.int64)
    mean_line_h = int(line_h.mean())
    block_of = gap_sessionize(line_y1, NESTED_BLOCK_GAP_FACTOR * mean_line_h)
    return lines, block_of


def nested_page_np(desc: dict) -> tuple[str, str, int, int, int]:
    """One descriptor -> (hocr, page_text, n_blocks, n_lines, n_words)."""
    width, height = desc["width"], desc["height"]
    glyphs = desc["glyphs"]

    parts = [
        _HEAD,
        f'<div class="ocr_page" id="page_2" title="image; bbox 0 0 {width} {height}; ppageno 0" />',
    ]
    page_text_parts: list[str] = []
    n_blocks = n_lines = n_words = 0

    lines, block_of = _group_page(desc)
    if lines:
        w32, h32 = np.float32(width), np.float32(height)

        def norm4(b) -> tuple:
            return (
                np.float32(b[0]) / w32, np.float32(b[1]) / h32,
                np.float32(b[2]) / w32, np.float32(b[3]) / h32,
            )

        block_count = line_count = word_count = 1
        for bi in range(int(block_of[-1]) + 1):
            members = [lines[k] for k in range(len(lines)) if block_of[k] == bi]
            bb = np.array(
                [
                    min(ln[0][0] for ln in members),
                    min(ln[0][1] for ln in members),
                    max(ln[0][2] for ln in members),
                    max(ln[0][3] for ln in members),
                ]
            )
            nx1, ny1, nx2, ny2 = norm4(bb)
            bt = (
                f"bbox {_px(nx1, width)} {_px(ny1, height)} "
                f"{_CONT20}{_px(nx2, width)} {_px(ny2, height)}"
            )
            parts.append(
                f'<div class="ocr_carea" id="block_{block_count}" title="{bt}">'
                f'<p class="ocr_par" id="par_{block_count}" title="{bt}">'
            )
            block_count += 1
            for bbox, lb, lwi, lsc in members:
                lx1, ly1, lx2, ly2 = norm4(bbox)
                parts.append(
                    f'<span class="ocr_line" id="line_{line_count}" '
                    f'title="bbox {_px(lx1, width)} {_px(ly1, height)} '
                    f"{_CONT24}{_px(lx2, width)} {_px(ly2, height)}; "
                    f'{_CONT24}baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0">'
                )
                line_count += 1
                for k in range(len(lwi)):
                    wx1, wy1, wx2, wy2 = norm4(lb[k])
                    text = ctc_decode_np(glyphs.get(int(lwi[k]), ()))
                    wt = (
                        f"bbox {_px(wx1, width)} {_px(wy1, height)} "
                        f"{_px(wx2, width)} {_px(wy2, height)}; "
                        f"x_wconf {int(round(lsc[k] * 100))}"
                    )
                    if text:
                        parts.append(
                            f'<span class="ocrx_word" id="word_{word_count}" '
                            f'title="{wt}">{text}</span>'
                        )
                    else:  # ET self-closes empty-text elements
                        parts.append(
                            f'<span class="ocrx_word" id="word_{word_count}" '
                            f'title="{wt}" />'
                        )
                    word_count += 1
                    page_text_parts.append(" " + text)
                parts.append("</span>")
            parts.append("</p></div>")
        n_blocks = block_count - 1
        n_lines = line_count - 1
        n_words = word_count - 1

    parts.append("</body></html>")
    return "".join(parts), "".join(page_text_parts), n_blocks, n_lines, n_words


SINGULAR_SCHEMA = (
    "doc_id string, offset int, media_ref string, block_id int, "
    "div_x1 int, div_y1 int, div_x2 int, div_y2 int, "
    "par_x1 int, par_y1 int, par_x2 int, par_y2 int, n_lines_final int"
)


def singular_merge_np(desc: dict) -> list[tuple]:
    """W5 geometric half (engine side of oracle.nested.singular_word_merge):
    per-block final div/par title bboxes + line counts after the
    singular-word treatment. Sequential by construction (the experiment
    mutates the DOM while scanning, :6-32) but page-local — it runs inside
    the Arrow batch, no shuffle."""
    width, height = desc["width"], desc["height"]
    lines, block_of = _group_page(desc)
    if not lines:
        return []
    w32, h32 = np.float32(width), np.float32(height)

    def px4(b):
        return [
            int(round(float(np.float32(b[0]) / w32) * width)),
            int(round(float(np.float32(b[1]) / h32) * height)),
            int(round(float(np.float32(b[2]) / w32) * width)),
            int(round(float(np.float32(b[3]) / h32) * height)),
        ]

    blocks = []
    doc_lines = []
    for bi in range(int(block_of[-1]) + 1):
        members = [lines[k] for k in range(len(lines)) if block_of[k] == bi]
        bb = [
            min(ln[0][0] for ln in members), min(ln[0][1] for ln in members),
            max(ln[0][2] for ln in members), max(ln[0][3] for ln in members),
        ]
        pb = px4(bb)
        blocks.append({"div": list(pb), "par": list(pb)})
        for bbox, _lb, lwi, _lsc in members:
            doc_lines.append({"bbox": px4(bbox), "n_words": len(lwi),
                              "block": bi, "par": bi})

    for k in range(len(blocks)):
        curr = next((ln for ln in doc_lines if ln["block"] == k), None)
        if curr is None or curr["n_words"] > 3:
            continue
        if k == 0:
            continue  # prev div is ocr_page; its title parse raises (:18)
        c = curr["bbox"]
        d = blocks[k - 1]["div"]
        p = blocks[k - 1]["par"]
        blocks[k - 1]["div"] = [min(c[0], d[0]), min(c[1], d[1]),
                                max(c[2], d[2]), max(c[3], d[3])]
        blocks[k - 1]["par"] = [min(c[0], p[0]), min(c[1], p[1]),
                                max(c[2], p[2]), max(c[3], p[3])]
        i = doc_lines.index(curr)
        curr["par"] = doc_lines[i - 1]["par"]

    return [
        (
            k + 1, *blocks[k]["div"], *blocks[k]["par"],
            sum(1 for ln in doc_lines if ln["par"] == k),
        )
        for k in range(len(blocks))
    ]


def singular_merge_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: media-span rows -> SINGULAR_SCHEMA rows."""
    cols = ("block_id", "div_x1", "div_y1", "div_x2", "div_y2",
            "par_x1", "par_y1", "par_x2", "par_y2", "n_lines_final")
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "offset", "media_ref") + cols}
        for doc_id, off, mref in zip(pdf["doc_id"], pdf["offset"], pdf["media_ref"]):
            for row in singular_merge_np(resolve_descriptor(mref)):
                out["doc_id"].append(doc_id)
                out["offset"].append(off)
                out["media_ref"].append(mref)
                for c, v in zip(cols, row):
                    out[c].append(v)
        pdf_out = pd.DataFrame(out)
        for c in ("offset",) + cols:
            pdf_out[c] = pdf_out[c].astype("int32")
        yield pdf_out


def nested_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, offset, media_ref) media-span rows ->
    nested hOCR rows (NESTED_SCHEMA)."""
    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "offset", "media_ref", "hocr", "page_text",
            "n_blocks", "n_lines", "n_words",
        )}
        for doc_id, off, mref in zip(pdf["doc_id"], pdf["offset"], pdf["media_ref"]):
            hocr, text, nb, nl, nw = nested_page_np(resolve_descriptor(mref))
            out["doc_id"].append(doc_id)
            out["offset"].append(off)
            out["media_ref"].append(mref)
            out["hocr"].append(hocr)
            out["page_text"].append(text)
            out["n_blocks"].append(nb)
            out["n_lines"].append(nl)
            out["n_words"].append(nw)
        pdf_out = pd.DataFrame(out)
        for c in ("offset", "n_blocks", "n_lines", "n_words"):
            pdf_out[c] = pdf_out[c].astype("int32")
        yield pdf_out
