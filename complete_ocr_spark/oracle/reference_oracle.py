"""Pure-Python oracle: verbatim transcription of the reference algorithms.

Every function cites the reference file:line it transcribes
(``/root/reference/...``). This module is deliberately written as plain loops —
the *slow, obviously-correct* shape — and is the golden source for the
north_rule correctness gate: the Spark pipeline must produce exact
span-sequence equality ``(kind, text, media_ref, order)`` per document
against :func:`extract_document`.

Bug-compatible semantics preserved on purpose (SURVEY.md §2 flags them):

* mean "width" computed from *height* indices ``c[3]-c[1]``
  (src/table_cellwise_detection.py:226-227);
* strict-inequality rectangle overlap (src/table_cellwise_detection.py:23-27);
* elements whose y1 is >= every line's y1 are silently dropped by the
  insert-before-first-greater merge (src/pdf_ocr_frcnn_tesseract_ocr.py:181-199
  — the ``break`` never fires, the element is never inserted);
* doubled space in ``<td  ...>`` / ``src="..//Cropped_Images/..."`` markup
  (src/table_cellwise_detection.py:263, src/pdf_ocr_frcnn_tesseract_ocr.py:249).
"""

from __future__ import annotations

import re

import numpy as np

from ..config import (
    COL_DETERMINING_THRESHOLD,
    DET_THRESHOLD,
    FIGURE_SCORE_THRESHOLD,
    NMS_CELL_THRESHOLD,
    NMS_TABLE_THRESHOLD,
    ROW_DETERMINING_THRESHOLD,
    STRIP_MAX_LINK_DENSITY,
    STRIP_MIN_WORDS,
    SYNTH_SEED,
)
from ..synth import ALPHABET, resolve_descriptor


# ---------------------------------------------------------------------------
# recognition stand-in (FIXTURES.md §3): CTC greedy collapse
# ---------------------------------------------------------------------------

def ctc_decode(codes: list[int]) -> str:
    """Greedy CTC collapse: merge repeats, then drop blanks (code 0).

    Stands in at the exact boundary where the reference shells out to
    tesseract per word/cell (src/get_nested_ocr.py:292,
    src/table_cellwise_detection.py:186).
    """
    out = []
    prev = None
    for c in codes:
        if c != prev and c != 0:
            out.append(ALPHABET[c - 1])
        prev = c
    return "".join(out)


def recognize(glyph_seqs: list[list[int]]) -> str:
    """Merged-crop recognition stand-in: CTC decode of the concatenated glyph
    sequences of the constituent detections (in gather order)."""
    cat: list[int] = []
    for seq in glyph_seqs:
        cat.extend(seq)
    return ctc_decode(cat)


# ---------------------------------------------------------------------------
# geometry (src/table_cellwise_detection.py)
# ---------------------------------------------------------------------------

def do_overlap(b1, b2) -> bool:
    """Strict open-interval overlap (src/table_cellwise_detection.py:23-27)."""
    if (b1[0] >= b2[2]) or (b1[2] <= b2[0]) or (b1[3] <= b2[1]) or (b1[1] >= b2[3]):
        return False
    return True


def iou(boxA, boxB) -> float:
    """IoU (src/table_cellwise_detection.py:38-50)."""
    xA = max(boxA[0], boxB[0])
    yA = max(boxA[1], boxB[1])
    xB = min(boxA[2], boxB[2])
    yB = min(boxA[3], boxB[3])
    inter = max(0, xB - xA) * max(0, yB - yA)
    areaA = (boxA[2] - boxA[0]) * (boxA[3] - boxA[1])
    areaB = (boxB[2] - boxB[0]) * (boxB[3] - boxB[1])
    return inter / float(areaA + areaB - inter)


def nms(items: list[dict], threshold: float) -> list[dict]:
    """Greedy NMS matching torchvision.ops.nms semantics
    (src/table_cellwise_detection.py:52-59): process by score descending
    (ties: lower original index first), suppress boxes with IoU strictly
    greater than the threshold against any kept box."""
    order = sorted(range(len(items)), key=lambda i: (-items[i]["score"], i))
    kept: list[dict] = []
    for i in order:
        if all(iou(items[i]["box"], k["box"]) <= threshold for k in kept):
            kept.append(items[i])
    return kept


# ---------------------------------------------------------------------------
# table structure (src/table_cellwise_detection.py:61-269)
# ---------------------------------------------------------------------------

def get_tables_from_page(detections: list[dict]) -> list[dict]:
    """Transcribes get_tables_from_page (src/table_cellwise_detection.py:61-182)
    with the model call replaced by descriptor detections.

    The FRCNN head emits boxes score-sorted descending; the reference's
    ``classes = pred_classes[:len(boxes)]`` prefix-trim (:103,:110) is only
    consistent under that ordering, so the stand-in detector output is the
    table/cell detections sorted by (-score, index) before thresholding.
    """
    tc = [
        dict(d, idx=i)
        for i, d in enumerate(detections)
        if d["label"] in ("table", "cell")
    ]
    tc.sort(key=lambda d: (-d["score"], d["idx"]))
    kept = [d for d in tc if d["score"] >= DET_THRESHOLD]  # :103

    unfiltered_tables = [d for d in kept if d["label"] == "table"]  # :118-124
    unfiltered_cells = [d for d in kept if d["label"] == "cell"]

    tables = nms(unfiltered_tables, NMS_TABLE_THRESHOLD) if unfiltered_tables else []
    cells = nms(unfiltered_cells, NMS_CELL_THRESHOLD) if unfiltered_cells else []

    full_table_response = []
    for tab in tables:  # :134
        tabcells = [c for c in cells if do_overlap(tab["box"], c["box"])]  # :30-36
        if len(tabcells) == 0:  # :141 — tables without cells produce nothing
            continue
        # sort cells by y1+y2 (:143); python sorted is stable like the ref's
        strcells = sorted(tabcells, key=lambda c: c["box"][1] + c["box"][3])
        cell_heights = [c["box"][3] - c["box"][1] for c in tabcells]  # :146
        mean_height = int(np.mean(cell_heights))  # :147
        cellrow = [0]  # :150-156
        assign_row = 0
        for i in range(len(strcells) - 1):
            consec = strcells[i + 1]["box"][1] - strcells[i]["box"][1]
            if consec > ROW_DETERMINING_THRESHOLD * mean_height:
                assign_row += 1
            cellrow.append(assign_row)
        rows = sorted(set(cellrow))  # :159 list(set(...)) — contiguous ints, asc
        cellrows = {}
        for i in rows:  # :167-174
            row_cells = [strcells[j] for j in range(len(strcells)) if cellrow[j] == i]
            cellrows[i] = sorted(row_cells, key=lambda c: c["box"][0])
        full_table_response.append(
            {
                "bbox": tab["box"],
                "nrows": len(rows),
                "ncells": len(strcells),
                "cellrows": cellrows,
            }
        )
    return full_table_response


def _get_merged_cell(final_cells):
    """src/table_cellwise_detection.py:189-197 (bbox union)."""
    if len(final_cells) == 1:
        return final_cells[0]["box"], [final_cells[0]]
    x1 = min(c["box"][0] for c in final_cells)
    y1 = min(c["box"][1] for c in final_cells)
    x2 = max(c["box"][2] for c in final_cells)
    y2 = max(c["box"][3] for c in final_cells)
    return [x1, y1, x2, y2], final_cells


def get_hocr_from_table_response(tableresponse: dict, glyphs: dict) -> list:
    """src/table_cellwise_detection.py:213-269 — table hOCR string, with the
    per-cell tesseract crop (:262, get_cell_text :184-187) replaced by the CTC
    stand-in over the merged cell's constituent glyph sequences."""
    tablecellrows = tableresponse["cellrows"]
    nrows = tableresponse["nrows"]
    tablebbox = tableresponse["bbox"]

    final_skeleton = []
    max_entries_per_row = []
    for row in tablecellrows:  # dict insertion order = ascending row index
        row_to_consider = tablecellrows[row]
        # BUG-compatible "width" from height indices (:226-227)
        cell_widths = [c["box"][3] - c["box"][1] for c in row_to_consider]
        mean_width = int(np.mean(cell_widths))
        ltor_cells = sorted(row_to_consider, key=lambda c: c["box"][0])  # :229
        col_to_assign = 0
        assigned_col = [0]
        for i in range(len(ltor_cells) - 1):  # :233-237
            consec = ltor_cells[i + 1]["box"][0] - ltor_cells[i]["box"][0]
            if consec > COL_DETERMINING_THRESHOLD * mean_width:
                col_to_assign += 1
            assigned_col.append(col_to_assign)
        max_entries_per_row.append(col_to_assign)
        final_skeleton.append(assigned_col)

    ncols = max(max_entries_per_row) + 1  # :241

    hocr = '<table class="ocr_tab" border=1 style="margin: 0px auto; text-align: center;"'
    tabbbox = " ".join(str(v) for v in tablebbox)
    hocr += f' title = "bbox {tabbbox}" >'
    row_keys = list(tablecellrows)
    for i in range(nrows):  # :250-264
        hocr += "<tr>"
        ltor = sorted(tablecellrows[row_keys[i]], key=lambda c: c["box"][0])
        skel = final_skeleton[i]
        for j in range(ncols):
            final_cells = [ltor[k] for k in range(len(skel)) if skel[k] == j]
            if len(final_cells) == 0:  # empty grid slot (:207,:258-260)
                cellattribute = ""
                text = ""
            else:
                box, members = _get_merged_cell(final_cells)
                cellbbox = f"{box[0]} {box[1]} {box[2]} {box[3]}"
                cellattribute = f' title = "bbox {cellbbox}"'
                text = recognize([glyphs.get(m["idx"], []) for m in members])
            hocr += f"<td {cellattribute} >" + text + "</td>"
        hocr += "</tr>"
    hocr += "</table>"
    return [hocr, tablebbox]


# ---------------------------------------------------------------------------
# figures (src/pdf_ocr_frcnn_tesseract_ocr.py:235-257)
# ---------------------------------------------------------------------------

def get_figures_from_page(detections: list[dict], page: int,
                          masked_boxes: list | None = None) -> list[list]:
    """Figure detections with score >= 0.8 (model-level threshold,
    src/pdf_ocr_frcnn_tesseract_ocr.py:118-120), in detection order; hOCR img
    tag per :249 (including the doubled slash of ``'../' + '/Cropped_…'``).

    ``masked_boxes`` models the ``optimized_code`` variant: there the
    detector runs on the in-memory array AFTER tables were painted over
    (optimized_code/main.py:84-106), so figures overlapping a masked table
    region are destroyed before detection — the stand-in suppresses them,
    and figure numbering runs over the survivors only. The ``src/`` entry
    point re-reads the unmasked file instead
    (src/pdf_ocr_frcnn_tesseract_ocr.py:159) — pass None."""
    result = []
    figure_count = 0
    for d in detections:
        if d["label"] == "Figure" and d["score"] >= FIGURE_SCORE_THRESHOLD:
            if masked_boxes and any(do_overlap(d["box"], mb) for mb in masked_boxes):
                continue
            x1, y1, x2, y2 = d["box"]
            name = f"/Cropped_Images/figure_{page}_{figure_count}.jpg"
            imagehocr = (
                f'<img class="ocr_im" title="bbox {x1} {y1} {x2} {y2}" src="../{name}">'
            )
            result.append([imagehocr, d["box"], figure_count])
            figure_count += 1
    return result


LAYOUT_CLASSES = ("Text", "Title", "List", "Table", "Figure")


def layout_regions(media_ref: str, seed: int = SYNTH_SEED) -> list[tuple]:
    """The full 5-class layout-detector surface (U2): label_map
    ``{0: Text, 1: Title, 2: List, 3: Table, 4: Figure}``
    (src/pdf_ocr_frcnn_tesseract_ocr.py:119) with the model-level score
    threshold ``MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.8`` (:120). The
    reference's per-page loop then consumes ONLY Figure (:240-241) — the
    other classes vanish from its outputs; this view surfaces what its
    detector actually emits. Detection order preserved."""
    desc = resolve_descriptor(media_ref, seed)
    return [
        (d["label"], d["box"][0], d["box"][1], d["box"][2], d["box"][3], d["score"])
        for d in desc["detections"]
        if d["label"] in LAYOUT_CLASSES and d["score"] >= FIGURE_SCORE_THRESHOLD
    ]


# ---------------------------------------------------------------------------
# page lines: tesseract-hOCR stand-in over the table-masked page
# ---------------------------------------------------------------------------

def get_page_lines(detections: list[dict], glyphs: dict, masked_boxes) -> list[dict]:
    """Stand-in for ``pytesseract.image_to_pdf_or_hocr`` on the masked image
    (src/pdf_ocr_frcnn_tesseract_ocr.py:140-170): word detections overlapping a
    masked table box are removed (masking = set subtraction, SURVEY.md U9);
    survivors are grouped into ocr_line spans by the same y-gap sessionization
    the reference uses for table rows (W1, src/table_cellwise_detection.py:143-156),
    x-sorted within a line (:173)."""
    words = [
        dict(d, idx=i) for i, d in enumerate(detections) if d["label"] == "word"
    ]
    words = [
        w for w in words if not any(do_overlap(w["box"], mb) for mb in masked_boxes)
    ]
    if not words:
        return []
    strwords = sorted(words, key=lambda w: w["box"][1] + w["box"][3])
    mean_height = int(np.mean([w["box"][3] - w["box"][1] for w in words]))
    wordline = [0]
    assign = 0
    for i in range(len(strwords) - 1):
        if strwords[i + 1]["box"][1] - strwords[i]["box"][1] > ROW_DETERMINING_THRESHOLD * mean_height:
            assign += 1
        wordline.append(assign)
    lines = []
    for li in sorted(set(wordline)):
        lws = [strwords[j] for j in range(len(strwords)) if wordline[j] == li]
        lws = sorted(lws, key=lambda w: w["box"][0])
        bbox = [
            min(w["box"][0] for w in lws),
            min(w["box"][1] for w in lws),
            max(w["box"][2] for w in lws),
            max(w["box"][3] for w in lws),
        ]
        text = " ".join(ctc_decode(glyphs.get(w["idx"], [])) for w in lws)
        markup = (
            f'<span class="ocr_line" title="bbox {bbox[0]} {bbox[1]} {bbox[2]} {bbox[3]}">'
            f"{text}</span>"
        )
        lines.append(
            {"bbox": bbox, "markup": markup, "text": text, "n_words": len(lws), "pre": []}
        )
    return lines


def page_text_views(media_ref: str, seed: int = SYNTH_SEED) -> dict:
    """U4: the reference's ``.txt``/``.hocr`` asymmetry. The .txt sink OCRs
    the UNMASKED page (src/pdf_ocr_frcnn_tesseract_ocr.py:136-138 runs before
    the table masking at :141-156), so table-region words appear in .txt; the
    .hocr sink OCRs the MASKED page (:169), so they do not. Stand-in for
    ``image_to_string``: newline-joined line texts over ALL word detections,
    no mask anti-join."""
    desc = resolve_descriptor(media_ref, seed)
    masked = [tr["bbox"] for tr in get_tables_from_page(desc["detections"])]
    unmasked_lines = get_page_lines(desc["detections"], desc["glyphs"], [])
    masked_lines = get_page_lines(desc["detections"], desc["glyphs"], masked)
    return {
        "txt_unmasked": "\n".join(ln["text"] for ln in unmasked_lines),
        "n_words_unmasked": sum(ln["n_words"] for ln in unmasked_lines),
        "n_words_masked": sum(ln["n_words"] for ln in masked_lines),
    }


# ---------------------------------------------------------------------------
# page assembly: the as-of positional merge (J2)
# ---------------------------------------------------------------------------

def extract_page(media_ref: str, page: int, seed: int = SYNTH_SEED,
                 variant: str = "src") -> list[dict]:
    """Full per-page extraction — the reference's per-page body
    (src/pdf_ocr_frcnn_tesseract_ocr.py:123-204) over a synthetic descriptor.

    ``variant="src"`` pins the Current Version semantics (figure detection
    re-reads the unmasked image, :159); ``variant="optimized"`` pins
    optimized_code/main.py:84-106, where figure detection runs on the
    table-masked array, so figures under table masks vanish.

    Returns output spans (kind, text, media_ref) in reading order.
    """
    desc = resolve_descriptor(media_ref, seed)
    detections, glyphs = desc["detections"], desc["glyphs"]

    tableresponses = get_tables_from_page(detections)
    tabledata = [get_hocr_from_table_response(tr, glyphs) for tr in tableresponses]
    masked = [tr["bbox"] for tr in tableresponses]
    figuredata = get_figures_from_page(
        detections, page, masked_boxes=masked if variant == "optimized" else None
    )

    # tables are masked before the page OCR (:140-156); in "src" figures are
    # NOT (storeMaskedImages=False at :160, and figure detection re-reads the
    # unmasked image at :159)
    lines = get_page_lines(detections, glyphs, masked)

    # insert each table before the first ocr_line whose y1 strictly exceeds
    # the table's y1 (:173-186); un-insertable elements are dropped (the break
    # never fires). Repeated insert_before the same line stacks later elements
    # closer to the line (after earlier ones).
    for entry in tabledata:
        tab_position = entry[1][1]
        for line in lines:
            if tab_position < line["bbox"][1]:
                line["pre"].append(("text", entry[0], None))
                break
    # same for figures (:188-199) — scans only ocr_line spans
    for imagehocr, bbox, fig_n in figuredata:
        img_position = bbox[1]
        for line in lines:
            if img_position < line["bbox"][1]:
                line["pre"].append(
                    ("media_ref", imagehocr, f"synth://figure/{media_ref.split('synth://page/', 1)[-1]}/{fig_n}")
                )
                break

    out: list[dict] = []
    for line in lines:
        for kind, text, mref in line["pre"]:
            out.append({"kind": kind, "text": text, "media_ref": mref})
        out.append({"kind": "text", "text": line["markup"], "media_ref": None})
    return out


# ---------------------------------------------------------------------------
# text branch: boilerplate strip (jusText/Readability-style; generalization of
# the reference's DOM-pruning heuristic,
# experiments/postprocessing_singular_word_treatment.py:5-46)
# ---------------------------------------------------------------------------

_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def strip_text_span(text: str) -> str | None:
    """Split on blank lines, score each block by link-density and word count,
    keep content blocks, emit tag-stripped plain text. None = drop span."""
    kept = []
    for block in text.split("\n\n"):
        link_chars = sum(len(" ".join(m.split())) for m in _A_RE.findall(block))
        plain = " ".join(_TAG_RE.sub(" ", block).split())
        total = len(plain)
        if total == 0:
            continue
        density = link_chars / total
        if len(plain.split()) >= STRIP_MIN_WORDS and density <= STRIP_MAX_LINK_DENSITY:
            kept.append(plain)
    if not kept:
        return None
    return "\n\n".join(kept)


# ---------------------------------------------------------------------------
# whole document
# ---------------------------------------------------------------------------

def extract_document(doc: dict, seed: int = SYNTH_SEED,
                     variant: str = "src") -> list[dict]:
    """Golden output span sequence for one docs row: spans processed in offset
    order, dense output offsets reassigned (SURVEY.md §3.4)."""
    out: list[dict] = []
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        if span["kind"] == "text":
            stripped = strip_text_span(span["text"])
            if stripped is not None:
                out.append({"kind": "text", "text": stripped, "media_ref": None})
        else:
            out.extend(extract_page(span["media_ref"], span["offset"], seed, variant))
    return [
        {
            "kind": s["kind"],
            "text": s["text"],
            "media_ref": s["media_ref"],
            "offset": i,
        }
        for i, s in enumerate(out)
    ]
