"""Pure-Python oracle for the Nested-OCR pipeline (src/get_nested_ocr.py).

Transcribes the reference's second entry point: DocTR block/line/word
*detection* + per-word tesseract *recognition* (src/get_nested_ocr.py:278-294)
and the nested hOCR export ``export_as_xml`` (src/get_nested_ocr.py:34-134).
The model calls are replaced by the deterministic descriptor stand-ins at the
identical boundary (word boxes + glyph codes -> CTC decode), exactly as the
FRCNN oracle in ``reference_oracle.py`` does.

Bug-compatible details preserved on purpose:

* ``id="page_2"`` always — the reference initialises ``p_idx = 1`` and writes
  ``f"page_{p_idx + 1}"`` (src/get_nested_ocr.py:44,73);
* the ``ocr_par`` id reuses the *block* counter (``par_{block_count}``,
  :97) — there is no separate paragraph counter;
* block/par/line bbox ``title`` attributes contain the literal indentation of
  the reference's in-string line continuations (a ``\\``-newline inside the
  f-string swallows the newline but keeps the next line's 20/24 leading
  spaces, :88-89, :98-99, :112-114) — the whitespace runs are part of the
  reference's real output (its own ``experiments/xml2hocr.py:56-62``
  normalizer exists to clean them up);
* ``baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0`` fixed (:105,:114);
* the page text accumulates ``' ' + word`` so it starts with a space (:293).

Coordinates: DocTR geometry is normalized float ((xmin,ymin),(xmax,ymax));
the stand-in normalizes the descriptor's int pixel boxes through float32
(SURVEY.md §1.2 convention) and the export scales back with
``int(round(v * dim))`` (:88,:112,:127) — the F7 conversion edge.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.etree.ElementTree import Element as ETElement, SubElement

import numpy as np

from ..config import (
    NESTED_BLOCK_GAP_FACTOR,
    ROW_DETERMINING_THRESHOLD,
    SYNTH_SEED,
)
from ..synth import resolve_descriptor
from .reference_oracle import ctc_decode


# ---------------------------------------------------------------------------
# hierarchy stand-in (DocTR predictor boundary, src/get_nested_ocr.py:275-276)
# ---------------------------------------------------------------------------

def _norm_box(box, width: int, height: int) -> tuple:
    """Pixel box -> normalized float32 geometry (DocTR convention; the
    reference consumes ``((xmin,ymin),(xmax,ymax))`` floats and scales by the
    page dims, src/get_nested_ocr.py:283-288)."""
    w32, h32 = np.float32(width), np.float32(height)
    return (
        float(np.float32(box[0]) / w32),
        float(np.float32(box[1]) / h32),
        float(np.float32(box[2]) / w32),
        float(np.float32(box[3]) / h32),
    )


def build_nested_page(desc: dict) -> dict:
    """Descriptor -> nested page dict mirroring DocTR's Document shape:
    ``{width, height, blocks: [{geometry, lines: [{geometry,
    words: [{geometry, value, confidence}]}]}]}``.

    Lines: W1 y-gap sessionization over y1+y2-sorted word boxes (the same
    clustering the reference applies to table rows,
    src/table_cellwise_detection.py:143-156), x-sorted within a line.
    Blocks: a second, coarser pass over line y1 gaps
    (NESTED_BLOCK_GAP_FACTOR x mean line height). The nested pipeline has no
    table masking (``tabledata = []``, src/get_nested_ocr.py:243), so ALL
    word detections participate.
    """
    width, height = desc["width"], desc["height"]
    dets, glyphs = desc["detections"], desc["glyphs"]
    words = [dict(d, idx=i) for i, d in enumerate(dets) if d["label"] == "word"]
    if not words:
        return {"width": width, "height": height, "blocks": []}

    strwords = sorted(words, key=lambda w: w["box"][1] + w["box"][3])
    mean_h = int(np.mean([w["box"][3] - w["box"][1] for w in words]))
    wordline = [0]
    assign = 0
    for i in range(len(strwords) - 1):
        gap = strwords[i + 1]["box"][1] - strwords[i]["box"][1]
        if gap > ROW_DETERMINING_THRESHOLD * mean_h:
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
        lines.append(
            {
                "bbox": bbox,
                "geometry": _norm_box(bbox, width, height),
                "words": [
                    {
                        "geometry": _norm_box(w["box"], width, height),
                        "value": ctc_decode(glyphs.get(w["idx"], [])),
                        "confidence": w["score"],
                    }
                    for w in lws
                ],
            }
        )

    mean_line_h = int(np.mean([ln["bbox"][3] - ln["bbox"][1] for ln in lines]))
    blocks: list[dict] = []
    current: list[dict] = [lines[0]]
    for i in range(1, len(lines)):
        gap = lines[i]["bbox"][1] - lines[i - 1]["bbox"][1]
        if gap > NESTED_BLOCK_GAP_FACTOR * mean_line_h:
            blocks.append(current)
            current = []
        current.append(lines[i])
    blocks.append(current)

    out_blocks = []
    for blines in blocks:
        bb = [
            min(ln["bbox"][0] for ln in blines),
            min(ln["bbox"][1] for ln in blines),
            max(ln["bbox"][2] for ln in blines),
            max(ln["bbox"][3] for ln in blines),
        ]
        out_blocks.append(
            {
                "geometry": _norm_box(bb, width, height),
                "lines": [
                    {"geometry": ln["geometry"], "words": ln["words"]}
                    for ln in blines
                ],
            }
        )
    return {"width": width, "height": height, "blocks": out_blocks}


# ---------------------------------------------------------------------------
# export_as_xml transcription (src/get_nested_ocr.py:34-134)
# ---------------------------------------------------------------------------

# The literal indentation swallowed into the title f-strings by the
# reference's in-string line continuations (:88-89 block, :98-99 par,
# :112-114 line — 20 spaces for block/par, 24 for line).
_CONT20 = " " * 20
_CONT24 = " " * 24


def export_as_xml(page: dict, file_title: str = "docTR - XML export (hOCR)") -> str:
    """Nested hOCR string for one page — ElementTree build + serialize exactly
    as the reference does (src/get_nested_ocr.py:34-134), with the descriptor
    page dict standing in for the DocTR Page object."""
    p_idx = 1                      # :44 — never incremented; id is "page_2"
    block_count: int = 1           # :45-47 monotone id counters (A7)
    line_count: int = 1
    word_count: int = 1
    height, width = page["height"], page["width"]   # :48 (height, width) order
    language = "en"                # :49 — stand-in pages carry no language map
    page_hocr = ETElement(
        "html",
        attrib={"xmlns": "http://www.w3.org/1999/xhtml", "xml:lang": str(language)},
    )
    head = SubElement(page_hocr, "head")
    SubElement(head, "title").text = file_title
    SubElement(
        head, "meta",
        attrib={"http-equiv": "Content-Type", "content": "text/html; charset=utf-8"},
    )
    SubElement(head, "meta", attrib={"name": "ocr-system", "content": "python-doctr"})
    SubElement(
        head, "meta",
        attrib={
            "name": "ocr-capabilities",
            "content": "ocr_page ocr_carea ocr_par ocr_line ocrx_word",
        },
    )
    body = SubElement(page_hocr, "body")
    SubElement(
        body, "div",
        attrib={
            "class": "ocr_page",
            "id": f"page_{p_idx + 1}",
            "title": f"image; bbox 0 0 {width} {height}; ppageno 0",
        },
    )
    for block in page["blocks"]:
        (xmin, ymin, xmax, ymax) = block["geometry"]
        block_title = (
            f"bbox {int(round(xmin * width))} {int(round(ymin * height))} "
            f"{_CONT20}{int(round(xmax * width))} {int(round(ymax * height))}"
        )
        block_div = SubElement(
            body, "div",
            attrib={"class": "ocr_carea", "id": f"block_{block_count}",
                    "title": block_title},
        )
        paragraph = SubElement(
            block_div, "p",
            attrib={"class": "ocr_par", "id": f"par_{block_count}",   # :97 reuses block_count
                    "title": block_title},
        )
        block_count += 1
        for line in block["lines"]:
            (xmin, ymin, xmax, ymax) = line["geometry"]
            line_span = SubElement(
                paragraph, "span",
                attrib={
                    "class": "ocr_line",
                    "id": f"line_{line_count}",
                    "title": (
                        f"bbox {int(round(xmin * width))} {int(round(ymin * height))} "
                        f"{_CONT24}{int(round(xmax * width))} {int(round(ymax * height))}; "
                        f"{_CONT24}baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0"
                    ),
                },
            )
            line_count += 1
            for word in line["words"]:
                (xmin, ymin, xmax, ymax) = word["geometry"]
                conf = word["confidence"]
                word_div = SubElement(
                    line_span, "span",
                    attrib={
                        "class": "ocrx_word",
                        "id": f"word_{word_count}",
                        "title": (
                            f"bbox {int(round(xmin * width))} {int(round(ymin * height))} "
                            f"{int(round(xmax * width))} {int(round(ymax * height))}; "
                            f"x_wconf {int(round(conf * 100))}"
                        ),
                    },
                )
                word_div.text = word["value"]
                word_count += 1

    return ET.tostring(page_hocr, encoding="unicode", method="xml")


def nested_page_text(page: dict) -> str:
    """The per-page .txt content: ``text_file_content + ' ' + text`` per word
    in traversal order (src/get_nested_ocr.py:277-294) — leading space kept."""
    out = ""
    for block in page["blocks"]:
        for line in block["lines"]:
            for word in line["words"]:
                out = out + " " + word["value"]
    return out


def nested_counts(page: dict) -> tuple[int, int, int]:
    n_blocks = len(page["blocks"])
    n_lines = sum(len(b["lines"]) for b in page["blocks"])
    n_words = sum(len(ln["words"]) for b in page["blocks"] for ln in b["lines"])
    return n_blocks, n_lines, n_words


def singular_word_merge(page: dict) -> list[dict]:
    """W5 geometric half: the singular-word DOM treatment
    (experiments/postprocessing_singular_word_treatment.py:5-46) over a
    nested page, transcribed element-for-element.

    Semantics notes (all verified against the experiment's code paths):

    * It operates on **whitespace-normalized** titles (F5,
      experiments/xml2hocr.py:56-62): on the raw export the in-string
      continuation space runs make ``title.split(";")[0].split(" ")[1:]``
      contain empty strings, ``map(int, ...)`` raises, and the per-div
      ``except: continue`` (:35-37) turns the whole pass into a no-op.
    * For each div whose first following ocr_line has <= 3 word children
      (:8): union that line's bbox into the PREVIOUS div's and previous
      ocr_par's titles (:20-28) and move the line after the previous
      ocr_line (:32). The first content block is always skipped — its
      previous div is the ocr_page div whose title yields no ints (:18
      raises before any mutation).
    * ``insert_after(prev_span)`` does not change flat reading order: the
      previous ocr_line is document-adjacent to the moved line; only the
      parent paragraph (and the bboxes) change.
    * The leftover-decompose loop (:40-44) iterates the children of
      ``soup.div`` — the ocr_page div, which is empty — so it never runs.

    Returns per-block rows: final div/par bboxes (title ints) and the count
    of lines whose final parent is that block's paragraph.
    """
    width, height = page["width"], page["height"]

    def px4(g):
        return [
            int(round(g[0] * width)), int(round(g[1] * height)),
            int(round(g[2] * width)), int(round(g[3] * height)),
        ]

    blocks = []
    doc_lines = []  # flat document order; block = original, par = current parent
    for k, b in enumerate(page["blocks"]):
        bb = px4(b["geometry"])
        blocks.append({"div": list(bb), "par": list(bb)})
        for ln in b["lines"]:
            doc_lines.append(
                {"bbox": px4(ln["geometry"]), "n_words": len(ln["words"]),
                 "block": k, "par": k}
            )

    for k in range(len(blocks)):
        curr = next((ln for ln in doc_lines if ln["block"] == k), None)
        if curr is None or curr["n_words"] > 3:  # :8 len(find_next("span"))
            continue
        if k == 0:
            continue  # ocr_page div title parse raises before mutation (:18)
        c = curr["bbox"]
        d = blocks[k - 1]["div"]
        p = blocks[k - 1]["par"]
        blocks[k - 1]["div"] = [min(c[0], d[0]), min(c[1], d[1]),
                                max(c[2], d[2]), max(c[3], d[3])]  # :20,:24,:27
        blocks[k - 1]["par"] = [min(c[0], p[0]), min(c[1], p[1]),
                                max(c[2], p[2]), max(c[3], p[3])]  # :21,:25,:28
        i = doc_lines.index(curr)
        curr["par"] = doc_lines[i - 1]["par"]  # :32 insert_after(prev ocr_line)

    out = []
    for k, b in enumerate(blocks):
        out.append(
            {
                "block_id": k + 1,
                "div_x1": b["div"][0], "div_y1": b["div"][1],
                "div_x2": b["div"][2], "div_y2": b["div"][3],
                "par_x1": b["par"][0], "par_y1": b["par"][1],
                "par_x2": b["par"][2], "par_y2": b["par"][3],
                "n_lines_final": sum(1 for ln in doc_lines if ln["par"] == k),
            }
        )
    return out


def nested_document(doc: dict, seed: int = SYNTH_SEED) -> list[dict]:
    """Golden rows for one docs row: every media span -> nested hOCR + text."""
    rows = []
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        if span["kind"] != "media_ref" or span["media_ref"] is None:
            continue
        page = build_nested_page(resolve_descriptor(span["media_ref"], seed))
        nb, nl, nw = nested_counts(page)
        rows.append(
            {
                "doc_id": doc["doc_id"],
                "offset": span["offset"],
                "media_ref": span["media_ref"],
                "hocr": export_as_xml(page),
                "page_text": nested_page_text(page),
                "n_blocks": nb,
                "n_lines": nl,
                "n_words": nw,
            }
        )
    return rows
