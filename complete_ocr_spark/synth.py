"""Deterministic synthetic interleaved-document generator (FIXTURES.md §1-3).

Stand-in for the reference's inputs: a PDF becomes a row of ``docs``; each page
JPEG (``src/pdf_ocr_frcnn_tesseract_ocr.py:45-57`` renders one per page) becomes
a ``media_ref`` span whose payload is a *page descriptor* — the deterministic
fake of what the detection + recognition models would produce on that page
(detection structs mirroring ``src/table_cellwise_detection.py:100-106``, glyph
code sequences standing in for tesseract crops).

Everything is a pure function of (identifier, seed): no files, no RNG state
shared across calls — so executors resolve descriptors independently and the
DuckDB oracle / pure-Python oracle see byte-identical inputs.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from .config import SYNTH_SEED

ALPHABET = "abcdefghijklmnopqrstuvwxyz"  # CTC code i+1 -> ALPHABET[i]; 0 = blank

_WORDS = (
    "spark shuffle partition column table query join scan filter batch arrow "
    "vector page block line word layout detect recognize merge order stream "
    "document span offset media text kernel grid cell row figure caption"
).split()

_NAV_WORDS = "home about contact login signup terms privacy sitemap next prev".split()


def _rng(*keys: object) -> np.random.RandomState:
    h = hashlib.blake2b(
        ("\x1f".join(str(k) for k in keys)).encode(), digest_size=8
    ).digest()
    return np.random.RandomState(int.from_bytes(h, "big") % (2**32))


def stable_hash64(*keys: object) -> int:
    h = hashlib.blake2b(
        ("\x1f".join(str(k) for k in keys)).encode(), digest_size=8
    ).digest()
    return int.from_bytes(h, "big", signed=True)


# ---------------------------------------------------------------------------
# docs table
# ---------------------------------------------------------------------------

def doc_ids(n_docs: int) -> list[str]:
    return [f"doc-{i:08d}" for i in range(n_docs)]


def _text_block(rng: np.random.RandomState) -> str:
    """One pseudo-HTML block: either a content paragraph or boilerplate nav."""
    if rng.rand() < 0.35:
        # boilerplate: link list, short, high link-density
        n = rng.randint(2, 7)
        links = " ".join(
            f'<a href="#{w}">{w}</a>'
            for w in (rng.choice(_NAV_WORDS) for _ in range(n))
        )
        return f"<div class=\"nav\">{links}</div>"
    n = rng.randint(8, 40)
    words = [str(rng.choice(_WORDS)) for _ in range(n)]
    # occasionally embed a link inside a content paragraph (low density)
    if rng.rand() < 0.3 and n > 10:
        i = rng.randint(0, n - 1)
        words[i] = f'<a href="#">{words[i]}</a>'
    return "<p>" + " ".join(words) + "</p>"


def make_doc(doc_id: str, seed: int = SYNTH_SEED) -> dict:
    """One docs row: {'doc_id', 'spans': [{kind,text,media_ref,offset}, ...]}."""
    rng = _rng("doc", doc_id, seed)
    # long tail: ~1% of docs get big span arrays to exercise salting/skew
    if rng.rand() < 0.01:
        n_spans = int(rng.randint(200, 2001))
    else:
        n_spans = int(rng.randint(1, 41))
    spans = []
    for off in range(n_spans):
        if rng.rand() < 0.2:
            spans.append(
                {
                    "kind": "media_ref",
                    "text": None,
                    "media_ref": f"synth://page/{doc_id}/{off}",
                    "offset": off,
                }
            )
        else:
            n_blocks = rng.randint(1, 7)
            text = "\n\n".join(_text_block(rng) for _ in range(n_blocks))
            spans.append(
                {"kind": "text", "text": text, "media_ref": None, "offset": off}
            )
    return {"doc_id": doc_id, "spans": spans}


def make_docs(n_docs: int, seed: int = SYNTH_SEED) -> list[dict]:
    return [make_doc(d, seed) for d in doc_ids(n_docs)]


def write_docs_parquet(path: str, n_docs: int, seed: int = SYNTH_SEED) -> None:
    """Write the docs table as parquet via pyarrow (no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = make_docs(n_docs, seed)
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    table = pa.Table.from_pydict(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "spans": [r["spans"] for r in rows],
        },
        schema=pa.schema([("doc_id", pa.string()), ("spans", pa.list_(span_t))]),
    )
    pq.write_table(table, path)


# ---------------------------------------------------------------------------
# page descriptor (what a media_ref resolves to)
# ---------------------------------------------------------------------------

def _glyph_seq(rng: np.random.RandomState) -> list[int]:
    """CTC-style logit-argmax code sequence: blanks (0) and repeats included."""
    n = rng.randint(3, 11)
    seq: list[int] = []
    for _ in range(n):
        c = int(rng.randint(0, 27))
        seq.append(c)
        if c != 0 and rng.rand() < 0.3:
            seq.append(c)  # repeat — CTC collapse food
    return seq


def resolve_descriptor(media_ref: str, seed: int = SYNTH_SEED) -> dict:
    """media_ref -> page descriptor dict (FIXTURES.md §2).

    detections: [{'box':[x1,y1,x2,y2], 'score':float, 'label':str}, ...]
    glyphs: {det_index: [codes...]} for 'word' and 'cell' detections.
    """
    rng = _rng("page", media_ref, seed)
    width = int(rng.randint(800, 1701))
    height = int(rng.randint(1000, 2401))
    detections: list[dict] = []
    glyphs: dict[int, list[int]] = {}

    def add(box, score, label, with_glyphs=False):
        idx = len(detections)
        detections.append(
            {
                "box": [int(box[0]), int(box[1]), int(box[2]), int(box[3])],
                "score": float(np.float32(score)),
                "label": label,
            }
        )
        if with_glyphs:
            glyphs[idx] = _glyph_seq(rng)
        return idx

    # --- word lines ------------------------------------------------------
    n_lines = int(rng.randint(0, 13))
    y = int(rng.randint(40, 120))
    line_h = int(rng.randint(18, 32))
    for _ in range(n_lines):
        x = int(rng.randint(30, 90))
        for _w in range(int(rng.randint(1, 9))):
            w = int(rng.randint(30, 140))
            if x + w > width - 20:
                break
            add([x, y, x + w, y + line_h], 0.9 + 0.09 * rng.rand(), "word", True)
            x += w + int(rng.randint(8, 25))
        y += line_h + int(rng.randint(line_h, 3 * line_h))
        if y > height - 60:
            break

    # --- tables ----------------------------------------------------------
    n_tables = 0
    r = rng.rand()
    if r < 0.30:
        n_tables = 1
    elif r < 0.38:
        n_tables = 2
    ty = y + int(rng.randint(10, 60))
    for _t in range(n_tables):
        nrows = int(rng.randint(1, 6))
        ncols = int(rng.randint(1, 5))
        cw = int(rng.randint(60, 140))
        ch = int(rng.randint(24, 48))
        tx = int(rng.randint(30, 120))
        tw, th = ncols * cw + 10, nrows * ch + 10
        # sometimes a table overlapping the text region (mask anti-join food)
        if rng.rand() < 0.3 and n_lines > 0:
            ty0 = int(rng.randint(30, max(31, y - th) if y - th > 31 else 60))
        else:
            ty0 = ty
        tbox = [tx, ty0, tx + tw, ty0 + th]
        add(tbox, 0.55 + 0.44 * rng.rand(), "table")
        if rng.rand() < 0.25:  # score-jittered duplicate table box → NMS food
            jb = [tbox[0] + int(rng.randint(0, 6)), tbox[1] + int(rng.randint(0, 6)),
                  tbox[2] + int(rng.randint(0, 6)), tbox[3] + int(rng.randint(0, 6))]
            add(jb, 0.5 + 0.4 * rng.rand(), "table")
        for i in range(nrows):
            for j in range(ncols):
                if rng.rand() < 0.12:
                    continue  # missing grid slot
                cx1 = tx + 5 + j * cw + int(rng.randint(0, 4))
                cy1 = ty0 + 5 + i * ch + int(rng.randint(0, 4))
                cbox = [cx1, cy1, cx1 + cw - 6, cy1 + ch - 6]
                # some cells below det threshold (filtered), most above
                score = 0.3 + 0.15 * rng.rand() if rng.rand() < 0.1 else 0.55 + 0.44 * rng.rand()
                add(cbox, score, "cell", True)
                if rng.rand() < 0.08:  # near-duplicate cell → NMS food
                    db = [cbox[0] + 1, cbox[1] + 1, cbox[2] + 1, cbox[3] + 1]
                    add(db, 0.5 + 0.3 * rng.rand(), "cell", True)
        ty = ty0 + th + int(rng.randint(20, 80))

    # --- figures ----------------------------------------------------------
    n_figs = int(rng.randint(0, 3))
    for _f in range(n_figs):
        fx = int(rng.randint(30, max(31, width - 320)))
        fy = int(rng.randint(30, max(31, height - 260)))
        fw = int(rng.randint(120, 300))
        fh = int(rng.randint(90, 240))
        add([fx, fy, fx + fw, fy + fh], 0.6 + 0.39 * rng.rand(), "Figure")

    return {
        "media_ref": media_ref,
        "width": width,
        "height": height,
        "detections": detections,
        "glyphs": glyphs,
    }


def descriptor_json(media_ref: str, seed: int = SYNTH_SEED) -> str:
    d = resolve_descriptor(media_ref, seed)
    d = dict(d, glyphs={str(k): v for k, v in d["glyphs"].items()})
    return json.dumps(d, sort_keys=True)
