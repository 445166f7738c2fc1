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


def _make_doc_star(args) -> dict:
    return make_doc(*args)


def write_docs_parquet(path: str, n_docs: int, seed: int = SYNTH_SEED,
                       workers: int = 1) -> None:
    """Write the docs table as parquet via pyarrow (no Spark needed).

    ``workers > 1`` fans generation out over a process pool — generation is a
    pure per-doc function, so parallel output is identical to serial."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if workers > 1:
        from multiprocessing import Pool

        with Pool(workers) as pool:
            rows = pool.map(
                _make_doc_star, [(d, seed) for d in doc_ids(n_docs)], chunksize=64
            )
    else:
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
    # small row groups so Spark's byte-range file splitting can parallelize the
    # scan of a single local file (a 100 TB table has many >=128MB files and
    # gets this for free)
    pq.write_table(table, path, row_group_size=256)


# ---------------------------------------------------------------------------
# page descriptor (what a media_ref resolves to)
# ---------------------------------------------------------------------------

def resolve_descriptor(media_ref: str, seed: int = SYNTH_SEED) -> dict:
    """media_ref -> page descriptor dict (FIXTURES.md §2).

    detections: [{'box':[x1,y1,x2,y2], 'score':float, 'label':str}, ...]
    glyphs: {det_index: [codes...]} for 'word' and 'cell' detections.

    Vectorized: all randomness for a page is drawn as a handful of bulk NumPy
    arrays (per-call RNG overhead dominated the media branch otherwise). Still
    a pure deterministic function of (media_ref, seed).
    """
    rng = _rng("page", media_ref, seed)
    width = int(rng.randint(800, 1701))
    height = int(rng.randint(1000, 2401))
    detections: list[dict] = []
    glyph_owner: list[int] = []  # det indices that get glyph sequences

    def add(x1, y1, x2, y2, score, label, with_glyphs=False):
        idx = len(detections)
        detections.append(
            {
                "box": [int(x1), int(y1), int(x2), int(y2)],
                "score": float(np.float32(score)),
                "label": label,
            }
        )
        if with_glyphs:
            glyph_owner.append(idx)
        return idx

    # --- word lines (bulk draws, ragged assembly) --------------------------
    n_lines = int(rng.randint(0, 13))
    y = int(rng.randint(40, 120))
    line_h = int(rng.randint(18, 32))
    if n_lines:
        max_w = 8
        words_per_line = rng.randint(1, 9, size=n_lines)
        x_starts = rng.randint(30, 90, size=n_lines)
        widths = rng.randint(30, 140, size=(n_lines, max_w))
        gaps = rng.randint(8, 25, size=(n_lines, max_w))
        y_gaps = rng.randint(line_h, 3 * line_h, size=n_lines)
        scores_w = 0.9 + 0.09 * rng.rand(n_lines, max_w)
        for li in range(n_lines):
            x = int(x_starts[li])
            for wi in range(int(words_per_line[li])):
                w = int(widths[li, wi])
                if x + w > width - 20:
                    break
                add(x, y, x + w, y + line_h, scores_w[li, wi], "word", True)
                x += w + int(gaps[li, wi])
            y += line_h + int(y_gaps[li])
            if y > height - 60:
                break

    # --- tables -------------------------------------------------------------
    r = rng.rand()
    n_tables = 1 if r < 0.30 else (2 if r < 0.38 else 0)
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
        add(tx, ty0, tx + tw, ty0 + th, 0.55 + 0.44 * rng.rand(), "table")
        if rng.rand() < 0.25:  # score-jittered duplicate table box → NMS food
            j = rng.randint(0, 6, size=4)
            add(tx + j[0], ty0 + j[1], tx + tw + j[2], ty0 + th + j[3],
                0.5 + 0.4 * rng.rand(), "table")
        # cell grid: bulk draws
        missing = rng.rand(nrows, ncols) < 0.12
        jx = rng.randint(0, 4, size=(nrows, ncols))
        jy = rng.randint(0, 4, size=(nrows, ncols))
        low_score = rng.rand(nrows, ncols) < 0.1
        sc_low = 0.3 + 0.15 * rng.rand(nrows, ncols)
        sc_hi = 0.55 + 0.44 * rng.rand(nrows, ncols)
        dup = rng.rand(nrows, ncols) < 0.08
        sc_dup = 0.5 + 0.3 * rng.rand(nrows, ncols)
        for i in range(nrows):
            for j in range(ncols):
                if missing[i, j]:
                    continue  # missing grid slot
                cx1 = tx + 5 + j * cw + int(jx[i, j])
                cy1 = ty0 + 5 + i * ch + int(jy[i, j])
                score = sc_low[i, j] if low_score[i, j] else sc_hi[i, j]
                add(cx1, cy1, cx1 + cw - 6, cy1 + ch - 6, score, "cell", True)
                if dup[i, j]:  # near-duplicate cell → NMS food
                    add(cx1 + 1, cy1 + 1, cx1 + cw - 5, cy1 + ch - 5,
                        sc_dup[i, j], "cell", True)
        ty = ty0 + th + int(rng.randint(20, 80))

    # --- figures --------------------------------------------------------------
    n_figs = int(rng.randint(0, 3))
    for _f in range(n_figs):
        fx = int(rng.randint(30, max(31, width - 320)))
        fy = int(rng.randint(30, max(31, height - 260)))
        fw = int(rng.randint(120, 300))
        fh = int(rng.randint(90, 240))
        add(fx, fy, fx + fw, fy + fh, 0.6 + 0.39 * rng.rand(), "Figure")

    # --- glyph sequences: one bulk draw for the whole page ---------------------
    glyphs: dict[int, list[int]] = {}
    n_seq = len(glyph_owner)
    if n_seq:
        lens = rng.randint(3, 11, size=n_seq)
        total = int(lens.sum())
        codes = rng.randint(0, 27, size=total)
        rep = rng.rand(total) < 0.3
        # CTC repeat food: non-blank codes with a repeat flag appear twice
        expanded = np.repeat(codes, 1 + ((codes != 0) & rep))
        # slice expanded back into per-word sequences
        exp_lens = lens + np.add.reduceat(
            ((codes != 0) & rep).astype(np.int64),
            np.concatenate([[0], np.cumsum(lens)[:-1]]),
        )
        pos = 0
        for k, det_idx in enumerate(glyph_owner):
            ln = int(exp_lens[k])
            glyphs[det_idx] = [int(c) for c in expanded[pos:pos + ln]]
            pos += ln

    # --- layout regions (U2): the PubLayNet detector emits 5 classes
    # (src/pdf_ocr_frcnn_tesseract_ocr.py:119) but the reference consumes only
    # Figure (:240-241) — Text/Title/List boxes flow through the span model and
    # must not perturb extraction (golden-tested). Drawn AFTER every other rng
    # draw so pre-existing descriptors and goldens are bit-identical. Scores
    # straddle the 0.8 model threshold to exercise the layout filter.
    n_lay = int(rng.randint(0, 4))
    for _ in range(n_lay):
        lab = ("Text", "Title", "List")[int(rng.randint(0, 3))]
        lx = int(rng.randint(20, max(21, width - 220)))
        ly = int(rng.randint(20, max(21, height - 140)))
        lw = int(rng.randint(80, 200))
        lh = int(rng.randint(20, 120))
        add(lx, ly, lx + lw, ly + lh, 0.6 + 0.39 * rng.rand(), lab)

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
