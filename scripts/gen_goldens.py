"""Regenerate every committed golden parquet from the pure-Python oracle.

All goldens derive deterministically from the committed docs tables (which in
turn derive from synth.make_docs under SYNTH_SEED); regenerate everything
together whenever synth or an oracle changes:

    python3 scripts/gen_goldens.py

Outputs (committed):
  data/golden_sf0.001.parquet         — FRCNN-pipeline extracted spans
  data/nested_golden_sf0.001.parquet  — Nested-OCR hOCR/text per media span
  data/layout_golden_sf0.001.parquet  — 5-class layout detections per page
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from complete_ocr_spark.oracle import extract_document  # noqa: E402
from complete_ocr_spark.oracle.nested import (  # noqa: E402
    build_nested_page,
    nested_document,
    singular_word_merge,
)
from complete_ocr_spark.synth import resolve_descriptor  # noqa: E402
from complete_ocr_spark.oracle.reference_oracle import (  # noqa: E402
    layout_regions,
    page_text_views,
)
from complete_ocr_spark.synth import make_docs  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")
N_DOCS_SF0001 = 100  # docs_sf0.001.parquet row count


def _docs():
    docs = make_docs(N_DOCS_SF0001)
    # sanity: must match the committed docs table exactly
    t = pq.read_table(os.path.join(DATA, "docs_sf0.001.parquet"))
    assert t.num_rows == len(docs), (t.num_rows, len(docs))
    assert t.column("doc_id").to_pylist() == [d["doc_id"] for d in docs]
    return docs


def gen_extract_golden(docs, variant: str = "src",
                       fname: str = "golden_sf0.001.parquet") -> None:
    rows = []
    for d in docs:
        for s in extract_document(d, variant=variant):
            rows.append((d["doc_id"], s["offset"], s["kind"], s["text"], s["media_ref"]))
    table = pa.Table.from_pydict(
        {
            "doc_id": [r[0] for r in rows],
            "offset": pa.array([r[1] for r in rows], pa.int32()),
            "kind": [r[2] for r in rows],
            "text": [r[3] for r in rows],
            "media_ref": [r[4] for r in rows],
        }
    )
    pq.write_table(table, os.path.join(DATA, fname))
    print(f"{fname}:", table.num_rows, "rows")


def gen_nested_golden(docs) -> None:
    rows = [r for d in docs for r in nested_document(d)]
    table = pa.Table.from_pydict(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "offset": pa.array([r["offset"] for r in rows], pa.int32()),
            "media_ref": [r["media_ref"] for r in rows],
            "hocr": [r["hocr"] for r in rows],
            "page_text": [r["page_text"] for r in rows],
            "n_blocks": pa.array([r["n_blocks"] for r in rows], pa.int32()),
            "n_lines": pa.array([r["n_lines"] for r in rows], pa.int32()),
            "n_words": pa.array([r["n_words"] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(DATA, "nested_golden_sf0.001.parquet"))
    print("nested_golden_sf0.001:", table.num_rows, "rows")


def gen_layout_golden(docs) -> None:
    rows = []
    for d in docs:
        for s in d["spans"]:
            if s["kind"] != "media_ref" or s["media_ref"] is None:
                continue
            for reg in layout_regions(s["media_ref"]):
                rows.append((d["doc_id"], s["offset"], s["media_ref"], *reg))
    table = pa.Table.from_pydict(
        {
            "doc_id": [r[0] for r in rows],
            "offset": pa.array([r[1] for r in rows], pa.int32()),
            "media_ref": [r[2] for r in rows],
            "label": [r[3] for r in rows],
            "x1": pa.array([r[4] for r in rows], pa.int32()),
            "y1": pa.array([r[5] for r in rows], pa.int32()),
            "x2": pa.array([r[6] for r in rows], pa.int32()),
            "y2": pa.array([r[7] for r in rows], pa.int32()),
            "score": pa.array([r[8] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(DATA, "layout_golden_sf0.001.parquet"))
    print("layout_golden_sf0.001:", table.num_rows, "rows")


def gen_pages_golden(docs) -> None:
    rows = []
    for d in docs:
        for s in d["spans"]:
            if s["kind"] != "media_ref" or s["media_ref"] is None:
                continue
            v = page_text_views(s["media_ref"])
            rows.append((d["doc_id"], s["offset"], s["media_ref"],
                         v["txt_unmasked"], v["n_words_unmasked"], v["n_words_masked"]))
    table = pa.Table.from_pydict(
        {
            "doc_id": [r[0] for r in rows],
            "offset": pa.array([r[1] for r in rows], pa.int32()),
            "media_ref": [r[2] for r in rows],
            "txt_unmasked": [r[3] for r in rows],
            "n_words_unmasked": pa.array([r[4] for r in rows], pa.int32()),
            "n_words_masked": pa.array([r[5] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(DATA, "pages_golden_sf0.001.parquet"))
    print("pages_golden_sf0.001:", table.num_rows, "rows")


def gen_singular_golden(docs) -> None:
    cols = ("block_id", "div_x1", "div_y1", "div_x2", "div_y2",
            "par_x1", "par_y1", "par_x2", "par_y2", "n_lines_final")
    rows = []
    for d in docs:
        for s in d["spans"]:
            if s["kind"] != "media_ref" or s["media_ref"] is None:
                continue
            page = build_nested_page(resolve_descriptor(s["media_ref"]))
            for r in singular_word_merge(page):
                rows.append((d["doc_id"], s["offset"], s["media_ref"],
                             *[r[c] for c in cols]))
    data = {
        "doc_id": [r[0] for r in rows],
        "offset": pa.array([r[1] for r in rows], pa.int32()),
        "media_ref": [r[2] for r in rows],
    }
    for i, c in enumerate(cols):
        data[c] = pa.array([r[3 + i] for r in rows], pa.int32())
    pq.write_table(pa.Table.from_pydict(data),
                   os.path.join(DATA, "singular_golden_sf0.001.parquet"))
    print("singular_golden_sf0.001:", len(rows), "rows")


def gen_media_fixture_and_golden(n_base: int = 90) -> None:
    """Media-dedup fixture + golden (round-5 verdict #1).

    The committed docs tables carry all-UNIQUE media_refs (every payload
    distinct — no dedup signal), so the perceptual tier gets its own
    committed fixture with PLANTED duplicates: every 3rd base ref gains a
    perturbed-payload variant (a few bytes nudged — a light re-encode; the
    perturbation stride is chosen per ref, deterministically, so the
    variant's average-hash stays within Hamming 3) and every 7th gains an
    exact-payload copy under a different ref (the same file re-crawled).
    The golden is the INDEPENDENT pure-Python oracle's brute-force
    all-pairs clustering (oracle/media.py) over that fixture."""
    from complete_ocr_spark.functions.multimodal import _seed_bytes, media_meta
    from complete_ocr_spark.oracle.media import avg_hash_py, near_dup_clusters

    rows = []  # (media_ref, modality, width, height, n_frames, payload)
    for i in range(n_base):
        ref = f"media-fixture-{i:04d}"
        modality, w, h, nf, rate = media_meta(ref)
        payload = _seed_bytes(ref, min(w * h * nf, 65536))
        rows.append((ref, modality, w, h, nf, payload))
        if i % 3 == 0:  # light re-encode: nudge bytes until hash-near
            base_hash = avg_hash_py(payload, w, h)
            for stride, delta in ((997, 5), (2003, 5), (4001, 3)):
                cand = bytearray(payload)
                for k in range(0, len(cand), stride):
                    cand[k] = (cand[k] + delta) % 256
                cand = bytes(cand)
                ham = bin(base_hash ^ avg_hash_py(cand, w, h)).count("1")
                if ham <= 3:
                    rows.append((f"{ref}~re", modality, w, h, nf, cand))
                    break
            else:
                raise AssertionError(f"no near variant found for {ref}")
        if i % 7 == 0:  # exact-payload copy under a new ref
            rows.append((f"{ref}~copy", modality, w, h, nf, payload))
    pq.write_table(
        pa.Table.from_pydict(
            {
                "media_ref": [r[0] for r in rows],
                "modality": [r[1] for r in rows],
                "width": pa.array([r[2] for r in rows], pa.int32()),
                "height": pa.array([r[3] for r in rows], pa.int32()),
                "n_frames": pa.array([r[4] for r in rows], pa.int32()),
                "payload": pa.array([r[5] for r in rows], pa.binary()),
            }
        ),
        os.path.join(DATA, "media_fixture.parquet"),
    )
    golden = near_dup_clusters(
        [(r[0], r[2], r[3], r[5]) for r in rows], max_hamming=3
    )
    pq.write_table(
        pa.Table.from_pydict(
            {
                "media_ref": [g[0] for g in golden],
                "dup_of": [g[1] for g in golden],
                "n_members": pa.array([g[2] for g in golden], pa.int64()),
            }
        ),
        os.path.join(DATA, "media_near_dup_golden.parquet"),
    )
    # FRAME-level golden: truncated video payloads tile (np.resize), so
    # real duplicate frames exist within and across the fixture's videos
    from complete_ocr_spark.oracle.media import frame_near_dup_pairs

    fgolden = frame_near_dup_pairs(
        [(r[0], r[2], r[3], r[4], r[5]) for r in rows], max_hamming=3
    )
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc1": [g[0] for g in fgolden],
                "doc2": [g[1] for g in fgolden],
                "hamming": pa.array([g[2] for g in fgolden], pa.int32()),
            }
        ),
        os.path.join(DATA, "frame_near_dup_golden.parquet"),
    )
    print("media_fixture:", len(rows), "rows;",
          "media_near_dup_golden:", len(golden), "rows;",
          "frame_near_dup_golden:", len(fgolden), "rows")


def gen_bpe_goldens(docs, n_merges: int = 48, min_pair_count: int = 2) -> None:
    """BPE train + encode goldens over the extract golden's text spans —
    the INDEPENDENT Counter/dict oracle (oracle/bpe.py) the distributed
    trainer (functions/bpe.py) is hash-gated against."""
    from complete_ocr_spark.oracle import bpe as obpe

    spans = [
        (d["doc_id"], s["offset"], s["text"])
        for d in docs
        for s in extract_document(d)
        if s["kind"] == "text" and s["text"] is not None
    ]
    merges, _vocab = obpe.train(
        [t for _, _, t in spans], n_merges, min_pair_count=min_pair_count
    )
    pq.write_table(
        pa.Table.from_pydict(
            {
                "rank": pa.array([m[0] for m in merges], pa.int64()),
                "lhs": [m[1] for m in merges],
                "rhs": [m[2] for m in merges],
                "pair_count": pa.array([m[3] for m in merges], pa.int64()),
            }
        ),
        os.path.join(DATA, "bpe_merges_golden.parquet"),
    )
    enc = [(d, o, obpe.encode(t, merges)) for d, o, t in spans]
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": [e[0] for e in enc],
                "offset": pa.array([e[1] for e in enc], pa.int32()),
                "n_tokens": pa.array([len(e[2]) for e in enc], pa.int64()),
                "token_str": [" ".join(e[2]) for e in enc],
            }
        ),
        os.path.join(DATA, "bpe_encode_golden.parquet"),
    )
    print("bpe_merges_golden:", len(merges), "rows;",
          "bpe_encode_golden:", len(enc), "rows")


def gen_clf_goldens(n_buckets: int = 64, n_iters: int = 8,
                    lr_bp: int = 1_000_000) -> None:
    """Hashed-classifier training + scoring goldens over the deterministic
    separable fixture corpus — the INDEPENDENT integer-LR oracle
    (oracle/classifier.py) the distributed trainer
    (functions/classifier.py) is hash-gated against.  Parameters must
    match queries.py's _CLF_BUCKETS/_CLF_ITERS/_CLF_LR."""
    from complete_ocr_spark.functions.classifier import synthetic_labeled_corpus
    from complete_ocr_spark.oracle import classifier as oclf

    rows = synthetic_labeled_corpus()
    w, bias, hist = oclf.train(rows, n_buckets, n_iters, lr_bp)
    table = list(enumerate(w)) + [(n_buckets, bias)]
    pq.write_table(
        pa.Table.from_pydict(
            {
                "bucket": pa.array([b for b, _ in table], pa.int64()),
                "w_micros": pa.array([x for _, x in table], pa.int64()),
            }
        ),
        os.path.join(DATA, "clf_weights_golden.parquet"),
    )
    scored = oclf.score(rows, w, bias, n_buckets)
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([s[0] for s in scored], pa.int64()),
                "n_tokens": pa.array([s[1] for s in scored], pa.int64()),
                "score_mean_micros": pa.array([s[2] for s in scored],
                                              pa.int64()),
            }
        ),
        os.path.join(DATA, "clf_scored_golden.parquet"),
    )
    print("clf_weights_golden:", len(table), "rows;",
          "clf_scored_golden:", len(scored), "rows;",
          "final train acc:", hist[-1]["n_correct"], "/",
          hist[-1]["n_docs"])


if __name__ == "__main__":
    docs = _docs()
    gen_extract_golden(docs)
    gen_extract_golden(docs, variant="optimized", fname="golden_opt_sf0.001.parquet")
    gen_nested_golden(docs)
    gen_layout_golden(docs)
    gen_pages_golden(docs)
    gen_singular_golden(docs)
    gen_media_fixture_and_golden()
    gen_bpe_goldens(docs)
    gen_clf_goldens()
