"""Nested-OCR export: kernel vs ElementTree-oracle byte equality, id
monotonicity, and the U4 masked/unmasked asymmetry."""

from __future__ import annotations

import re

from complete_ocr_spark.kernels.nested import nested_page_np
from complete_ocr_spark.kernels.page import page_text_views_np
from complete_ocr_spark.oracle.nested import (
    build_nested_page,
    export_as_xml,
    nested_counts,
    nested_page_text,
)
from complete_ocr_spark.oracle.reference_oracle import page_text_views
from complete_ocr_spark.synth import make_docs, resolve_descriptor


def _media_refs(n_docs=60):
    for d in make_docs(n_docs):
        for s in d["spans"]:
            if s["kind"] == "media_ref":
                yield s["media_ref"]


def test_nested_kernel_matches_et_oracle():
    n = 0
    for mr in _media_refs():
        desc = resolve_descriptor(mr)
        page = build_nested_page(desc)
        expect = (
            export_as_xml(page),
            nested_page_text(page),
            *nested_counts(page),
        )
        assert nested_page_np(desc) == expect, mr
        n += 1
    assert n > 100


def test_nested_ids_monotone_and_hierarchy():
    checked_pages = 0
    saw_multiline_block = False
    for mr in _media_refs(40):
        hocr, text, nb, nl, nw = nested_page_np(resolve_descriptor(mr))
        blocks = [int(m) for m in re.findall(r'id="block_(\d+)"', hocr)]
        pars = [int(m) for m in re.findall(r'id="par_(\d+)"', hocr)]
        lines = [int(m) for m in re.findall(r'id="line_(\d+)"', hocr)]
        words = [int(m) for m in re.findall(r'id="word_(\d+)"', hocr)]
        assert blocks == list(range(1, nb + 1))
        assert pars == blocks  # par id reuses the block counter (ref :97)
        assert lines == list(range(1, nl + 1))
        assert words == list(range(1, nw + 1))
        assert 'id="page_2"' in hocr  # p_idx+1 bug (ref :44,:73)
        assert hocr.count("x_wconf") == nw
        if nw:
            assert text.startswith(" ")  # leading-space fold (ref :293)
        if nl > nb:
            saw_multiline_block = True
        checked_pages += 1
    assert checked_pages > 50
    assert saw_multiline_block


def test_singular_merge_kernel_matches_oracle():
    from complete_ocr_spark.kernels.nested import singular_merge_np
    from complete_ocr_spark.oracle.nested import singular_word_merge

    cols = ("block_id", "div_x1", "div_y1", "div_x2", "div_y2",
            "par_x1", "par_y1", "par_x2", "par_y2", "n_lines_final")
    pages = 0
    merged_blocks = 0
    for mr in _media_refs(60):
        desc = resolve_descriptor(mr)
        page = build_nested_page(desc)
        o_rows = [tuple(r[c] for c in cols) for r in singular_word_merge(page)]
        k_rows = singular_merge_np(desc)
        assert k_rows == o_rows, mr
        # line conservation: re-parenting never loses a line
        orig = [len(b["lines"]) for b in page["blocks"]]
        assert sum(r[-1] for r in k_rows) == sum(orig)
        merged_blocks += sum(1 for r, n in zip(k_rows, orig) if r[-1] != n)
        pages += 1
    assert pages > 100
    assert merged_blocks > 0  # the treatment actually fires on the corpus


def test_page_views_asymmetry():
    saw_gap = 0
    for mr in _media_refs(60):
        desc = resolve_descriptor(mr)
        txt, nu, nm = page_text_views_np(desc)
        o = page_text_views(mr)
        assert txt == o["txt_unmasked"]
        assert nu == o["n_words_unmasked"]
        assert nm == o["n_words_masked"]
        assert nu >= nm
        if nu > nm:
            saw_gap += 1
    assert saw_gap > 0  # the .txt/.hocr asymmetry is actually exercised
