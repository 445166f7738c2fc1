"""Extraction operators: the only Python that touches row data in the pipeline.

All Arrow-batched — the engine's replacement for the reference's per-item
subprocesses (tesseract per word/cell: src/get_nested_ocr.py:292,
src/table_cellwise_detection.py:186) and its per-page model reload
(src/table_cellwise_detection.py:64-70). A real deployment swaps the kernel
bodies (synthetic descriptor -> real detector/recognizer, loaded once per
executor as a module-level singleton); the UDF boundary and the plan stay
identical.

Two forms:

* ``extract_spans_batch`` — the pipeline's mapInPandas kernel. Handles both
  span kinds in ONE pass and emits FLAT rows (doc_id, offset, sub, kind, text,
  media_ref). Flat string/int columns convert to Arrow vectorized; returning
  nested array<struct> from a pandas UDF walks Python objects per span and
  measured ~2.5x slower end-to-end.
* ``strip_text_udf`` / ``extract_media_udf`` — scalar pandas UDFs returning
  array<struct> spans, for span-level composition outside the main pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.page import extract_page_np
from ..kernels.textstrip import strip_blocks
from ..schemas import OUT_SPAN_STRUCT
from ..synth import resolve_descriptor

_OUT = T.ArrayType(OUT_SPAN_STRUCT)

# flat output schema of extract_spans_batch; `sub` is the within-source-span
# output position (reading order inside a page)
FLAT_SCHEMA = (
    "doc_id string, offset int, sub int, kind string, text string, media_ref string"
)


def extract_spans_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, kind, text, media_ref, offset) span rows ->
    flat extracted-span rows. Unknown kinds and null payloads emit nothing."""
    for pdf in batches:
        o_doc: list = []
        o_off: list = []
        o_sub: list = []
        o_kind: list = []
        o_text: list = []
        o_ref: list = []
        for doc_id, kind, text, mref, off in zip(
            pdf["doc_id"], pdf["kind"], pdf["text"], pdf["media_ref"], pdf["offset"]
        ):
            if kind == "text":
                s = strip_blocks(text)
                outs = [] if s is None else [("text", s, None)]
            elif kind == "media_ref" and mref is not None:
                outs = extract_page_np(resolve_descriptor(mref), int(off), mref)
            else:
                outs = []
            for i, (k, t, m) in enumerate(outs):
                o_doc.append(doc_id)
                o_off.append(off)
                o_sub.append(i)
                o_kind.append(k)
                o_text.append(t)
                o_ref.append(m)
        yield pd.DataFrame(
            {
                "doc_id": o_doc,
                "offset": pd.Series(o_off, dtype="int32"),
                "sub": pd.Series(o_sub, dtype="int32"),
                "kind": o_kind,
                "text": o_text,
                "media_ref": o_ref,
            }
        )


@F.pandas_udf(_OUT)
def strip_text_udf(texts: pd.Series) -> pd.Series:
    """text span -> 0 or 1 output spans (boilerplate-stripped plain text)."""
    out = []
    for t in texts:
        s = strip_blocks(t)
        out.append([] if s is None else [{"kind": "text", "text": s, "media_ref": None}])
    return pd.Series(out)


@F.pandas_udf(_OUT)
def extract_media_udf(media_refs: pd.Series, offsets: pd.Series) -> pd.Series:
    """media_ref span -> extracted page spans (lines/tables/figures in reading
    order). Descriptor resolution stands in for fetching the page payload; the
    page number is the span offset (the reference parses it from the filename,
    src/pdf_ocr_frcnn_tesseract_ocr.py:126-128)."""
    out = []
    for mr, off in zip(media_refs, offsets):
        if mr is None:
            out.append([])
            continue
        spans = extract_page_np(resolve_descriptor(mr), int(off), mr)
        out.append([{"kind": k, "text": t, "media_ref": m} for k, t, m in spans])
    return pd.Series(out)
