"""Branch pandas-UDFs: the only Python that touches row data in the pipeline.

Both are Arrow-batched (``spark.sql.execution.arrow.maxRecordsPerBatch`` pages
per batch) — the engine's replacement for the reference's per-item subprocesses
(tesseract per word/cell: src/get_nested_ocr.py:292,
src/table_cellwise_detection.py:186) and its per-page model reload
(src/table_cellwise_detection.py:64-70). A real deployment swaps the kernel
bodies (synthetic descriptor -> real detector/recognizer, loaded once per
executor as a module-level singleton); the UDF boundary and the plan stay
identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.page import extract_page_np
from ..kernels.textstrip import strip_blocks
from ..schemas import OUT_SPAN_STRUCT
from ..synth import resolve_descriptor

_OUT = T.ArrayType(OUT_SPAN_STRUCT)


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
