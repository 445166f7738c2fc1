"""complete_ocr_spark — a from-scratch PySpark-native document-extraction engine.

Re-expresses the capabilities of the reference repo (``iitb-research-code/
complete-ocr``, read-only at /root/reference) as a Spark DataFrame pipeline over
an Iceberg-shaped table of interleaved text + media documents:

    docs(doc_id string,
         spans array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Text spans flow through a boilerplate-stripping heuristic (link-density /
text-density, jusText/Readability-style); media_ref spans flow through a
layout-parse stage (detection -> NMS -> table grid sessionization -> CTC-style
recognition -> reading-order as-of merge), all inside vectorized pandas/Arrow
UDFs — never per-row Python UDFs.

Correctness contract: exact span-sequence equality (kind, text, media_ref,
order) per document against the pure-Python oracle in
``complete_ocr_spark.oracle`` (a verbatim transcription of the reference
algorithms, citations inline).
"""

__version__ = "0.1.0"
