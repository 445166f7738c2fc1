from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from complete_ocr_spark.config import build_spark

    s = build_spark(
        app_name="complete_ocr_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_df(spark):
    """120 synthetic docs as a Spark DataFrame (fixed seed)."""
    from complete_ocr_spark.schemas import DOC_SCHEMA
    from complete_ocr_spark.synth import make_docs

    rows = [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in make_docs(120)]
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)
