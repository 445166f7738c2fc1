"""Multimodal plumbing: binary payload synthesis, stub decode features,
thumbnails, plan-side frame sampling — deterministic and schema-stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from complete_ocr_spark.functions.multimodal import (
    extract_features_batch,
    FEATURE_SCHEMA,
    frame_sample,
    media_table,
    THUMB_SCHEMA,
    thumbnail_batch,
)


def _media(spark, docs_df):
    return media_table(spark, docs_df).cache()


def test_media_table_deterministic(spark, docs_df):
    m1 = {r["media_ref"]: (r["modality"], r["width"], r["height"], bytes(r["payload"])[:16])
          for r in media_table(spark, docs_df).collect()}
    m2 = {r["media_ref"]: (r["modality"], r["width"], r["height"], bytes(r["payload"])[:16])
          for r in media_table(spark, docs_df).collect()}
    assert m1 == m2 and len(m1) > 50
    assert {v[0] for v in m1.values()} == {"image", "audio", "video"}


def test_feature_extraction_shapes(spark, docs_df):
    media = _media(spark, docs_df)
    feats = media.mapInPandas(extract_features_batch, schema=FEATURE_SCHEMA)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert 0 <= r["mean_luma"] <= 255
        assert len(r["frame_means"]) >= 1


def test_thumbnails(spark, docs_df):
    media = _media(spark, docs_df)
    thumbs = media.mapInPandas(thumbnail_batch(8), schema=THUMB_SCHEMA).collect()
    assert all(len(bytes(r["thumb"])) == 64 for r in thumbs)


def test_frame_sample_is_plan_side(spark, docs_df):
    media = _media(spark, docs_df)
    sampled = frame_sample(media, every_k=2)
    # no Python in the plan: filter+explode only
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan.split("mapInPandas")[0].split("MapInPandas")[0]
    rows = sampled.groupBy("media_ref").agg(F.max("frame_idx").alias("mx")).collect()
    assert all(r["mx"] % 2 == 0 for r in rows)
