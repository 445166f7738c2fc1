"""Multimodal column operators: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a struct of typed
metadata — the 100 TB design is "never ship pixels through the plan unless a
kernel needs them" (the reference likewise passes file paths between stages,
not arrays: src/pdf_ocr_frcnn_tesseract_ocr.py:124-136).

The decode/resize/frame-sample kernels are Arrow-batched ``mapInPandas``
operators with REAL Spark plumbing (schema, partitioning, batch shape) and a
deterministic fake decoder: the container has no image/audio libraries, so the
codec step is a seeded stand-in — swap ``_fake_decode`` for PIL/ffmpeg per
executor and nothing else changes. Payload synthesis is deterministic from the
media_ref, mirroring FIXTURES.md.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, modality string, width int, height int, "
    "n_frames int, sample_rate int, payload binary"
)

FEATURE_SCHEMA = (
    "media_ref string, modality string, n_bytes int, "
    "mean_luma double, frame_means array<double>"
)

THUMB_SCHEMA = "media_ref string, thumb_w int, thumb_h int, thumb binary"


def _seed_bytes(media_ref: str, n: int) -> bytes:
    """Deterministic pseudo-payload: repeated blake2b keystream."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out.extend(hashlib.blake2b(f"{media_ref}\x1f{counter}".encode(), digest_size=64).digest())
        counter += 1
    return bytes(out[:n])


def media_meta(media_ref: str) -> tuple[str, int, int, int, int]:
    """(modality, width, height, n_frames, sample_rate) derived from md5
    hex segments so a SQL oracle can recompute them:
    DuckDB ``('0x' || substr(md5(ref), i, 4))::BIGINT`` == ``int(hx[i-1:i+3], 16)``."""
    hx = hashlib.md5(media_ref.encode()).hexdigest()
    h1, h2, h3, h4 = (int(hx[i : i + 4], 16) for i in (0, 4, 8, 12))
    modality = ("image", "audio", "video")[h1 % 3]
    w, hgt = 32 + h2 % 97, 32 + h3 % 97
    n_frames = 1 if modality == "image" else 1 + h4 % 12
    rate = 16000 if modality == "audio" else 0
    return modality, w, hgt, n_frames, rate


def synth_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """media_ref rows -> binary payload + typed metadata (mapInPandas source
    stand-in for an object-store fetch)."""
    for pdf in batches:
        rows = {k: [] for k in ("media_ref", "modality", "width", "height", "n_frames", "sample_rate", "payload")}
        for mr in pdf["media_ref"]:
            modality, w, hgt, n_frames, rate = media_meta(mr)
            size = w * hgt if modality != "audio" else 2048 + (w * hgt) % 2048
            rows["media_ref"].append(mr)
            rows["modality"].append(modality)
            rows["width"].append(w)
            rows["height"].append(hgt)
            rows["n_frames"].append(n_frames)
            rows["sample_rate"].append(rate)
            rows["payload"].append(_seed_bytes(mr, min(size * n_frames, 65536)))
        pdf_out = pd.DataFrame(rows)
        pdf_out["width"] = pdf_out["width"].astype("int32")
        pdf_out["height"] = pdf_out["height"].astype("int32")
        pdf_out["n_frames"] = pdf_out["n_frames"].astype("int32")
        pdf_out["sample_rate"] = pdf_out["sample_rate"].astype("int32")
        yield pdf_out


def _fake_decode(payload: bytes, width: int, height: int, n_frames: int) -> np.ndarray:
    """STUB decoder — deterministic byte reshape standing in for a codec.

    A real deployment replaces this body with PIL/ffmpeg (loaded once per
    executor); callers only see (frames, h, w) uint8.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = n_frames * height * width
    if arr.size < need:
        arr = np.resize(arr, need)
    return arr[:need].reshape(n_frames, height, width)


def extract_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """decode -> per-frame luma means (the feature-extraction UDF shape:
    vectorized over the Arrow batch, per-media numpy kernel inside)."""
    for pdf in batches:
        out = {k: [] for k in ("media_ref", "modality", "n_bytes", "mean_luma", "frame_means")}
        for mr, mod, w, h, nf, payload in zip(
            pdf["media_ref"], pdf["modality"], pdf["width"], pdf["height"],
            pdf["n_frames"], pdf["payload"],
        ):
            frames = _fake_decode(payload, int(w), int(h), int(nf))
            means = frames.reshape(int(nf), -1).mean(axis=1)
            out["media_ref"].append(mr)
            out["modality"].append(mod)
            out["n_bytes"].append(len(payload))
            out["mean_luma"].append(float(means.mean()))
            out["frame_means"].append([float(m) for m in means])
        pdf_out = pd.DataFrame(out)
        pdf_out["n_bytes"] = pdf_out["n_bytes"].astype("int32")
        yield pdf_out


def thumbnail_batch(target: int = 8):
    """decode -> box-filter resize to target x target (uint8 thumb). Returns a
    mapInPandas function; the resize is a numpy mean-pool (stub for a real
    resampler), the plumbing (binary in/out, batch shape) is production-real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_ref", "thumb_w", "thumb_h", "thumb")}
            for mr, w, h, nf, payload in zip(
                pdf["media_ref"], pdf["width"], pdf["height"], pdf["n_frames"], pdf["payload"]
            ):
                frame = _fake_decode(payload, int(w), int(h), int(nf))[0]
                ys = np.linspace(0, frame.shape[0], target + 1).astype(int)
                xs = np.linspace(0, frame.shape[1], target + 1).astype(int)
                thumb = np.empty((target, target), dtype=np.uint8)
                for i in range(target):
                    for j in range(target):
                        thumb[i, j] = int(frame[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean())
                out["media_ref"].append(mr)
                out["thumb_w"].append(target)
                out["thumb_h"].append(target)
                out["thumb"].append(thumb.tobytes())
            pdf_out = pd.DataFrame(out)
            pdf_out["thumb_w"] = pdf_out["thumb_w"].astype("int32")
            pdf_out["thumb_h"] = pdf_out["thumb_h"].astype("int32")
            yield pdf_out

    return fn


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling as a plan-side operator: explode frame indices 0..n-1,
    keep every k-th — pure Catalyst (sequence + filter), no Python."""
    return (
        df.select(
            "media_ref",
            "modality",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_k == 0)
    )


def media_table(spark, docs: DataFrame) -> DataFrame:
    """All media_ref spans of a docs table -> media rows with payloads."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media_ref")
        .select(F.col("s.media_ref").alias("media_ref"))
    )
    return refs.mapInPandas(synth_media_batch, schema=MEDIA_META_SCHEMA)
