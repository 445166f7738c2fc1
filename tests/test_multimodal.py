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


def _media_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "media_ref string, width int, height int, n_frames int, payload binary",
    )


def test_media_near_dup_catches_near_and_not_distinct(spark):
    """The media-dedup acceptance shape (round-5 verdict #1): two visually
    NEAR page descriptors (same payload with a handful of nudged bytes — a
    light re-encode) cluster together; visually distinct descriptors do
    not; an exact re-crawl under a different ref clusters at Hamming 0."""
    import hashlib

    from complete_ocr_spark.functions.media_dedup import (
        media_dup_clusters, media_near_dup,
    )

    def keystream(seed, n):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.blake2b(f"{seed}:{c}".encode(), digest_size=64).digest()
            c += 1
        return bytes(out[:n])

    base = keystream("page-a", 64 * 64)
    near = bytearray(base)
    for k in range(0, len(near), 997):  # a few bytes nudged
        near[k] = (near[k] + 5) % 256
    rows = [
        ("img-a", 64, 64, 1, base),
        ("img-a-reenc", 64, 64, 1, bytes(near)),
        ("img-a-copy", 64, 64, 1, base),
        ("img-b", 64, 64, 1, keystream("page-b", 64 * 64)),
        ("img-c", 48, 80, 1, keystream("page-c", 48 * 80)),
    ]
    media = _media_rows(spark, rows)
    pairs = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in media_near_dup(media, max_hamming=3).collect()
    }
    assert pairs.get(("img-a", "img-a-copy")) == 0
    assert ("img-a", "img-a-reenc") in pairs
    assert all("img-b" not in p and "img-c" not in p for p in pairs)
    clusters = {
        r["media_ref"]: (r["dup_of"], r["n_members"])
        for r in media_dup_clusters(media, max_hamming=3).collect()
    }
    assert clusters == {
        "img-a": ("img-a", 3),
        "img-a-copy": ("img-a", 3),
        "img-a-reenc": ("img-a", 3),
    }


def test_media_phash_banding_is_result_invariant(spark):
    """The popcount verify makes the perceptual pair set banding-independent
    — the SimHash invariant holds on media signatures too."""
    from complete_ocr_spark.functions.media_dedup import media_phash
    from complete_ocr_spark.functions import dedup as dd

    media = spark.read.parquet(
        __import__("complete_ocr_spark.queries", fromlist=["MEDIA_FIXTURE"])
        .MEDIA_FIXTURE
    )
    sigs = media_phash(media).localCheckpoint()

    def pairs(n_blocks):
        return {
            (r["doc1"], r["doc2"], r["hamming"])
            for r in dd.simhash_hamming_pairs_from_sigs(
                sigs, max_hamming=3, n_blocks=n_blocks
            ).collect()
        }

    p4, p8 = pairs(4), pairs(8)
    assert p4 == p8
    assert p8, "fixture must contain planted near-dups"


def test_media_avg_hash_kernel_matches_python_oracle(spark):
    """Spark kernel signatures == the independent pure-Python oracle's
    (oracle/media.py shares no pooling code with the kernel)."""
    from complete_ocr_spark.functions.media_dedup import media_phash
    from complete_ocr_spark.oracle.media import avg_hash_py
    from complete_ocr_spark.queries import MEDIA_FIXTURE

    media = spark.read.parquet(MEDIA_FIXTURE).limit(25)
    rows = {r["media_ref"]: r for r in media.collect()}
    got = {
        r["doc"]: (r["simhash_hi"] << 32) | r["simhash_lo"]
        for r in media_phash(media).collect()
    }
    for ref, r in rows.items():
        assert got[ref] == avg_hash_py(
            bytes(r["payload"]), r["width"], r["height"]
        ), ref


def test_media_avg_hash_handles_sub_grid_frames(spark):
    """Frames smaller than the 8x8 grid (tiny icons) hash deterministically
    — empty pooling cells take the nearest-pixel sample — and the kernel
    still matches the independent Python oracle on them (review fix: the
    naive pooling NaN-polluted the kernel and div-by-zeroed the oracle)."""
    import hashlib

    from complete_ocr_spark.functions.media_dedup import media_phash
    from complete_ocr_spark.oracle.media import avg_hash_py

    def keystream(seed, n):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.blake2b(f"{seed}:{c}".encode(), digest_size=64).digest()
            c += 1
        return bytes(out[:n])

    rows = [
        ("icon-4x4", 4, 4, 1, keystream("icon", 16)),
        ("icon-2x10", 2, 10, 1, keystream("narrow", 20)),
        ("icon-1x1", 1, 1, 1, keystream("dot", 1)),
    ]
    media = _media_rows(spark, rows)
    got = {
        r["doc"]: (r["simhash_hi"] << 32) | r["simhash_lo"]
        for r in media_phash(media).collect()
    }
    for ref, w, h, _nf, payload in rows:
        want = avg_hash_py(payload, w, h)
        assert got[ref] == want, ref
        assert 0 <= got[ref] < 2**64


def test_frame_level_dedup_finds_shared_scenes(spark):
    """Frame-level video dedup (the segment-dedup idea on the video axis):
    two videos sharing ONE scene collide on exactly that frame pair while
    their whole-payload hashes differ; unrelated frames stay unpaired."""
    import hashlib

    from complete_ocr_spark.functions.media_dedup import (
        frame_near_dup, media_phash,
    )

    def keystream(seed, n):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.blake2b(f"{seed}:{c}".encode(), digest_size=64).digest()
            c += 1
        return bytes(out[:n])

    w = h = 32
    scene = keystream("shared-scene", w * h)
    vid_a = scene + keystream("a-rest", 2 * w * h)           # frames 0,1,2
    vid_b = keystream("b-head", w * h) + scene + keystream("b-tail", w * h)
    rows = [
        ("vid-a", w, h, 3, vid_a),
        ("vid-b", w, h, 3, vid_b),
    ]
    media = _media_rows(spark, rows)
    # whole-payload hashes differ: doc-level media dedup sees nothing
    assert media_phash(media).select("simhash_hi", "simhash_lo").distinct().count() == 2
    pairs = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in frame_near_dup(media, max_hamming=3).collect()
    }
    SEP = "\x1f"
    assert pairs == {(f"vid-a{SEP}000000", f"vid-b{SEP}000001"): 0}


def test_video_pair_rollup_counts_cross_video_frames(spark):
    """video_pair_rollup (round-6 verdict #3): frame pairs group to
    (video1, video2, n_shared_frames); within-video self-similarity pairs
    are excluded; videos sharing TWO scenes roll up to one row with
    n_shared_frames=2."""
    import hashlib

    from complete_ocr_spark.functions.media_dedup import (
        frame_near_dup, video_pair_rollup,
    )

    def keystream(seed, n):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.blake2b(f"{seed}:{c}".encode(), digest_size=64).digest()
            c += 1
        return bytes(out[:n])

    w = h = 32
    s1, s2 = keystream("scene-1", w * h), keystream("scene-2", w * h)
    # vid-a: s1, s2, unique; vid-b: unique, s1, s2 (two shared scenes);
    # vid-c: repeats ITS OWN frame (within-video pair only — must not roll up)
    own = keystream("c-own", w * h)
    rows = [
        ("vid-a", w, h, 3, s1 + s2 + keystream("a-rest", w * h)),
        ("vid-b", w, h, 3, keystream("b-head", w * h) + s1 + s2),
        ("vid-c", w, h, 2, own + own),
    ]
    media = _media_rows(spark, rows)
    pairs = frame_near_dup(media, max_hamming=3)
    SEP = "\x1f"
    # sanity: the within-video pair exists at the frame level
    frame_keys = {(r["doc1"], r["doc2"]) for r in pairs.collect()}
    assert (f"vid-c{SEP}000000", f"vid-c{SEP}000001") in frame_keys
    rolled = {
        (r["video1"], r["video2"]): r["n_shared_frames"]
        for r in video_pair_rollup(pairs).collect()
    }
    assert rolled == {("vid-a", "vid-b"): 2}


def test_frame_near_dup_sig_store_route_matches_direct(spark, tmp_path):
    """frame_near_dup(sig_store=...) (round-6 verdict #2) returns the same
    pair set as the direct route while running the decode kernel once."""
    from complete_ocr_spark.functions.media_dedup import frame_near_dup
    from complete_ocr_spark.queries import MEDIA_FIXTURE

    media = spark.read.parquet(MEDIA_FIXTURE).limit(40)
    direct = {
        (r["doc1"], r["doc2"], r["hamming"])
        for r in frame_near_dup(media, max_hamming=3, n_blocks=8).collect()
    }
    stored = {
        (r["doc1"], r["doc2"], r["hamming"])
        for r in frame_near_dup(
            media, max_hamming=3, n_blocks=8,
            sig_store=str(tmp_path / "frame_sigs"),
        ).collect()
    }
    assert direct == stored and stored
