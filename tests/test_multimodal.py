"""Multimodal column plumbing tests (schemas, batches, determinism)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.multimodal import (
    EMBED_DIM,
    decode_images,
    embed_media,
    pack_media,
    repartition_for_payloads,
    resize_images,
    sample_video_frames,
)


def media_df(spark, n=4, kind="image/png", size=4096):
    rows = [(f"m{i}", kind, hashlib.sha256(str(i).encode()).digest() * (size // 32)) for i in range(n)]
    return spark.createDataFrame(rows, "id string, content_type string, payload binary")


def test_pack_media_metadata(spark):
    df = pack_media(media_df(spark), "payload", "content_type")
    row = df.filter(F.col("id") == "m0").collect()[0]
    assert row["media_meta"]["media_kind"] == "image"
    assert row["media_meta"]["byte_size"] == 4096
    expected = hashlib.sha256(bytes(row["payload"])).hexdigest()
    assert row["media_meta"]["checksum_sha256"] == expected
    # metadata is JVM-side: no Python eval in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_decode_images_deterministic(spark):
    out1 = {r["id"]: r["image_info"] for r in decode_images(media_df(spark)).collect()}
    out2 = {r["id"]: r["image_info"] for r in decode_images(media_df(spark)).collect()}
    assert out1 == out2
    info = out1["m1"]
    assert info["width"] >= 64 and info["height"] >= 64 and info["channels"] == 3


def test_resize_images_bounds_and_payload(spark):
    df = decode_images(media_df(spark))
    out = resize_images(df, max_side=128)
    for r in out.collect():
        assert max(r["image_info"]["width"], r["image_info"]["height"]) <= 128
        assert len(r["payload"]) <= 4096


def test_sample_video_frames_explodes(spark):
    df = media_df(spark, n=2, kind="video/mp4", size=4096)
    out = sample_video_frames(df)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["id"], []).append(r["frame_index"])
        assert r["frame_payload"] is not None
    assert per["m0"] == sorted(per["m0"])
    assert len(per["m0"]) == 4  # 4096 // 1024


def test_embed_media_shape(spark):
    out = embed_media(media_df(spark))
    row = out.collect()[0]
    assert len(row["embedding"]) == EMBED_DIM
    assert all(0.0 <= v <= 1.0 for v in row["embedding"])


def test_repartition_for_payloads(spark):
    df = media_df(spark, n=8)
    total = 8 * 4096
    out = repartition_for_payloads(df, total_bytes=total, target_bytes=8192)
    assert out.rdd.getNumPartitions() == total // 8192 + 1


def test_extract_audio_features(spark):
    from cumulus_etl_spark.operators.multimodal import extract_audio_features, pack_media
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, bytes([0, 127, 128, 255] * 4000)), (2, b""), (3, None)],
        "id long, payload binary",
    )
    out = extract_audio_features(df, sample_rate=16000).collect()
    byid = {r["id"]: r["audio_features"] for r in out}
    f1 = byid[1]
    assert abs(f1["duration_s"] - 1.0) < 1e-6  # 16000 samples @ 16kHz
    assert 0.0 < f1["rms"] <= 1.0 and f1["peak"] <= 1.0
    assert 0.0 < f1["zero_crossing_rate"] < 1.0
    assert byid[2] is None and byid[3] is None


def test_decode_images_real_codec_when_available():
    """With PIL installed the decode stage must return TRUE dimensions
    (feature-flag path); skipped in codec-less sandboxes where the
    deterministic fake is already covered above."""
    import pytest

    from cumulus_etl_spark.operators.multimodal import HAVE_PIL, _decode_dims

    if not HAVE_PIL:
        pytest.skip("PIL not installed — fake-decode path is in force")
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (5, 7)).save(buf, format="PNG")
    assert _decode_dims(buf.getvalue()) == (5, 7, 3)


def test_decode_dims_falls_back_on_garbage_bytes():
    """Undecodable payloads use the checksum fake on EVERY path, so a
    mixed-quality corpus never crashes the decode stage."""
    from cumulus_etl_spark.operators.multimodal import _decode_dims, _fake_dims
    import hashlib

    payload = b"not an image at all"
    expected = _fake_dims(hashlib.sha256(payload).hexdigest())
    assert _decode_dims(payload) == expected


def test_multimodal_catalog_entries_run(spark, sf_correct):
    from cumulus_etl_spark.plans import CATALOG

    for name in ("multimodal_image_stats", "multimodal_audio_features",
                 "multimodal_frame_sample"):
        df = CATALOG[name].build(spark, sf_correct)
        assert df.count() > 0, name
