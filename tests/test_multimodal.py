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

    for name in ("multimodal_image_header_invariants",
                 "multimodal_audio_pcm_invariants", "multimodal_frame_sample"):
        df = CATALOG[name].build(spark, sf_correct)
        assert df.count() > 0, name


def _png_bytes(w, h, color_type=6):
    """Minimal real PNG: signature + IHDR + tiny IDAT + IEND."""
    import struct as _struct
    import zlib as _zlib

    def chunk(tag, data):
        body = tag + data
        return _struct.pack(">I", len(data)) + body + _struct.pack(">I", _zlib.crc32(body))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x7f" * (w * channels) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(samples, sr=8000):
    """Real 16-bit mono WAV via the stdlib wave writer."""
    import io as _io
    import struct as _struct
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(b"".join(_struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_parse_image_header_real_containers():
    """The stdlib tier really decodes container headers — no PIL needed."""
    import struct as _struct

    from cumulus_etl_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png_bytes(320, 200, color_type=6)) == (320, 200, 4)
    assert parse_image_header(_png_bytes(64, 48, color_type=2)) == (64, 48, 3)

    gif = b"GIF89a" + _struct.pack("<HH", 640, 480) + b"\x00" * 4
    assert parse_image_header(gif) == (640, 480, 3)

    bmp = (
        b"BM" + _struct.pack("<IHHI", 126, 0, 0, 54)
        + _struct.pack("<IiiHH", 40, 123, -77, 1, 24) + b"\x00" * 60
    )
    assert parse_image_header(bmp) == (123, 77, 3)  # top-down DIB → abs(h)

    jpeg = (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + _struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
        + b"\xff\xc0" + _struct.pack(">H", 11) + b"\x08"
        + _struct.pack(">HH", 600, 800) + b"\x03" + b"\x00\x00"             # SOF0
    )
    assert parse_image_header(jpeg) == (800, 600, 3)

    assert parse_image_header(b"BM plain text that is not a bitmap......") is None
    assert parse_image_header(b"just words") is None


def test_decode_images_uses_stdlib_header_parse(spark):
    """decode_images returns REAL dimensions for real PNG payloads even
    without PIL — the stdlib tier, exercised in this very sandbox."""
    from cumulus_etl_spark.operators.multimodal import decode_images, pack_media

    df = spark.createDataFrame(
        [(1, _png_bytes(100, 40)), (2, b"not an image at all")],
        "doc_id long, payload binary",
    ).withColumn("ct", F.lit("image/png"))
    out = {r["doc_id"]: r["image_info"] for r in decode_images(
        pack_media(df, "payload", "ct")).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (100, 40, 4)
    # unrecognized bytes take the checksum fake: deterministic, in-range
    assert out[2]["width"] >= 64 and out[2]["height"] >= 64


def test_extract_audio_features_decodes_real_wav(spark):
    """A real 16-bit WAV decodes through stdlib wave: exact duration from
    the true sample rate, peak at the written amplitude."""
    import math

    from cumulus_etl_spark.operators.multimodal import extract_audio_features

    sr, n = 8000, 8000  # exactly 1 second
    samples = [int(16384 * math.sin(2 * math.pi * 440 * t / sr)) for t in range(n)]
    df = spark.createDataFrame([(1, _wav_bytes(samples, sr))], "doc_id long, payload binary")
    feat = extract_audio_features(df).collect()[0]["audio_features"]
    assert abs(feat["duration_s"] - 1.0) < 1e-6
    assert 0.49 < feat["peak"] <= 0.51          # 16384/32768
    assert 0.3 < feat["rms"] < 0.4              # sine rms = peak/sqrt(2)
    assert 0.1 < feat["zero_crossing_rate"] < 0.12  # 440Hz → ~880 crossings/s


def test_audio_pcm_stats_exact_integers(spark):
    """audio_pcm_stats returns EXACT int64 invariants of the decoded PCM
    — hand-computed on a known sample list, NULL struct for non-WAV."""
    from cumulus_etl_spark.operators.multimodal import audio_pcm_stats

    samples = [0, 5, -3, -3, 7, -32768, 32767, 0]
    df = spark.createDataFrame(
        [(1, _wav_bytes(samples)), (2, b"not audio")],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r["pcm_stats"] for r in audio_pcm_stats(df).collect()}
    assert out[1]["n_samples"] == 8
    assert out[1]["sum_sq"] == sum(s * s for s in samples)
    assert out[1]["peak_abs"] == 32768
    negs = [s < 0 for s in samples]
    assert out[1]["zero_crossings"] == sum(
        1 for a, b in zip(negs, negs[1:]) if a != b
    )
    assert out[2] is None


def test_multimodal_invariant_entries_match_planting_formulas(spark, sf_correct):
    """The planted containers really decode to the formula values: the
    image entry's dims equal the BMP planting arithmetic and the audio
    entry's invariants equal a direct Python replay of the PCM formula —
    independent of the DuckDB oracle that re-proves the same thing."""
    from cumulus_etl_spark.plans import CATALOG

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    lens = {r["doc_id"]: len(r["text"]) for r in docs.select("doc_id", "text").collect()}

    img = CATALOG["multimodal_image_header_invariants"].build(spark, sf_correct)
    for r in img.limit(50).collect():
        L = lens[r["doc_id"]]
        assert (r["width"], r["height"]) == (16 + L % 240, 16 + (L * 7) % 180)
        assert r["channels"] == 3 and r["byte_size"] == 26

    aud = CATALOG["multimodal_audio_pcm_invariants"].build(spark, sf_correct)
    for r in aud.limit(20).collect():
        L = lens[r["doc_id"]]
        n = 50 + L % 100
        us = [(31 * L + 7919 * i) % 65536 for i in range(1, n + 1)]
        ss = [u - 65536 if u >= 32768 else u for u in us]
        negs = [s < 0 for s in ss]
        assert r["n_samples"] == n
        assert r["sum_sq"] == sum(s * s for s in ss)
        assert r["peak_abs"] == max(abs(s) for s in ss)
        assert r["zero_crossings"] == sum(1 for a, b in zip(negs, negs[1:]) if a != b)


def _avi_bytes(frames, w=320, h=240, usec=33333, declared=None):
    """Real minimal RIFF/AVI via struct: hdrl(avih) + movi(00db chunks),
    honoring the RIFF odd-size pad byte."""
    import struct as _struct

    avih = _struct.pack(
        "<IIIIIIIIII16s", usec, 0, 0, 0,
        declared if declared is not None else len(frames),
        0, 1, 0, w, h, b"\x00" * 16,
    )
    hdrl = b"hdrl" + b"avih" + _struct.pack("<I", len(avih)) + avih
    movi = b"movi"
    for data in frames:
        movi += b"00db" + _struct.pack("<I", len(data)) + data
        if len(data) & 1:
            movi += b"\x00"  # RIFF pad byte
    body = (
        b"AVI "
        + b"LIST" + _struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + _struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def test_parse_avi_real_container_walk():
    """The dependency-free AVI demux finds every frame chunk at its true
    byte offset, reads the avih header, and skips RIFF pad bytes."""
    from cumulus_etl_spark.operators.multimodal import parse_avi

    frames = [b"AAAA", b"BBBBB", b"CC"]  # odd middle size → pad byte
    payload = _avi_bytes(frames, w=123, h=77, usec=40000)
    info = parse_avi(payload)
    assert (info["width"], info["height"]) == (123, 77)
    assert info["declared_frames"] == 3 and info["usec_per_frame"] == 40000
    assert [payload[o : o + s] for o, s in info["frames"]] == frames
    # offsets are positions in the file, monotonically increasing
    offs = [o for o, _ in info["frames"]]
    assert offs == sorted(offs) and offs[0] > 0

    assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert parse_avi(b"plainly not a container") is None


def test_sample_video_frames_real_demux_and_stride(spark):
    """AVI payloads take the real-demux tier: true frame bytes + offsets
    + video_info; every_n_seconds sets the stride from the declared
    frame period; non-AVI payloads keep the stub chunker (NULL info)."""
    frames = [bytes([i] * 6) for i in range(6)]
    avi = _avi_bytes(frames, usec=500_000)  # 2 fps
    df = spark.createDataFrame(
        [("v1", avi), ("v2", b"x" * 2048)], "id string, payload binary"
    )
    out = {(r["id"], r["frame_index"]): r for r in
           sample_video_frames(df, every_n_seconds=1.0).collect()}
    # stride = 1s / 0.5s-per-frame = every 2nd frame
    assert sorted(i for (v, i) in out if v == "v1") == [0, 2, 4]
    r = out[("v1", 2)]
    assert bytes(r["frame_payload"]) == frames[2]
    assert r["video_info"]["width"] == 320
    assert bytes(avi)[r["frame_offset"] : r["frame_offset"] + 6] == frames[2]
    # stub path: fixed-size slices, NULL video_info, offsets = slice starts
    stub = [r for (v, i), r in sorted(out.items()) if v == "v2"]
    assert len(stub) == 2 and all(r["video_info"] is None for r in stub)
    assert [r["frame_offset"] for r in stub] == [0, 1024]


def test_frame_sample_entry_matches_planting_formulas(spark, sf_correct):
    """The planted AVIs really demux to the formula values — a direct
    Python replay independent of the DuckDB oracle."""
    from cumulus_etl_spark.plans import CATALOG

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    lens = {r["doc_id"]: len(r["text"]) for r in docs.select("doc_id", "text").collect()}
    out = CATALOG["multimodal_frame_sample"].build(spark, sf_correct)
    for r in out.limit(30).collect():
        L = lens[r["doc_id"]]
        n = 3 + L % 6
        sizes = [8 * (1 + (L + i) % 4) for i in range(1, n + 1)]
        assert r["n_frames"] == n == r["declared_frames"]
        assert (r["width"], r["height"]) == (16 + L % 304, 16 + (L * 5) % 224)
        assert r["total_frame_bytes"] == sum(sizes)
        assert r["first_frame_offset"] == 108
        assert r["last_frame_offset"] == 100 + sum(8 + s for s in sizes[:-1]) + 8
