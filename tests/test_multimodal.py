"""Multimodal binary-column plumbing: schema, Arrow batch shape,
mapInPandas feature extraction with the declared codec stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from strategicai_visibility_loop_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    DecodeNotAvailable,
    audio_chunks,
    decode_image,
    extract_features,
    pil_available,
    resize_images,
    sample_frames,
)


def _media_df(spark):
    rows = [
        (1, bytearray(b"\x89PNG fake image bytes"), ("image/png", 64, 48, None)),
        (2, bytearray(b"RIFF fake wav bytes"), ("audio/wav", None, None, 3500)),
        (3, None, ("image/png", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes_and_determinism(spark):
    out = extract_features(_media_df(spark), dim=8).collect()
    rows = {r["media_id"]: r for r in out}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["mime"] == "image/png"
    assert rows[1]["n_bytes"] == len(b"\x89PNG fake image bytes")
    assert rows[1]["digest"] == hashlib.sha256(b"\x89PNG fake image bytes").hexdigest()
    assert len(rows[1]["feature"]) == 8
    assert all(0.0 <= v < 1.0 for v in rows[1]["feature"])
    # Null payload handled, hashes empty bytes.
    assert rows[3]["n_bytes"] == 0
    assert rows[3]["digest"] == hashlib.sha256(b"").hexdigest()
    # Deterministic across runs.
    again = {r["media_id"]: r for r in extract_features(_media_df(spark), dim=8).collect()}
    assert again[1]["feature"] == rows[1]["feature"]


@pytest.mark.skipif(pil_available(), reason="a real codec is installed")
def test_real_decoder_seam_raises(spark):
    with pytest.raises(Exception) as err:
        extract_features(_media_df(spark), use_fake_decoder=False).collect()
    assert "DecodeNotAvailable" in str(err.value) or "codec" in str(err.value)


@pytest.mark.skipif(pil_available(), reason="a real codec is installed")
def test_decode_image_stub_declared():
    with pytest.raises(DecodeNotAvailable):
        decode_image(b"anything")


@pytest.mark.skipif(not pil_available(), reason="Pillow not installed")
def test_real_decode_through_pillow(spark):
    """When Pillow is present, use_fake_decoder=False must push a real
    JPEG through decode → feature-extract and decode → resize."""
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.new("RGB", (64, 48), color=(200, 10, 10)).save(buf, format="JPEG")
    jpeg = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(jpeg), ("image/jpeg", 64, 48, None))], MEDIA_SCHEMA
    )
    feats = extract_features(df, dim=8, use_fake_decoder=False).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in feats[0]["feature"])
    resized = resize_images(df, 32, 32, use_fake_decoder=False).collect()[0]
    assert (resized["width"], resized["height"]) == (32, 24)
    back = Image.open(io.BytesIO(bytes(resized["payload"])))
    assert (back.width, back.height) == (32, 24)


def test_sample_frames_counts(spark):
    out = sample_frames(_media_df(spark), every_ms=1000).collect()
    per_media = {}
    for r in out:
        per_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    # audio: 3500ms -> samples at 0,1000,2000,3000
    assert sorted(per_media[2]) == [0, 1000, 2000, 3000]
    # no duration -> single frame at 0
    assert per_media[1] == [0]


def test_audio_chunks_byte_ranges(spark):
    """3500 ms of 16 kHz 16-bit mono = 112,000 bytes → three full
    1-second chunks of 32,000 bytes and a 16,000-byte tail; chunks
    tile the payload exactly; images (no duration) emit nothing."""
    out = audio_chunks(_media_df(spark), chunk_ms=1000).collect()
    assert {r["media_id"] for r in out} == {2}
    chunks = sorted(out, key=lambda r: r["chunk_idx"])
    assert [(r["chunk_idx"], r["byte_start"], r["byte_len"]) for r in chunks] == [
        (0, 0, 32000),
        (1, 32000, 32000),
        (2, 64000, 32000),
        (3, 96000, 16000),
    ]
    assert sum(r["byte_len"] for r in chunks) == 112000
    # 8-bit stereo keeps the 2-byte frame; 2 s chunks → 64,000 B + tail.
    st = sorted(
        audio_chunks(
            _media_df(spark), chunk_ms=2000, bytes_per_sample=1, channels=2
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["byte_start"], r["byte_len"]) for r in st] == [(0, 64000), (64000, 48000)]


def test_resize_images_dims_and_passthrough(spark):
    out = {r["media_id"]: r for r in resize_images(_media_df(spark), 32, 32).collect()}
    # 64x48 scaled by min(32/64, 32/48) = 0.5 -> 32x24, aspect preserved.
    assert (out[1]["width"], out[1]["height"]) == (32, 24)
    assert bytes(out[1]["payload"]) == b"\x89PNG fake image bytes"
    # No dimensions in metadata -> quarantined passthrough, not a failure.
    assert out[2]["width"] is None and out[2]["height"] is None
    # Never upscale: 1x1 stays 1x1.
    assert (out[3]["width"], out[3]["height"]) == (1, 1)
    with pytest.raises(Exception) as err:
        resize_images(_media_df(spark), use_fake_decoder=False).collect()
    assert "DecodeNotAvailable" in str(err.value) or "codec" in str(err.value)
