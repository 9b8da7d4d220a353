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


def test_real_decoder_seam(spark):
    """0-skip in every environment: without Pillow, a JPEG corpus must
    raise through the declared DecodeNotAvailable seam (a recognized
    container with no codec — never silently quarantined), while
    unidentifiable bytes raise ValueError (the quarantine class,
    Pillow-consistent); with Pillow installed the same JPEG decodes
    end to end (feature extract + resize). Same test, both sides."""
    if not pil_available():
        # Baseline JPEG now decodes FOR REAL through functions.jpeg
        # (r14 — the old DecodeNotAvailable-for-all-JPEG contract is
        # gone); garbage wearing the FF D8 magic fails the marker walk
        # as CORRUPT (quarantine), exactly as Pillow classifies it.
        import numpy as _np

        from tests.jpeg_fixture import encode_jpeg as _enc

        real_jpeg = _enc(
            _np.add.outer(_np.arange(8), _np.arange(8)).astype(_np.uint8) * 4
        )
        jpeg_df = spark.createDataFrame(
            [(1, bytearray(real_jpeg), ("image/jpeg", 8, 8, None)),
             (2, bytearray(b"\xff\xd8\xff\xe0rest-of-jpeg"),
              ("image/jpeg", 4, 4, None))],
            MEDIA_SCHEMA,
        )
        feats = {r["media_id"]: r for r in
                 extract_features(jpeg_df, use_fake_decoder=False).collect()}
        assert feats[1]["feature"] is not None  # real decode
        assert feats[2]["feature"] is None      # corrupt -> quarantine
        # A recognized container the fallbacks do NOT carry still
        # raises through the seam: progressive JPEG (SOF2).
        prog = (b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00")
        with pytest.raises(DecodeNotAvailable):
            decode_image(prog)
        prog_df = spark.createDataFrame(
            [(3, bytearray(prog), ("image/jpeg", 8, 8, None))], MEDIA_SCHEMA
        )
        with pytest.raises(Exception) as err:
            extract_features(prog_df, use_fake_decoder=False).collect()
        assert "DecodeNotAvailable" in str(err.value) or "codec" in str(err.value)
        with pytest.raises(ValueError):
            decode_image(b"anything")  # unidentifiable -> quarantine class
        # Unidentifiable members QUARANTINE (NULL feature), digest real.
        out = {r["media_id"]: r for r in
               extract_features(_media_df(spark), use_fake_decoder=False).collect()}
        assert out[1]["feature"] is None and out[1]["digest"] is not None
        return
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
    # Real branch: unidentifiable payloads QUARANTINE as unresized
    # passthrough with NULL dims (both environments); a codec-less
    # environment still raises for a recognized-but-uncovered format.
    real = {r["media_id"]: r for r in
            resize_images(_media_df(spark), use_fake_decoder=False).collect()}
    assert bytes(real[1]["payload"]) == b"\x89PNG fake image bytes"
    assert real[1]["width"] is None and real[1]["height"] is None
    if not pil_available():
        # Baseline JPEG decodes (r14), but the fallback has NO JPEG
        # ENCODER — the resize re-encode raises through the seam
        # (loud config error, never a silent quarantine of a decodable
        # modality). Garbage wearing the magic is corrupt: passthrough.
        import numpy as _np

        from tests.jpeg_fixture import encode_jpeg as _enc

        real_jpeg = _enc(_np.full((16, 16), 99, dtype=_np.uint8))
        jpeg_df = _media_df(spark).sparkSession.createDataFrame(
            [(9, bytearray(real_jpeg), ("image/jpeg", 16, 16, None))],
            _media_df(spark).schema,
        )
        with pytest.raises(Exception) as err:
            resize_images(jpeg_df, 8, 8, use_fake_decoder=False).collect()
        assert "codec" in str(err.value)
        garbage_df = _media_df(spark).sparkSession.createDataFrame(
            [(9, bytearray(b"\xff\xd8\xff\xe0jpeg"), ("image/jpeg", 2, 2, None))],
            _media_df(spark).schema,
        )
        g = resize_images(garbage_df, use_fake_decoder=False).collect()[0]
        assert bytes(g["payload"]) == b"\xff\xd8\xff\xe0jpeg"
        assert g["width"] is None and g["height"] is None


def _png_bytes(w: int, h: int) -> bytes:
    """A fully valid PNG crafted by hand (real CRCs, real zlib IDAT)
    — no image library involved."""
    import binascii
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + COM + SOF0 header chain — enough of a real
    JPEG for any header parser; SOF0 carries precision/height/width."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 72, 72) + b"\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + \
        struct.pack(">HH", h, w) + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def test_parse_image_header_pure_python():
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        parse_image_header,
    )

    assert parse_image_header(_png_bytes(64, 48)) == ("image/png", 64, 48)
    assert parse_image_header(_jpeg_bytes(192, 128)) == ("image/jpeg", 192, 128)
    gif = b"GIF89a" + (7).to_bytes(2, "little") + (9).to_bytes(2, "little") + b"\x00" * 4
    assert parse_image_header(gif) == ("image/gif", 7, 9)
    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(b"plain text") == (None, None, None)
    # JPEG SOI but truncated before any SOF: mime sniffed, dims unknown
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == (
        "image/jpeg", None, None,
    )
    # truncated PNG (signature only)
    assert parse_image_header(b"\x89PNG\r\n\x1a\n") == (None, None, None)


def test_parse_image_header_agrees_with_pillow_when_available():
    """Parity against a real codec, in environments that have one; the
    pure-Python assertions above carry the sandbox."""
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        parse_image_header,
    )

    if not pil_available():
        # still a real check here: the crafted PNG is byte-valid, so
        # zlib must round-trip its IDAT to the declared dimensions
        import struct
        import zlib

        png = _png_bytes(5, 3)
        idat_start = png.index(b"IDAT") + 4
        idat_len = struct.unpack(">I", png[png.index(b"IDAT") - 4: png.index(b"IDAT")])[0]
        raw = zlib.decompress(png[idat_start: idat_start + idat_len])
        assert len(raw) == 3 * (1 + 5 * 3)  # h rows of filter byte + rgb*w
        return
    import io

    from PIL import Image

    for payload in (_png_bytes(64, 48), _jpeg_bytes(192, 128)):
        mime, w, h = parse_image_header(payload)
        try:
            img = Image.open(io.BytesIO(payload))
            assert (img.width, img.height) == (w, h)
        except Exception:
            pass  # the minimal JPEG chain may not fully decode; dims stand


def test_extract_image_meta_dataframe(spark):
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        extract_image_meta,
    )

    png, jpg = _png_bytes(64, 48), _jpeg_bytes(192, 128)
    rows = [
        (1, bytearray(png), ("image/png", 64, 48, None)),
        (2, bytearray(jpg), ("image/jpeg", 192, 128, None)),
        (3, bytearray(b"not an image"), ("image/png", 1, 1, None)),
        (4, None, (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_image_meta(df).collect()}
    assert (got[1]["mime"], got[1]["width"], got[1]["height"]) == ("image/png", 64, 48)
    assert got[1]["n_bytes"] == len(png)
    assert (got[2]["mime"], got[2]["width"], got[2]["height"]) == ("image/jpeg", 192, 128)
    assert got[3]["mime"] is None and got[3]["width"] is None
    assert got[4]["n_bytes"] == 0 and got[4]["mime"] is None


def test_perceptual_hash_neardup_protocol(spark):
    """Image near-dup (capability row 180): identical payloads pair at
    Hamming 0; unrelated payloads (avalanche fake grids) never pair;
    the banded join is pigeonhole-complete for hamming <= bands-1;
    parameter validation raises; plan is Arrow-batched, never
    row-at-a-time."""
    import pytest as _pytest

    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        image_neardup_pairs,
        perceptual_hashes,
    )

    rows = [
        (1, b"imagebytes-A", {"mime": "image/png"}),
        (2, b"imagebytes-A", {"mime": "image/png"}),   # exact dup of 1
        (3, b"imagebytes-B", {"mime": "image/png"}),
        (4, b"imagebytes-B", {"mime": "image/png"}),   # exact dup of 3
        (5, b"imagebytes-C", {"mime": "image/png"}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,string>"
    )
    ph = {r["media_id"]: r["phash"] for r in perceptual_hashes(df).collect()}
    assert ph[1] == ph[2] and ph[3] == ph[4] and ph[1] != ph[3]

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(df, max_hamming=3, bands=4).collect()
    }
    assert pairs.get((1, 2)) == 0 and pairs.get((3, 4)) == 0
    assert all({a, b} in ({1, 2}, {3, 4}) for a, b in pairs)

    # python reference pack for the fake grid — pins bit packing
    import hashlib as _h

    g = [_h.sha512(b"imagebytes-A").digest()[i] / 255.0 for i in range(64)]
    mean = sum(g) / len(g)
    bits = 0
    for i, v in enumerate(g):
        if v > mean:
            bits |= 1 << i
    want = bits - (1 << 64) if bits >= (1 << 63) else bits
    assert ph[1] == want

    with _pytest.raises(ValueError, match="divide"):
        image_neardup_pairs(df, bands=5)
    with _pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(df, max_hamming=4, bands=4)

    plan = image_neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_perceptual_hash_hot_bucket_guard(spark):
    """A constant-image flood (every chunk bucket hot) is dropped by
    the max_bucket guard instead of going quadratic."""
    from pyspark.sql import functions as F

    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        image_neardup_pairs,
    )

    df = spark.range(500).select(
        F.col("id").alias("media_id"),
        F.lit(b"same-bytes").alias("payload"),
        F.create_map(F.lit("mime"), F.lit("image/png")).alias("meta"),
    )
    assert image_neardup_pairs(df, max_bucket=100).count() == 0
