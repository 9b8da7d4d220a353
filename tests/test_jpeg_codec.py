"""Baseline-JPEG decoder (functions/jpeg.py) — closes the JPEG leg of
capability rows 37/85 (VERDICT r14 item 4).

The fixtures come from tests/jpeg_fixture.py's minimal SOF0 encoder
(independent DCT construction — see its module docstring), so the
decoder is exercised without Pillow and without binary blobs. JPEG is
lossy: assertions bound the reconstruction error (quant=1 tables are
near-lossless — only DCT float rounding remains) rather than demand
byte equality like the PNG suite.
"""

from __future__ import annotations

import numpy as np
import pytest

from strategicai_visibility_loop_etl_spark.functions.jpeg import (
    JpegFormatError,
    JpegUnsupportedError,
    decode_jpeg,
)
from tests.jpeg_fixture import _B, encode_jpeg


def _rng(seed=7):
    return np.random.default_rng(seed)


def _gray(img):
    return np.array(img.getdata(), dtype=np.int16).reshape(img.height, img.width)


def _rgb(img):
    return np.array(img.getdata(), dtype=np.int16).reshape(img.height, img.width, 3)


# --------------------------------------------------------------- DCT


def test_fixture_dct_matches_t81_double_sum():
    """The encoder's matrix DCT equals T.81 A.3.3's direct double sum
    (independent formulations — a shared basis bug cannot hide)."""
    rng = _rng(1)
    x = rng.integers(0, 256, (8, 8)).astype(np.float64) - 128.0
    fast = _B @ x @ _B.T
    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for i in range(8):
                for j in range(8):
                    s += (
                        x[i, j]
                        * np.cos((2 * i + 1) * u * np.pi / 16)
                        * np.cos((2 * j + 1) * v * np.pi / 16)
                    )
            direct[u, v] = 0.25 * cu * cv * s
    assert np.abs(fast - direct).max() < 1e-9


# --------------------------------------------------------- grayscale


def test_flat_grayscale_exact():
    arr = np.full((16, 16), 128, dtype=np.uint8)
    img = decode_jpeg(encode_jpeg(arr))
    assert (img.mode, img.width, img.height, img.format) == ("L", 16, 16, "JPEG")
    assert np.array_equal(_gray(img), arr)


def test_gradient_grayscale_near_lossless():
    """quant=1: the only error left is DCT forward/inverse float
    rounding — bounded by 1 LSB."""
    arr = np.add.outer(np.arange(24) * 3, np.arange(40) * 2).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(arr, quant=1))
    assert np.abs(_gray(img) - arr).max() <= 1


def test_random_grayscale_bounded_by_quant():
    """Uniform quant table q: per-coefficient error ≤ q/2, so spatial
    error is bounded (loosely) by a few q — sanity that dequantize and
    zigzag agree between encoder and decoder."""
    rng = _rng(2)
    arr = rng.integers(0, 256, (17, 23)).astype(np.uint8)  # non-multiple dims
    img = decode_jpeg(encode_jpeg(arr, quant=4))
    assert img.size == (23, 17)
    assert np.abs(_gray(img) - arr).max() <= 4 * 8  # 8 ≥ ||IDCT||∞ bound
    # near-lossless table must be strictly tighter
    img1 = decode_jpeg(encode_jpeg(arr, quant=1))
    assert np.abs(_gray(img1) - arr).max() <= 1


def test_multi_mcu_and_odd_dimensions():
    rng = _rng(3)
    arr = rng.integers(0, 256, (33, 50)).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(arr, quant=1))
    assert img.size == (50, 33)
    assert np.abs(_gray(img) - arr).max() <= 1


# ------------------------------------------------------------- color


def test_color_444_roundtrip():
    """4:4:4 with quant=1: encoder YCbCr rounding (±0.5) + coefficient
    quantize-round (±0.5 → ±1 spatial) amplified by the inverse
    transform's 1.772 chroma gain bounds the error at ~3 LSB; solid
    colors (chroma-flat, DC-only) must be tighter."""
    rng = _rng(4)
    arr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(arr, quant=1, subsampling="444"))
    assert (img.mode, img.size) == ("RGB", (16, 16))
    assert np.abs(_rgb(img) - arr).max() <= 4
    solid = np.zeros((8, 8, 3), dtype=np.uint8)
    solid[:] = (200, 40, 40)
    out = _rgb(decode_jpeg(encode_jpeg(solid, quant=1)))
    assert np.abs(out - solid).max() <= 1


def test_color_420_flat_regions_exact_enough():
    """4:2:0: chroma is box-averaged then sample-replicated — exact on
    chroma-flat images, so a two-tone horizontal split survives."""
    arr = np.zeros((32, 32, 3), dtype=np.uint8)
    arr[:16] = (200, 40, 40)
    arr[16:] = (40, 40, 200)
    img = decode_jpeg(encode_jpeg(arr, quant=1, subsampling="420"))
    out = _rgb(img)
    assert np.abs(out[:8] - arr[:8]).max() <= 3
    assert np.abs(out[24:] - arr[24:]).max() <= 3


def test_color_420_odd_dims_decode():
    rng = _rng(5)
    arr = rng.integers(0, 256, (19, 21, 3)).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(arr, quant=2, subsampling="420"))
    assert img.size == (21, 19)


# ---------------------------------------------------------- restarts


def test_restart_markers_equal_unrestarted_decode():
    rng = _rng(6)
    arr = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(arr, quant=2))
    rst = decode_jpeg(encode_jpeg(arr, quant=2, restart_interval=3))
    assert _gray(plain).tolist() == _gray(rst).tolist()


# ----------------------------------------------------- image surface


def test_surface_convert_resize_luma():
    """The decoded object rides the PngImage surface: ITU-R 601-2
    grayscale conversion and deterministic area-average resize."""
    rng = _rng(8)
    arr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(arr, quant=1))
    lum = img.convert("L")
    px = _rgb(img).astype(np.int64)  # int16 would overflow the products
    expect = (px[..., 0] * 19595 + px[..., 1] * 38470 + px[..., 2] * 7471 + 0x8000) >> 16
    assert _gray(lum).tolist() == expect.tolist()
    small = lum.resize((8, 8))
    assert small.size == (8, 8) and small.mode == "L"


def test_save_contract():
    """PNG transcode works (lossless for decoded pixels); JPEG output
    raises the unsupported error the seam maps to DecodeNotAvailable."""
    import io

    from strategicai_visibility_loop_etl_spark.functions.png import decode_png

    arr = np.full((8, 8), 77, dtype=np.uint8)
    img = decode_jpeg(encode_jpeg(arr))
    buf = io.BytesIO()
    img.save(buf)  # default: PNG transcode
    back = decode_png(buf.getvalue())
    assert _gray(back).tolist() == _gray(img).tolist()
    with pytest.raises(JpegUnsupportedError):
        img.save(io.BytesIO(), format="JPEG")


# ------------------------------------------------------------ errors


def _segment(marker, payload):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def test_not_a_jpeg():
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"")


def test_truncation_raises_format_error():
    arr = np.add.outer(np.arange(16), np.arange(16)).astype(np.uint8) * 4
    full = encode_jpeg(arr)
    for cut in (4, len(full) // 2, len(full) - 4):
        with pytest.raises(JpegFormatError):
            decode_jpeg(full[:cut])


def test_progressive_raises_unsupported():
    # SOI + a minimal SOF2 header: recognized container, uncovered shape
    sof2 = _segment(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(JpegUnsupportedError):
        decode_jpeg(b"\xff\xd8" + sof2)


def test_cmyk_and_12bit_raise_unsupported():
    sof_cmyk = _segment(
        0xC0, bytes([8, 0, 8, 0, 8, 4]) + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0])
    )
    with pytest.raises(JpegUnsupportedError):
        decode_jpeg(b"\xff\xd8" + sof_cmyk)
    sof12 = _segment(0xC0, bytes([12, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(JpegUnsupportedError):
        decode_jpeg(b"\xff\xd8" + sof12)


def test_bomb_guard():
    # 8000 x 8000 SOF0 = 64M pixels > MAX_PIXELS: rejected at header
    import struct

    sof = _segment(0xC0, bytes([8]) + struct.pack(">HH", 8000, 8000) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(JpegFormatError, match="MAX_PIXELS"):
        decode_jpeg(b"\xff\xd8" + sof)


def test_eoi_before_scan():
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_restart_markers_with_fill_bytes():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
    FF FF D0 must decode identically to FF D0 (review find: the
    restart peek rejected fill-padded conformant streams)."""
    rng = _rng(11)
    arr = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    plain = encode_jpeg(arr, quant=2, restart_interval=2)
    padded = plain
    for m in range(8):
        padded = padded.replace(bytes([0xFF, 0xD0 + m]), bytes([0xFF, 0xFF, 0xD0 + m]))
    assert padded != plain  # surgery actually inserted fill bytes
    a = _gray(decode_jpeg(plain))
    b = _gray(decode_jpeg(padded))
    assert a.tolist() == b.tolist()


def test_non_divisor_sampling_unsupported():
    """Spec-valid sampling factors with a non-integer upsampling ratio
    (3:2) classify UNSUPPORTED, never a numpy broadcast crash wearing
    the corrupt-quarantine class (review find)."""
    sof = _segment(0xC0, bytes([8, 0, 16, 0, 16, 3])
                   + bytes([1, 0x31, 0, 2, 0x21, 0, 3, 0x11, 0]))  # h 3/2/1
    sos = _segment(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    with pytest.raises(JpegUnsupportedError, match="upsampling"):
        decode_jpeg(b"\xff\xd8" + sof + sos)


def test_corrupt_sos_and_dqt_are_format_errors():
    """Impossible SOS component counts and invalid DQT precision are
    CORRUPTION (ValueError/quarantine), not missing-codec features
    (review find: a bit-flipped ns byte must never abort the job
    through DecodeNotAvailable)."""
    sof = _segment(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    sos_zero = _segment(0xDA, bytes([0, 0, 63, 0]))
    with pytest.raises(JpegFormatError, match="component count"):
        decode_jpeg(b"\xff\xd8" + sof + sos_zero)
    sos_over = _segment(0xDA, bytes([3, 1, 0, 2, 0, 3, 0, 0, 63, 0]))
    with pytest.raises(JpegFormatError, match="component count"):
        decode_jpeg(b"\xff\xd8" + sof + sos_over)
    sos_unknown = _segment(0xDA, bytes([1, 7, 0x00, 0, 63, 0]))
    with pytest.raises(JpegFormatError, match="unknown"):
        decode_jpeg(b"\xff\xd8" + sof + sos_unknown)
    dqt_bad = _segment(0xDB, bytes([0x20]) + bytes(64))
    with pytest.raises(JpegFormatError, match="DQT precision"):
        decode_jpeg(b"\xff\xd8" + dqt_bad + sof)
    # genuinely valid non-interleaved stays UNSUPPORTED
    sof3 = _segment(
        0xC0,
        bytes([8, 0, 8, 0, 8, 3])
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    sos_one = _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    with pytest.raises(JpegUnsupportedError, match="multi-scan"):
        decode_jpeg(b"\xff\xd8" + sof3 + sos_one)


def test_adobe_rgb_colorspace_unsupported():
    """Adobe APP14 transform=0 (or R/G/B component ids) declares RGB
    storage — applying the JFIF YCbCr inverse there returns garbage
    pixels as a 'successful' decode (review find). Uncovered shape:
    raise, never silently mis-decode."""
    import struct as _s

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    plain = encode_jpeg(arr, quant=1)
    adobe = _segment(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    assert adobe[2 + 2 + 11] == 0  # transform byte really is 0
    with pytest.raises(JpegUnsupportedError, match="RGB"):
        decode_jpeg(plain[:2] + adobe + plain[2:])
    # transform=1 (YCbCr) stays decodable
    adobe1 = _segment(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 1]))
    img = decode_jpeg(plain[:2] + adobe1 + plain[2:])
    assert img.size == (8, 8)
    # R/G/B component ids without APP14: same guard
    sof_rgb = _segment(
        0xC0,
        bytes([8, 0, 8, 0, 8, 3])
        + bytes([0x52, 0x11, 0, 0x47, 0x11, 0, 0x42, 0x11, 0]),
    )
    sos3 = _segment(
        0xDA, bytes([3, 0x52, 0x00, 0x47, 0x00, 0x42, 0x00, 0, 63, 0])
    )
    with pytest.raises(JpegUnsupportedError, match="RGB"):
        decode_jpeg(b"\xff\xd8" + sof_rgb + sos3)
    del _s


def test_dht_trailing_garbage_is_corrupt():
    """A DHT segment whose declared length leaves 1-16 undecodable
    trailing bytes is rejected like libjpeg/Pillow (BAD_LENGTH), so
    the payload classifies identically in both environments (review
    find: it previously decoded successfully codec-less)."""
    arr = np.full((8, 8), 50, dtype=np.uint8)
    plain = encode_jpeg(arr)
    # locate the first DHT and extend its length by 3 garbage bytes
    i = plain.index(b"\xff\xc4")
    ln = int.from_bytes(plain[i + 2 : i + 4], "big")
    patched = (
        plain[:i + 2]
        + (ln + 3).to_bytes(2, "big")
        + plain[i + 4 : i + 2 + ln]
        + b"\x00\x00\x00"
        + plain[i + 2 + ln:]
    )
    with pytest.raises(JpegFormatError, match="DHT"):
        decode_jpeg(patched)


# ----------------------------------------------------- seam contract


def test_decode_image_ladder_carries_baseline_jpeg():
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        DecodeNotAvailable,
        decode_image,
        parse_image_header,
    )

    rng = _rng(9)
    arr = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
    payload = encode_jpeg(arr, quant=1)
    mime, w, h = parse_image_header(payload)
    assert (mime, w, h) == ("image/jpeg", 20, 12)
    img = decode_image(payload)
    assert (img.format, img.size) == ("JPEG", (20, 12))

    # progressive: recognized but uncovered -> DecodeNotAvailable
    sof2 = _segment(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(DecodeNotAvailable):
        decode_image(b"\xff\xd8" + sof2)

    # corrupt JPEG-magic garbage: ValueError (quarantine), both envs
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\x00garbage-not-markers")


def test_real_branch_features_and_phash_on_jpeg(spark):
    """The fingerprint/feature real branches run end-to-end on JPEG
    payloads now (decode-only): non-null features, non-null phash."""
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        extract_features,
        perceptual_hashes,
    )

    rng = _rng(10)
    rows = []
    for i in range(3):
        arr = rng.integers(0, 256, (16, 16), dtype=np.uint8).astype(np.uint8)
        rows.append((i, bytearray(encode_jpeg(arr, quant=1)), {"mime": "image/jpeg"}))
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,string>"
    )
    feats = extract_features(df, use_fake_decoder=False).collect()
    assert all(r["feature"] is not None and len(r["feature"]) == 8 for r in feats)
    hashes = perceptual_hashes(df, use_fake_decoder=False).collect()
    assert all(r["phash"] is not None for r in hashes)
