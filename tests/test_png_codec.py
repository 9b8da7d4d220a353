"""Pure-stdlib PNG codec (functions/png.py) — the real-decode leg of
the multimodal seam in codec-less containers.

Decoder correctness is pinned against HAND-FILTERED scanlines: each
filter type's raw bytes are built by applying the RFC 2083 forward
filter to known pixels by hand, so the decoder's reconstruction is
checked against an independent computation, not a round-trip of
itself. The encoder is then checked by round-trip plus byte-level
chunk/CRC validation, and the seam tests drive extract_features /
resize_images / perceptual_hashes end-to-end on real PNG payloads
with use_fake_decoder=False — 0-skip in every environment.
"""

from __future__ import annotations

import binascii
import io
import struct
import zlib

import pytest

from strategicai_visibility_loop_etl_spark.functions.png import (
    PngFormatError,
    PngImage,
    PngUnsupportedError,
    decode_png,
    encode_png,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png(w, h, ctype, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


# ------------------------------------------------- filter reconstruction


def test_filter_none_gray():
    # 3x2 grayscale, filter 0 everywhere.
    raw = b"\x00\x0a\x14\x1e" + b"\x00\x28\x32\x3c"
    img = decode_png(_png(3, 2, 0, raw))
    assert (img.mode, img.width, img.height) == ("L", 3, 2)
    assert img.getdata() == [10, 20, 30, 40, 50, 60]


def test_filter_sub_rgb():
    # 2x1 RGB: pixels (10,20,30), (15,25,35). Sub stores x - left:
    # first pixel raw, second = (5,5,5).
    raw = b"\x01" + bytes([10, 20, 30, 5, 5, 5])
    img = decode_png(_png(2, 1, 2, raw))
    assert img.getdata() == [(10, 20, 30), (15, 25, 35)]


def test_filter_up_gray():
    # 2x2 gray: row0 = (100, 200) filter 0; row1 = (110, 190) as Up:
    # stored = x - up = (10, 246 mod 256).
    raw = b"\x00\x64\xc8" + b"\x02" + bytes([10, 246])
    img = decode_png(_png(2, 2, 0, raw))
    assert img.getdata() == [100, 200, 110, 190]


def test_filter_average_gray():
    # 2x2 gray, want row0=(8, 16) row1=(12, 20).
    # row1 Average: stored = x - (left + up)//2:
    #   x0: left=0, up=8  -> 12 - 4 = 8
    #   x1: left=12, up=16 -> 20 - 14 = 6
    raw = b"\x00\x08\x10" + b"\x03" + bytes([8, 6])
    img = decode_png(_png(2, 2, 0, raw))
    assert img.getdata() == [8, 16, 12, 20]


def test_filter_paeth_gray():
    # 2x2 gray, want row0=(5, 9) row1=(7, 12).
    # Paeth predictor row1: x0 (a=0,b=5,c=0): p=5 -> pred=b=5, stored 2.
    #   x1 (a=7,b=9,c=5): p=7+9-5=11, pa=4,pb=2,pc=6 -> pred=b=9, stored 3.
    raw = b"\x00\x05\x09" + b"\x04" + bytes([2, 3])
    img = decode_png(_png(2, 2, 0, raw))
    assert img.getdata() == [5, 9, 7, 12]


def test_palette_expansion_rgb_and_trns():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = b"\x00\x00\x01\x02"  # one row: indices 0,1,2
    img = decode_png(_png(3, 1, 3, raw, extra=_chunk(b"PLTE", plte)))
    assert img.mode == "RGB"
    assert img.getdata() == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # with tRNS: alpha per palette index (missing entries default 255)
    img2 = decode_png(
        _png(3, 1, 3, raw, extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", bytes([128])))
    )
    assert img2.mode == "RGBA"
    assert img2.getdata() == [
        (255, 0, 0, 128), (0, 255, 0, 255), (0, 0, 255, 255),
    ]


def test_rgba_and_gray_alpha_decode():
    raw = b"\x00" + bytes([1, 2, 3, 4, 5, 6, 7, 8])
    assert decode_png(_png(2, 1, 6, raw)).getdata() == [(1, 2, 3, 4), (5, 6, 7, 8)]
    raw = b"\x00" + bytes([9, 10, 11, 12])
    assert decode_png(_png(2, 1, 4, raw)).getdata() == [(9, 10), (11, 12)]


# ----------------------------------------------------- error contract


def test_corrupt_is_format_error_unsupported_is_not_implemented():
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")
    # bad CRC
    good = _png(1, 1, 0, b"\x00\x07")
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a CRC byte of IEND
    with pytest.raises(PngFormatError):
        decode_png(bytes(bad))
    # corrupt IDAT stream
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    broken = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x12\x34\x56") + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngFormatError):
        decode_png(broken)
    # 16-bit and interlace: valid PNGs beyond the fallback -> unsupported
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x07")) + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngUnsupportedError):
        decode_png(png16)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    png_i = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_i)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x07")) + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngUnsupportedError):
        decode_png(png_i)
    assert issubclass(PngUnsupportedError, NotImplementedError)
    assert issubclass(PngFormatError, ValueError)


def test_decompression_bomb_guard():
    """A few-KB PNG declaring enormous dims must quarantine (ValueError
    class) BEFORE inflating — never OOM the executor — and a stream
    inflating past the declared size must fail as corrupt."""
    from strategicai_visibility_loop_etl_spark.functions.png import (
        MAX_PIXELS,
        PngLimitError,
    )

    # 40000x40000 RGBA declared, tiny highly-compressible IDAT
    ihdr = struct.pack(">IIBBBBB", 40000, 40000, 8, 6, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10000))
        + _chunk(b"IEND", b"")
    )
    assert len(bomb) < 1000
    with pytest.raises(PngLimitError):
        decode_png(bomb)
    assert issubclass(PngLimitError, ValueError)  # quarantine class
    assert 40000 * 40000 > MAX_PIXELS

    # In-cap dims but the stream inflates PAST the declared size:
    # corrupt, and the bounded inflate must not materialize the excess.
    raw_too_long = b"\x00\x07" * 4  # 1x1 gray needs 2 bytes, gives 8
    over = _png(1, 1, 0, raw_too_long)
    with pytest.raises(PngFormatError):
        decode_png(over)

    # Truncated stream (zlib trailer cut off) can inflate to exactly
    # the declared size under the bounded form — it must still
    # classify as corrupt (one-shot zlib.decompress raised here, and
    # a real codec quarantines the member).
    good = _png(2, 2, 0, b"\x00\x07\x09" + b"\x00\x03\x04")
    idat_off = good.index(b"IDAT")
    import struct as _st
    idat_len = _st.unpack(">I", good[idat_off - 4 : idat_off])[0]
    cut = idat_len - 5  # drop the 4-byte adler trailer + 1
    truncated = (
        good[: idat_off - 4]
        + _chunk(b"IDAT", good[idat_off + 4 : idat_off + 4 + cut])
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngFormatError):
        decode_png(truncated)


# ------------------------------------------------ image-surface methods


def test_convert_l_uses_pillow_exact_fixed_point_luma():
    # Pillow's libImaging formula: (R*19595 + G*38470 + B*7471 +
    # 0x8000) >> 16 — NOT (R*299+G*587+B*114)//1000: the fixed-point
    # form half-rounds where the //1000 form floors (e.g. (0,0,5):
    # 1 vs 0), and tens of thousands of colors diverge. Staged phash
    # tables must not depend on which codec leg hashed them.
    img = PngImage("RGB", 3, 1, bytes([255, 0, 0, 10, 20, 30, 0, 0, 5]))
    li = img.convert("L")
    assert li.getdata() == [
        (255 * 19595 + 0x8000) >> 16,
        (10 * 19595 + 20 * 38470 + 30 * 7471 + 0x8000) >> 16,
        (5 * 7471 + 0x8000) >> 16,
    ]
    assert li.getdata()[2] == 1  # the //1000 variant floors to 0
    # LA drops alpha; L is identity
    la = PngImage("LA", 2, 1, bytes([7, 255, 9, 0]))
    assert la.convert("L").getdata() == [7, 9]
    assert li.convert("L") is li


def test_resize_box_average_exact():
    # 2x2 -> 1x1 is the plain mean of the four pixels.
    img = PngImage("L", 2, 2, bytes([10, 20, 30, 40]))
    assert img.resize((1, 1)).getdata() == [25]
    # 4x1 -> 2x1: halves average pairwise.
    img = PngImage("L", 4, 1, bytes([0, 100, 200, 50]))
    assert img.resize((2, 1)).getdata() == [50, 125]
    # fractional coverage: 3x1 -> 2x1, boxes are [0,1.5) and [1.5,3):
    # (10 + 0.5*40)/1.5 = 20, (0.5*40 + 70)/1.5 = 60
    img = PngImage("L", 3, 1, bytes([10, 40, 70]))
    assert img.resize((2, 1)).getdata() == [20, 60]


def test_thumbnail_aspect_and_no_upscale():
    img = PngImage("RGB", 64, 48, bytes(64 * 48 * 3))
    img.thumbnail((32, 32))
    assert (img.width, img.height) == (32, 24)
    img2 = PngImage("L", 4, 4, bytes(16))
    img2.thumbnail((100, 100))
    assert (img2.width, img2.height) == (4, 4)


def test_encode_roundtrip_all_modes():
    for mode, px in [
        ("L", bytes([0, 64, 128, 255])),
        ("LA", bytes([0, 255, 64, 128, 128, 64, 255, 0])),
        ("RGB", bytes(range(12))),
        ("RGBA", bytes(range(16))),
    ]:
        nch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
        img = PngImage(mode, 2, len(px) // (2 * nch), px)
        out = io.BytesIO()
        img.save(out)
        back = decode_png(out.getvalue())
        assert back.mode == mode and back.size == img.size
        assert back._data == img._data
    with pytest.raises(PngUnsupportedError):
        PngImage("L", 1, 1, b"\x00").save(io.BytesIO(), format="JPEG")


def test_encoder_agrees_with_pillow_when_available():
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        # codec-less container: the byte-validity of our encoder is
        # already pinned by decode_png's CRC + size checks above
        return
    from PIL import Image

    img = PngImage("RGB", 3, 2, bytes(range(18)))
    pil = Image.open(io.BytesIO(encode_png(img)))
    assert (pil.width, pil.height, pil.mode) == (3, 2, "RGB")
    assert list(pil.getdata()) == img.getdata()


# ------------------------------------------- seam: real decode in Spark


def _real_png_df(spark):
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    # 8x4 RGB gradient — decodes identically through either codec leg.
    px = bytearray()
    for y in range(4):
        for x in range(8):
            px += bytes([x * 30, y * 60, 128])
    payload = encode_png(PngImage("RGB", 8, 4, bytes(px)))
    rows = [(1, bytearray(payload), ("image/png", 8, 4, None))]
    return spark.createDataFrame(rows, MEDIA_SCHEMA), bytes(px)


def test_real_decode_branch_runs_on_png_without_pillow(spark):
    """Capability row 85: the REAL-decode branch (use_fake_decoder=
    False) runs end-to-end on PNG in every environment — no skips."""
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    df, px = _real_png_df(spark)
    feats = extract_features(df, dim=4, use_fake_decoder=False).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 4
    # Real pixels, not digest noise: the gradient rises left to right.
    f = feats[0]["feature"]
    assert all(0.0 <= v <= 1.0 for v in f)
    assert f[0] < f[-1]

    resized = resize_images(df, 4, 4, use_fake_decoder=False).collect()[0]
    assert (resized["width"], resized["height"]) == (4, 2)
    back = decode_png(bytes(resized["payload"]))
    assert (back.width, back.height) == (4, 2)


def test_real_phash_on_png_without_pillow(spark):
    """Near-identical real PNGs land within the banded Hamming radius
    while a different image does not — the REAL perceptual-hash leg,
    codec-free."""
    from strategicai_visibility_loop_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        perceptual_hashes,
    )

    def grad(seed):
        px = bytearray()
        for y in range(16):
            for x in range(16):
                px += bytes([(x * 16 + seed) % 256, y * 16, 40])
        return encode_png(PngImage("RGB", 16, 16, bytes(px)))

    def noise(mult):
        px = bytearray()
        for i in range(256):
            px += bytes([(i * mult) % 256, (i * 7) % 256, (i * 13) % 256])
        return encode_png(PngImage("RGB", 16, 16, bytes(px)))

    rows = [
        (1, bytearray(grad(0)), ("image/png", 16, 16, None)),
        (2, bytearray(grad(1)), ("image/png", 16, 16, None)),  # near-dup
        (3, bytearray(noise(37)), ("image/png", 16, 16, None)),
        # valid signature, corrupt body -> PngFormatError -> quarantine
        (4, bytearray(b"\x89PNG\r\n\x1a\n" + b"garbage body"), ("image/png", 16, 16, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    ph = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(df, use_fake_decoder=False).collect()
    }
    assert ph[1] == ph[2]  # 1-unit hue shift: same aHash
    assert ph[1] != ph[3]
    assert ph[4] is None  # corrupt member quarantined, job survived
