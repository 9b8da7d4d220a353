"""Pure-stdlib PNG codec — the fallback leg of the multimodal decode
seam (capability rows 37/85).

The module's contract with ``operators.multimodal.decode_image``: when
Pillow is absent (this container ships no image libraries and has no
network to install one), 8-bit non-interlaced PNG still decodes FOR
REAL — signature + chunk CRCs, zlib-inflated IDAT, per-filter-type
scanline reconstruction (None/Sub/Up/Average/Paeth, RFC 2083 §6), and
palette expansion — so the real-decode branches of feature extraction,
resize, and perceptual hashing run end-to-end on PNG fixtures instead
of skipping. Pillow remains the fast path when installed; anything
this decoder does not cover (16-bit, sub-byte depths, interlace,
non-PNG containers) raises ``PngUnsupportedError`` (a
``NotImplementedError``), which the seam translates to its
``DecodeNotAvailable``.

Scale note: this is a per-payload Python loop — O(pixels) with
byte-level unfiltering — meant for CI fixtures and small quarantine
probes. A 100 TB image corpus should decode through a vectorized
codec (Pillow-SIMD, GPU DALI) plugged into the same
``decode_image`` seam; the Spark-side plumbing (Arrow batches,
mapInPandas schemas) is identical either way.

Distinct error contract (mirrors how the callers quarantine):
- ``PngFormatError`` (ValueError): corrupt/truncated/not-a-PNG bytes —
  the callers' quarantine path (NULL row, never a job abort).
- ``PngUnsupportedError`` (NotImplementedError): valid PNG whose
  features need a real codec — surfaces as DecodeNotAvailable.
"""

from __future__ import annotations

import binascii
import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODE_FOR_CTYPE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}
_CTYPE_FOR_MODE = {"L": 0, "RGB": 2, "LA": 4, "RGBA": 6}


class PngFormatError(ValueError):
    """Corrupt or truncated PNG bytes (quarantine, not abort)."""


class PngLimitError(PngFormatError):
    """Valid PNG exceeding the decode resource cap (quarantine) —
    the decompression-bomb guard, Pillow's MAX_IMAGE_PIXELS analog."""


class PngUnsupportedError(NotImplementedError):
    """Valid PNG needing features only a real codec provides."""


# Decompression-bomb cap: a few-KB crafted PNG can declare huge IHDR
# dims and inflate ~1000:1, OOM-killing an executor — an abort no
# quarantine handler catches. 16M pixels (4096²) is generous for the
# fixture/probe workloads this fallback serves; raise it deliberately
# for bigger single images. The inflate itself is ALSO hard-capped at
# the exact expected byte count via decompressobj(max_length), so a
# lying stream can never materialize more than the declared image.
MAX_PIXELS = 16_000_000


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _parse_chunks(payload: bytes):
    if payload[:8] != _SIG:
        raise PngFormatError("not a PNG (bad signature)")
    pos, n = 8, len(payload)
    ihdr, plte, trns, idat = None, None, None, []
    saw_iend = False
    while pos + 12 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise PngFormatError("truncated chunk")
        data = payload[pos + 8 : end]
        crc = int.from_bytes(payload[end : end + 4], "big")
        if binascii.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            saw_iend = True
            break
        pos = end + 4
    if not saw_iend:
        # a stream truncated exactly between chunks would otherwise
        # "decode" here while Pillow rejects it — the cross-environment
        # classification contract requires rejecting it too
        raise PngFormatError("truncated stream (no IEND)")
    if ihdr is None or len(ihdr) != 13:
        raise PngFormatError("missing/short IHDR")
    if not idat:
        raise PngFormatError("no IDAT data")
    return ihdr, plte, trns, b"".join(idat)


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters (RFC 2083 §6.1-6.6)."""
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise PngFormatError("decompressed size mismatch")
    out = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        o = y * stride
        po = o - stride  # previous (reconstructed) row start
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + left) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                up = out[po + i] if y > 0 else 0
                out[o + i] = (line[i] + up) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[po + i] if y > 0 else 0
                out[o + i] = (line[i] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[po + i] if y > 0 else 0
                ul = out[po + i - bpp] if (y > 0 and i >= bpp) else 0
                out[o + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {f}")
    return out


def decode_png(payload: bytes) -> "PngImage":
    """bytes → PngImage. 8-bit gray/RGB/palette/gray+alpha/RGBA,
    non-interlaced. Palette expands to RGB (RGBA when tRNS present)."""
    ihdr, plte, trns, idat = _parse_chunks(bytes(payload))
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w <= 0 or h <= 0:
        raise PngFormatError("zero dimension")
    if comp != 0 or filt != 0:
        raise PngFormatError("nonstandard compression/filter method")
    if interlace != 0:
        raise PngUnsupportedError("Adam7 interlace needs a real codec")
    if depth != 8:
        raise PngUnsupportedError(f"bit depth {depth} needs a real codec")
    if ctype not in _CHANNELS:
        raise PngUnsupportedError(f"color type {ctype}")
    if ctype == 3 and plte is None:
        raise PngFormatError("palette image without PLTE")
    if w * h > MAX_PIXELS:
        raise PngLimitError(
            f"{w}x{h} exceeds the {MAX_PIXELS}-pixel decode cap"
        )
    bpp = _CHANNELS[ctype]
    expected = h * (1 + w * bpp)
    try:
        # Bounded inflate: never materialize more than the declared
        # image, no matter what the stream claims.
        dec = zlib.decompressobj()
        raw = dec.decompress(idat, expected)
        if dec.unconsumed_tail:
            # We already have `expected` bytes; any FURTHER output
            # means the stream lies about its size. Feeding the tail
            # with a 1-byte cap also lets a well-formed stream consume
            # its trailer so eof/adler can be verified below.
            if dec.decompress(dec.unconsumed_tail, 1):
                raise PngFormatError("decompressed size mismatch")
        # A truncated stream (trailer cut off) can inflate to exactly
        # `expected` bytes without error under the bounded form, where
        # one-shot zlib.decompress would have raised — and a real
        # codec quarantines. Require stream completion so both seam
        # branches classify the payload identically.
        if not dec.eof:
            raise PngFormatError("truncated IDAT stream")
    except zlib.error as e:
        raise PngFormatError(f"IDAT inflate failed: {e}") from e
    px = _unfilter(raw, w, h, bpp)
    if ctype == 3:
        # palette → RGB / RGBA (tRNS gives per-index alpha)
        n_entries = len(plte) // 3
        if trns is not None:
            data = bytearray(w * h * 4)
            for i, idx in enumerate(px):
                if idx >= n_entries:
                    raise PngFormatError("palette index out of range")
                data[4 * i : 4 * i + 3] = plte[3 * idx : 3 * idx + 3]
                data[4 * i + 3] = trns[idx] if idx < len(trns) else 255
            return PngImage("RGBA", w, h, bytes(data))
        data = bytearray(w * h * 3)
        for i, idx in enumerate(px):
            if idx >= n_entries:
                raise PngFormatError("palette index out of range")
            data[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return PngImage("RGB", w, h, bytes(data))
    return PngImage(_MODE_FOR_CTYPE[ctype], w, h, bytes(px))


class PngImage:
    """Minimal decoded-image surface: the subset of the Pillow Image
    API the multimodal seam drives (convert/resize/thumbnail/getdata/
    save + width/height/format), deliberately nothing more. Grayscale
    uses Pillow's exact fixed-point ITU-R 601-2 luma so both seam
    branches agree bit-for-bit on 'L' values; resize is exact
    fractional-coverage box (area) averaging — deterministic across
    platforms, documented as area-average rather than Pillow's
    default bicubic (resized pixels may therefore differ from a
    Pillow resize; hash whole images, not resized crops, when mixing
    environments)."""

    format = "PNG"

    def __init__(self, mode: str, width: int, height: int, data: bytes):
        if mode not in _CTYPE_FOR_MODE:
            raise PngUnsupportedError(f"mode {mode}")
        nch = _CHANNELS[_CTYPE_FOR_MODE[mode]]
        if len(data) != width * height * nch:
            raise PngFormatError("pixel buffer size mismatch")
        self.mode = mode
        self.width = width
        self.height = height
        self._data = bytes(data)
        self._nch = nch

    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)

    def getdata(self):
        """Flat row-major pixel list: ints for 'L', tuples otherwise
        (the Pillow convention the feature extractors consume)."""
        d, n = self._data, self._nch
        if n == 1:
            return list(d)
        return [tuple(d[i : i + n]) for i in range(0, len(d), n)]

    def convert(self, mode: str) -> "PngImage":
        if mode == self.mode:
            return self
        if mode != "L":
            raise PngUnsupportedError(f"convert to {mode}")
        d, n = self._data, self._nch
        if self.mode == "LA":
            return PngImage("L", self.width, self.height, d[0::2])
        # RGB / RGBA → L with Pillow's EXACT fixed-point ITU-R 601-2
        # (libImaging Convert.c: (R·19595 + G·38470 + B·7471 + 2¹⁵)
        # >> 16, coefficients summing to 65536) — a //1000 variant
        # diverges from Pillow on ~0.5% of colors, which flips aHash
        # bits near the grid mean and makes staged phash tables
        # environment-dependent.
        out = bytearray(self.width * self.height)
        for i in range(len(out)):
            o = i * n
            out[i] = (
                d[o] * 19595 + d[o + 1] * 38470 + d[o + 2] * 7471 + 0x8000
            ) >> 16
        return PngImage("L", self.width, self.height, bytes(out))

    def resize(self, size: tuple[int, int]) -> "PngImage":
        tw, th = int(size[0]), int(size[1])
        if tw <= 0 or th <= 0:
            raise PngFormatError("resize to zero dimension")
        if (tw, th) == (self.width, self.height):
            return self
        sw, sh, n, d = self.width, self.height, self._nch, self._data
        xs, ys = sw / tw, sh / th
        out = bytearray(tw * th * n)
        for ty in range(th):
            y0, y1 = ty * ys, (ty + 1) * ys
            iy0, iy1 = int(y0), min(int(-(-y1 // 1)), sh)
            for tx in range(tw):
                x0, x1 = tx * xs, (tx + 1) * xs
                ix0, ix1 = int(x0), min(int(-(-x1 // 1)), sw)
                acc = [0.0] * n
                total = 0.0
                for iy in range(iy0, iy1):
                    wy = min(iy + 1.0, y1) - max(float(iy), y0)
                    if wy <= 0:
                        continue
                    row = (iy * sw + ix0) * n
                    for ix in range(ix0, ix1):
                        wx = min(ix + 1.0, x1) - max(float(ix), x0)
                        if wx <= 0:
                            continue
                        wgt = wx * wy
                        total += wgt
                        o = row + (ix - ix0) * n
                        for c in range(n):
                            acc[c] += d[o + c] * wgt
                o = (ty * tw + tx) * n
                for c in range(n):
                    v = int(acc[c] / total + 0.5) if total > 0 else 0
                    out[o + c] = 255 if v > 255 else (0 if v < 0 else v)
        return PngImage(self.mode, tw, th, bytes(out))

    def thumbnail(self, size: tuple[int, int]) -> None:
        """In-place aspect-preserving downscale, never upscaling —
        the Pillow semantics resize_images' real branch relies on."""
        mw, mh = int(size[0]), int(size[1])
        scale = min(mw / self.width, mh / self.height, 1.0)
        if scale >= 1.0:
            return
        tw = max(1, int(self.width * scale))
        th = max(1, int(self.height * scale))
        small = self.resize((tw, th))
        self.width, self.height = small.width, small.height
        self._data = small._data

    def save(self, fp, format: str | None = None) -> None:
        if format not in (None, "PNG"):
            raise PngUnsupportedError(f"encode {format} needs a real codec")
        fp.write(encode_png(self))


def encode_png(img: PngImage, level: int = 6) -> bytes:
    """PngImage → valid PNG bytes: filter-0 scanlines, one zlib IDAT,
    CRC'd chunks — round-trips through decode_png and any real codec."""
    ctype = _CTYPE_FOR_MODE[img.mode]
    stride = img.width * img._nch
    raw = bytearray()
    for y in range(img.height):
        raw.append(0)
        raw += img._data[y * stride : (y + 1) * stride]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )
