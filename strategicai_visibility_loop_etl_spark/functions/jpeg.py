"""Pure stdlib+numpy baseline-JPEG decoder — the JPEG leg of the
multimodal decode seam (capability rows 37/85).

Contract with ``operators.multimodal.decode_image``: when Pillow is
absent, baseline JFIF (SOF0, and SOF1 extended-sequential — both are
Huffman DC/AC with the identical scan structure) still decodes FOR
REAL: marker walk, DQT/DHT table builds (canonical Huffman per ITU
T.81 Annex C), byte-stuffed entropy-coded scan with restart markers,
dequantize → de-zigzag → exact float IDCT (one vectorized numpy
``M·B·Mᵀ`` over every block), chroma upsampling by sample replication,
and the JFIF YCbCr→RGB transform. Anything beyond that — progressive
(SOF2), arithmetic coding, lossless, hierarchical, 12-bit precision,
4-component CMYK/YCCK — raises ``JpegUnsupportedError``
(NotImplementedError), which the seam translates to
``DecodeNotAvailable``.

Pixel-exactness caveat, by design: unlike PNG (lossless — any correct
decoder emits identical pixels), JPEG decoding is NOT bit-identical
across codecs — T.81 only bounds IDCT error (Annex A), and chroma
upsampling is implementation-defined (libjpeg "fancy" triangle vs this
module's sample replication). Decoded pixels therefore differ from
Pillow by ±1-2 LSB, which the multimodal module already documents for
every non-PNG format: JPEG fingerprints are codec-dependent; PNG is
the cross-environment-stable fixture modality
(``_decode_for_fingerprint``).

Scale note (same as functions.png): the Huffman bit loop is per-payload
Python — CI fixtures and quarantine probes, not the 100 TB hot path; a
production corpus plugs a vectorized codec into the same
``decode_image`` seam.

Error contract (mirrors the PNG module):
- ``JpegFormatError`` (ValueError): corrupt/truncated bytes — the
  callers' quarantine path.
- ``JpegUnsupportedError`` (NotImplementedError): valid JPEG whose
  features need a real codec — surfaces as DecodeNotAvailable.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import PngImage, PngUnsupportedError


class JpegFormatError(ValueError):
    """Corrupt or truncated JPEG bytes (quarantine, not abort)."""


class JpegUnsupportedError(NotImplementedError):
    """Valid JPEG needing features only a real codec provides."""


# Decompression-bomb cap — same rationale and size as png.MAX_PIXELS:
# a tiny crafted stream can declare enormous SOF dims.
MAX_PIXELS = 16_000_000

# Zig-zag index: ZIGZAG[k] = raster position of the k-th scanned coef.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_SOF_UNSUPPORTED = {
    0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


class JpegImage(PngImage):
    """Decoded baseline JPEG riding the PngImage surface (convert/
    resize/thumbnail/getdata, ITU-R 601-2 luma, area-average resize).
    ``save`` has no stdlib JPEG encoder behind it: PNG transcode works
    (lossless for the decoded pixels); asking for JPEG output raises
    ``JpegUnsupportedError`` so the seam surfaces it loudly as a
    missing-codec configuration error, never a silent quarantine."""

    format = "JPEG"

    def save(self, fp, format: str | None = None) -> None:
        if format in ("JPEG", "JPG"):
            raise JpegUnsupportedError(
                "JPEG encoding needs a real codec (decode-only fallback)"
            )
        try:
            super().save(fp, format=format)
        except PngUnsupportedError as e:  # non-PNG target format
            raise JpegUnsupportedError(str(e)) from e


class _Huffman:
    """Canonical Huffman decode table (T.81 Annex C): codes of each
    length assigned in symbol order, lengths ascending. Lookup walks
    bit-by-bit keeping (code, length) against a per-length dict —
    max 16 steps, dict hits O(1)."""

    __slots__ = ("by_len",)

    def __init__(self, counts: list[int], symbols: bytes):
        if len(counts) != 16 or sum(counts) != len(symbols):
            raise JpegFormatError("malformed DHT segment")
        self.by_len: list[dict[int, int]] = [{} for _ in range(17)]
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >= (1 << length):
                    raise JpegFormatError("overfull Huffman table")
                self.by_len[length][code] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with T.81
    byte stuffing: 0xFF 0x00 yields a literal 0xFF; 0xFF D0-D7 is a
    restart marker (surfaced to the MCU loop); 0xFF D9 (EOI) or any
    other marker ends the scan (missing-data reads then raise)."""

    __slots__ = ("data", "pos", "acc", "nbits", "marker", "_marker_pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None
        self._marker_pos = pos

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegFormatError("truncated entropy-coded segment")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise JpegFormatError("truncated entropy-coded segment")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            else:
                # a real marker: rewind so the caller sees it, and
                # refuse to produce further bits
                self.pos -= 1
                self.marker = nxt
                raise JpegFormatError(
                    "entropy-coded segment ended by marker "
                    f"0xFF{nxt:02X} mid-block"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _Huffman) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.by_len[length].get(code)
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code in scan")

    def at_restart(self) -> int | None:
        """Peek a RSTn/EOI marker at the current byte boundary,
        skipping 0xFF fill bytes (T.81 B.1.1.2 allows any marker to be
        preceded by them — only the FF pair whose second byte is a
        non-FF, non-stuffing code is the marker itself)."""
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 < len(d) and d[p] == 0xFF and d[p + 1] != 0x00:
            self._marker_pos = p
            return d[p + 1]
        return None

    def consume_restart(self) -> None:
        self.pos = self._marker_pos + 2
        self.acc = 0
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t raw bits to the signed coef."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


_IDCT_M = None


def _idct_matrix() -> np.ndarray:
    global _IDCT_M  # noqa: PLW0603 — cached constant
    if _IDCT_M is None:
        m = np.zeros((8, 8))
        for x in range(8):
            for u in range(8):
                c = (1 / np.sqrt(2)) if u == 0 else 1.0
                m[x, u] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
        _IDCT_M = m
    return _IDCT_M


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks → (n, 8, 8) uint8
    samples: exact float 2-D IDCT (M·B·Mᵀ, one einsum over every
    block), +128 level shift, round-half-up, clamp."""
    m = _idct_matrix()
    spatial = np.einsum("xu,nuv,yv->nxy", m, blocks, m) + 128.0
    return np.clip(np.floor(spatial + 0.5), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> JpegImage:
    """Baseline JFIF bytes → JpegImage ('L' for 1 component, 'RGB'
    for 3). See the module docstring for coverage and caveats."""
    d = payload
    if len(d) < 4 or d[0] != 0xFF or d[1] != 0xD8:
        raise JpegFormatError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None  # (h, w, comps) — comps: [(cid, hs, vs, tq)]
    restart_interval = 0
    adobe_transform: int | None = None

    while True:
        if pos + 1 >= len(d):
            raise JpegFormatError("truncated stream (no SOS)")
        if d[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        while pos < len(d) and d[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(d):
            raise JpegFormatError("truncated stream (no SOS)")
        marker = d[pos]
        pos += 1
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:
            raise JpegFormatError("EOI before any scan")
        if marker in _SOF_UNSUPPORTED:
            raise JpegUnsupportedError(
                f"{_SOF_UNSUPPORTED[marker]} JPEG needs a real codec"
            )
        if marker == 0xCC:  # DAC — arithmetic conditioning
            raise JpegUnsupportedError("arithmetic coding needs a real codec")
        if pos + 2 > len(d):
            raise JpegFormatError("truncated marker segment")
        seg_len = struct.unpack(">H", d[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > len(d):
            raise JpegFormatError("truncated marker segment")
        seg = d[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq > 1:
                    # T.81: Pq is 0 (8-bit) or 1 (16-bit); anything
                    # else is a corrupt header — decoding on through
                    # it would return garbage pixels as a success
                    raise JpegFormatError(f"invalid DQT precision {pq}")
                if pq == 1:
                    if i + 128 > len(seg):
                        raise JpegFormatError("short DQT")
                    vals = [
                        struct.unpack(">H", seg[i + 2 * j : i + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    i += 128
                else:
                    if i + 64 > len(seg):
                        raise JpegFormatError("short DQT")
                    vals = list(seg[i : i + 64])
                    i += 64
                table = np.zeros(64)
                for k in range(64):
                    table[ZIGZAG[k]] = vals[k]
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                if i + 17 + n > len(seg):
                    raise JpegFormatError("short DHT")
                table = _Huffman(counts, seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
            if i != len(seg):
                # 1-16 trailing bytes = a truncated table or a lying
                # segment length — libjpeg/Pillow reject (BAD_LENGTH),
                # so accepting here would classify the same payload
                # VALID codec-less and CORRUPT under Pillow
                raise JpegFormatError("DHT segment length mismatch")
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            if len(seg) < 6:
                raise JpegFormatError("short SOF")
            precision, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise JpegUnsupportedError(
                    f"{precision}-bit precision needs a real codec"
                )
            if ncomp not in (1, 3):
                raise JpegUnsupportedError(
                    f"{ncomp}-component JPEG (CMYK/YCCK) needs a real codec"
                )
            if w == 0 or h == 0:
                raise JpegFormatError("zero dimension")
            if w * h > MAX_PIXELS:
                raise JpegFormatError(
                    f"image {w}x{h} exceeds MAX_PIXELS={MAX_PIXELS}"
                )
            if len(seg) < 6 + 3 * ncomp:
                raise JpegFormatError("short SOF")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            for _, hs, vs, _tq in comps:
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise JpegFormatError("invalid sampling factors")
            frame = (h, w, comps)
        elif marker == 0xEE:  # APP14 — Adobe color-transform flag
            if len(seg) >= 12 and seg[:5] == b"Adobe":
                adobe_transform = seg[11]
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegFormatError("short DRI")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — decode the scan and finish
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            # Color-space guard: the inverse transform below is JFIF
            # YCbCr. Adobe APP14 transform=0 declares the components
            # are stored as RGB (no transform), as do 'R'/'G'/'B'
            # component ids — applying YCbCr math there returns
            # GARBAGE pixels as a "successful" decode, far beyond the
            # documented ±1-2 LSB codec caveat. Uncovered shape:
            # raise, never silently mis-decode (Pillow honors APP14).
            if len(frame[2]) == 3:
                ids = tuple(c[0] for c in frame[2])
                if adobe_transform == 0 or ids == (0x52, 0x47, 0x42):
                    raise JpegUnsupportedError(
                        "RGB-colorspace baseline JPEG (Adobe "
                        "transform=0 / RGB component ids) needs a "
                        "real codec"
                    )
            return _decode_scan(
                d, pos, seg, frame, qt, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / DNL / anything else with a length: skipped


def _decode_scan(
    d: bytes,
    pos: int,
    seg: bytes,
    frame,
    qt,
    huff_dc,
    huff_ac,
    restart_interval: int,
) -> JpegImage:
    h, w, comps = frame
    ns = seg[0] if seg else 0
    # impossible counts are CORRUPTION (quarantine), not a missing
    # codec feature: T.81 bounds Ns to 1..4 and a scan cannot name
    # more components than the frame declares
    if ns == 0 or ns > 4 or ns > len(comps):
        raise JpegFormatError(f"invalid SOS component count {ns}")
    if ns < len(comps):
        # a genuinely valid non-interleaved multi-scan stream
        raise JpegUnsupportedError(
            "multi-scan (non-interleaved) JPEG needs a real codec"
        )
    if len(seg) < 1 + 2 * ns + 3:
        raise JpegFormatError("short SOS")
    frame_ids = {c[0] for c in comps}
    scan_tables = {}
    for i in range(ns):
        cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
        if cs not in frame_ids or cs in scan_tables:
            raise JpegFormatError(f"SOS names unknown/duplicate component {cs}")
        scan_tables[cs] = (tda >> 4, tda & 0x0F)
    ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    if (ss, se, ahal) != (0, 63, 0):
        raise JpegUnsupportedError(
            "non-baseline spectral selection needs a real codec"
        )

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        if hmax % hs or vmax % vs:
            # spec-valid but needs fractional upsampling (e.g. 3:2:1
            # factors) — sample replication only carries integer
            # ratios; classify UNSUPPORTED, never let the numpy
            # broadcast error masquerade as corrupt-quarantine
            raise JpegUnsupportedError(
                f"non-integer chroma upsampling ratio ({hmax}/{hs}, "
                f"{vmax}/{vs}) needs a real codec"
            )
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component coefficient block stores, raster order within MCUs
    plane_blocks: list[np.ndarray] = []
    for _cid, hs, vs, _tq in comps:
        plane_blocks.append(
            np.zeros((mcus_y * vs, mcus_x * hs, 8, 8), dtype=np.float64)
        )
    for cid, _hs, _vs, tq in comps:
        if tq not in qt:
            raise JpegFormatError(f"missing quant table {tq}")
        if cid not in scan_tables:
            raise JpegFormatError(f"component {cid} absent from scan")
        td, ta = scan_tables[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegFormatError("missing Huffman table for scan")

    reader = _BitReader(d, pos)
    pred = {c[0]: 0 for c in comps}
    coef = [0] * 64
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                m = reader.at_restart()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise JpegFormatError("expected restart marker")
                reader.consume_restart()
                pred = {c[0]: 0 for c in comps}
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                dc_t, ac_t = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        for k in range(64):
                            coef[k] = 0
                        t = reader.decode(dc_t)
                        if t > 15:
                            raise JpegFormatError("invalid DC category")
                        diff = _extend(reader.bits(t), t)
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegFormatError("AC run past block end")
                            coef[k] = _extend(reader.bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        for k in range(64):
                            block[ZIGZAG[k]] = coef[k]
                        plane_blocks[ci][my * vs + by, mx * hs + bx] = (
                            block.reshape(8, 8) * q
                        )
            mcu_index += 1

    # vectorized IDCT per component, assemble planes, upsample, crop
    planes = []
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        nby, nbx = plane_blocks[ci].shape[:2]
        pix = _idct_blocks(plane_blocks[ci].reshape(-1, 8, 8))
        plane = (
            pix.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        # sample-replication upsampling to full resolution
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return JpegImage("L", w, h, planes[0].tobytes())
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return JpegImage("RGB", w, h, rgb.tobytes())
