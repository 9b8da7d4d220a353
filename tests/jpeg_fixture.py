"""Minimal baseline-JPEG (SOF0) ENCODER for test fixtures.

Test-only sibling of ``functions.jpeg``'s decoder: produces small,
fully standard-conformant baseline JFIF streams (markers, DQT, SOF0,
DHT, optional DRI/RSTn, Huffman entropy coding with byte stuffing)
from numpy arrays, so the decoder can be exercised without Pillow and
without vendoring binary fixtures.

Deliberately NOT Annex-K tables: the encoder declares its own trivial
canonical Huffman tables (all 12 DC categories at 4 bits, all 256 AC
run/size symbols at 9-10 bits — valid, prefix-free, no all-ones code) and
writes them in the DHT segment, exactly as the standard allows. That
keeps this file short and transcription-proof while still producing
streams any conformant decoder (including Pillow, when present)
accepts. Compression ratio is irrelevant for fixtures.

Independence note: the forward DCT here is built from the mathematical
definition (orthonormal DCT-II basis), NOT by importing the decoder's
matrix — a shared-bug round-trip would require both modules to derive
the same wrong basis from two independent constructions.
"""

from __future__ import annotations

import struct

import numpy as np

# The SAME public zigzag scan table as the decoder, used in the same
# scan-position->raster-index direction (qc.flat[_ZIGZAG[k]] here
# mirrors block[ZIGZAG[k]] = coef[k] there). This is a spec constant,
# not part of the independence claim — that claim is about the DCT
# basis construction only. Do NOT "fix" this by inverting it.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# DC: categories 0..11, all 4-bit codes (0..11 of 16; all-ones=15 unused)
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
# AC: every run/size byte 0x00..0xFF — 255 codes at 9 bits plus one at
# 10 (a DHT count is a single byte, so 256-at-one-length is not
# representable); canonical codes 0..254 at len 9, then 510 at len 10 —
# prefix-free, nothing all-ones
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = bytes(range(256))


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes

_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)


def _dct_basis() -> np.ndarray:
    # orthonormal DCT-II basis rows: b[u, x] = a(u) cos((2x+1)uπ/16)
    b = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.25) if u else np.sqrt(0.125)
        for x in range(8):
            b[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    # fold the JPEG 1/2·C(u) normalization: DCT-II orthonormal rows
    # already match T.81's S(u,v) = 1/4 C(u)C(v) ΣΣ ... when applied
    # as b @ X @ b.T (verified against the direct double sum in tests)
    return b


_B = _dct_basis()


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    coef = _B @ (block.astype(np.float64) - 128.0) @ _B.T
    qc = np.round(coef / q).astype(int)
    zz = [int(qc.flat[_ZIGZAG[k]]) for k in range(64)]
    # DC
    diff = zz[0] - pred
    t = int(abs(diff)).bit_length()
    code, length = _DC_CODES[t]
    bw.write(code, length)
    if t:
        bits = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(bits & ((1 << t) - 1), t)
    # AC
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]
            bw.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        code, length = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        bits = v if v > 0 else v + (1 << s) - 1
        bw.write(bits & ((1 << s) - 1), s)
        run = 0
    if run:
        code, length = _AC_CODES[0x00]
        bw.write(code, length)
    return zz[0]


def _pad_plane(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw_) * bw_
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    arr: np.ndarray,
    quant: int | np.ndarray = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB array → baseline JFIF
    bytes. ``quant`` is a scalar (uniform table — 1 is near-lossless)
    or an (8, 8) table; ``subsampling`` is "444" or "420" (color
    only); ``restart_interval`` > 0 emits DRI + RSTn markers."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("array must be (h, w) or (h, w, 3)")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    q = np.full((8, 8), quant, dtype=np.float64) if np.isscalar(quant) else np.asarray(quant, dtype=np.float64)

    if gray:
        planes = [arr.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            # box-average 2x2 (pad odd dims by edge replication first)
            cbp = _pad_plane(np.round(cb), 2, 2)
            crp = _pad_plane(np.round(cr), 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    planes = [np.clip(np.round(p), 0, 255) for p in planes]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        _pad_plane(p, mcus_y * vs * 8, mcus_x * hs * 8)
        for p, (hs, vs) in zip(planes, samps)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    zz_q = bytes(int(q.flat[_ZIGZAG[k]]) for k in range(64))
    out += _seg(0xDB, bytes([0x00]) + zz_q)  # DQT table 0 for all comps
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.pad()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(bw, block, q, pred[ci])
            mcu_index += 1
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
