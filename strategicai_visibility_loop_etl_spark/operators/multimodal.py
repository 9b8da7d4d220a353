"""Multimodal column plumbing: binary payloads + typed metadata.

Images / audio / video travel as opaque ``binary`` columns next to a
typed metadata struct. The *Spark-side* machinery — schema, batch
shape, Arrow transfer through ``mapInPandas``, partition sizing — is
real and tested. The codec ladder: Pillow when installed; otherwise
the stdlib-only PNG decoder (``functions.png``) carries 8-bit PNG for
real, and everything else raises ``DecodeNotAvailable`` (with a
deterministic fake for codec-agnostic tests).

At 100 TB: binary payloads dominate partition size, so
``spark.sql.files.maxPartitionBytes`` should be tuned down (payload
rows are huge) and decode parallelism follows partitions — mapInPandas
streams Arrow batches, never materializing a partition in pandas.
"""

from __future__ import annotations

import hashlib
import importlib.util
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pil_available() -> bool:
    """True when a real image codec (Pillow) is importable. The fake
    decoder stays the default either way — tests and CI must not change
    behavior based on what happens to be installed."""
    return importlib.util.find_spec("PIL") is not None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, digest string, feature array<double>"
)


class DecodeNotAvailable(NotImplementedError):
    """Raised when a real media codec would be required."""


# sentinel: "caller did not pre-sniff" (None is a real sniff result)
_UNSNIFFED = object()


def decode_image(payload: bytes, _mime: object = _UNSNIFFED) -> object:
    """Decode bytes to an image object exposing the Pillow surface the
    module drives (convert/resize/thumbnail/getdata/save, width/
    height/format).

    Codec ladder: Pillow when installed (the fast path — any format);
    otherwise the stdlib-only decoders carry the two fixture
    modalities FOR REAL — ``functions.png`` (8-bit non-interlaced
    PNG: zlib inflate + per-filter scanline reconstruction) and
    ``functions.jpeg`` (baseline SOF0/SOF1 JFIF: Huffman scan decode,
    dequantize, exact-float IDCT, chroma upsample, YCbCr→RGB) — so
    PNG and baseline-JPEG corpora exercise the real-decode branch
    even in codec-less containers.

    Error contract: a payload that sniffs as a RECOGNIZED container
    the available codecs cannot decode (GIF/WebP without Pillow,
    16-bit/interlaced PNG, progressive/arithmetic/CMYK JPEG) raises
    ``DecodeNotAvailable`` — loudly, because silently quarantining a
    whole decodable modality would drop valid data. Corrupt or
    unidentifiable bytes raise ``ValueError`` (Pillow's
    UnidentifiedImageError is one) — the callers' per-row quarantine
    path, never a job abort.

    Environment caveat, by design: the corrupt-vs-uncovered
    classification is only as sharp as the available codec. PNG and
    BASELINE-JPEG payloads classify identically in both environments
    (the fallbacks are authoritative for those shapes; garbage with a
    ``FF D8`` magic now fails the marker walk as corrupt here just as
    it fails Pillow); garbage wearing a magic the fallbacks do not
    carry (e.g. GIF bytes, or a fake progressive-JPEG header)
    quarantines under Pillow but raises ``DecodeNotAvailable``
    codec-less — guessing "corrupt" there would silently drop real
    members of an uncovered modality."""
    if pil_available():
        from PIL import Image  # noqa: PLC0415

        return Image.open(io.BytesIO(payload))
    from ..functions.png import (  # noqa: PLC0415
        PngUnsupportedError,
        decode_png,
    )

    # _mime lets a caller that already sniffed the header (the
    # fingerprint router) skip a second parse; external callers never
    # pass it
    if _mime is _UNSNIFFED:
        mime, _w, _h = parse_image_header(payload)
    else:
        mime = _mime
    if mime == "image/png":
        try:
            return decode_png(payload)
        except PngUnsupportedError as e:
            raise DecodeNotAvailable(str(e)) from e
    if mime == "image/jpeg":
        from ..functions.jpeg import (  # noqa: PLC0415
            JpegUnsupportedError,
            decode_jpeg,
        )

        try:
            return decode_jpeg(payload)
        except JpegUnsupportedError as e:
            # progressive/arithmetic/12-bit/CMYK: a real codec's job
            raise DecodeNotAvailable(str(e)) from e
        # JpegFormatError (corrupt) propagates: ValueError, the
        # callers' per-row quarantine path
    if mime is not None:
        raise DecodeNotAvailable(
            f"no codec for {mime} (the built-in fallback decodes 8-bit "
            "PNG and baseline JPEG; install an image codec library for "
            "the rest)"
        )
    raise ValueError("unidentified image payload")


def _decode_for_fingerprint(payload: bytes) -> object:
    """Codec-STABLE decode for hash/feature extraction: an 8-bit
    non-interlaced PNG always routes through the deterministic stdlib
    decoder (``functions.png`` — exact area-average resize), even when
    Pillow is installed. Pillow's ``resize`` defaults to bicubic, so
    the same PNG would otherwise yield different aHash bits / feature
    values depending on which codec happened to be present — and a
    staged phash table written in one environment would not band-match
    in another. Routing PNG here makes 8-bit PNG fingerprints
    identical in both environments by construction. Non-PNG payloads
    (and the PNG variants the fallback does not carry — 16-bit /
    interlaced) still ride ``decode_image``'s ladder and keep its
    codec-dependence caveat."""
    mime, _w, _h = parse_image_header(payload)
    if mime == "image/png":
        from ..functions.png import (  # noqa: PLC0415
            PngFormatError,
            PngUnsupportedError,
            decode_png,
        )

        try:
            return decode_png(payload)
        except PngUnsupportedError as e:
            # 16-bit/interlaced: Pillow leg when present; codec-less
            # raise the seam error DIRECTLY (decode_image would only
            # re-run the same decode_png to reach the same verdict) —
            # either way NOT a stability-covered shape
            if not pil_available():
                raise DecodeNotAvailable(str(e)) from e
        except PngFormatError:
            # the stdlib parser is STRICTER than Pillow (it hard-fails
            # e.g. a bad CRC on an ancillary chunk Pillow ignores):
            # when Pillow is present let it try rather than narrowing
            # r13's coverage; such members are not stability-covered
            # (they quarantine codec-less, decode Pillow-resampled
            # here). Codec-less the error propagates: ValueError, the
            # callers' quarantine path — same as before.
            if not pil_available():
                raise
    # non-PNG (or a PNG only Pillow can carry): ride the ladder,
    # passing the already-sniffed mime so the payload is parsed once
    return decode_image(payload, _mime=mime)


def _real_image_feature(payload: bytes, dim: int) -> list[float] | None:
    """Grayscale the decoded image and average-pool it to ``dim``
    values in [0,1] — a minimal real feature extractor that exercises
    decode → transform → vector end-to-end. Corrupt/unidentifiable
    members return None (the module quarantine convention — a crawl
    corpus always contains some, and one must never abort the job);
    ``DecodeNotAvailable`` still raises (missing codec for a whole
    modality is a configuration error, not a data defect).

    Environment stability: decode goes through
    ``_decode_for_fingerprint`` — 8-bit PNG always uses the
    deterministic stdlib decoder (area-average resize), so PNG feature
    vectors are identical whether or not Pillow is installed; other
    formats inherit the installed codec's resampling and are NOT
    portable across codec environments. Feature tables staged under
    Pillow before this routing existed must be rebuilt once (see
    perceptual_hashes' migration note)."""
    try:
        img = _decode_for_fingerprint(payload).convert("L").resize((dim, 1))
    except DecodeNotAvailable:
        raise
    except Exception:
        return None
    return [p / 255.0 for p in img.getdata()]


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of the
    sha256 digest scaled to [0,1). Keeps tests meaningful (stable values,
    right shape) without any codec."""
    dg = hashlib.sha256(payload or b"").digest()
    return [dg[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8, use_fake_decoder: bool = True) -> DataFrame:
    """payload → feature vector via mapInPandas (Arrow-batched).

    ``use_fake_decoder=False`` decodes for real (grayscale
    average-pool to ``dim`` values) through ``decode_image``'s codec
    ladder — Pillow when installed, the stdlib PNG fallback for 8-bit
    PNG otherwise. Corrupt members quarantine as NULL feature (digest
    and n_bytes still real); a recognized container no available codec
    covers raises ``DecodeNotAvailable`` — the seam where any other
    codec plugs in.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feat = (
                (lambda p: _fake_feature(p, dim))
                if use_fake_decoder
                else (lambda p: _real_image_feature(p, dim))
            )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["meta"].map(lambda m: (m or {}).get("mime")),
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "digest": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(feat),
                }
            )

    # Guide §4: mapInPandas is opaque to column pruning — ship only
    # the columns the function touches (payload rows are huge; an
    # extra metadata column would cross the Arrow boundary for free).
    return df.select("media_id", "meta", "payload").mapInPandas(
        op, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int"
)


def resize_images(
    df: DataFrame,
    max_width: int = 256,
    max_height: int = 256,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Aspect-preserving downscale via mapInPandas (Arrow-batched).

    With ``use_fake_decoder=True`` (the default) the codec is stubbed:
    the fake "resizer" passes the payload through and computes the
    target dimensions from metadata with the same aspect-ratio math a
    real resize would use — so the schema, batch shape, and dimension
    logic are all real and tested. With ``use_fake_decoder=False`` the
    payload is decoded, resized, and re-encoded through
    ``decode_image``'s codec ladder — Pillow when installed; codec-less,
    8-bit PNG round-trips fully (stdlib decode + PNG re-encode) while
    baseline JPEG DECODES but has no stdlib re-encoder, so the resize
    raises ``DecodeNotAvailable`` at the save step (a loud
    missing-codec config error — silently quarantining a whole
    decodable modality is forbidden; fingerprint/feature ops, which
    never re-encode, run JPEG fine). ``DecodeNotAvailable`` likewise
    for recognized containers with no codec at all. Rows whose
    metadata lacks dimensions (fake branch) or whose payload is
    corrupt/unidentifiable (real branch) pass through unresized (None
    width/height), mirroring how a real pipeline quarantines
    undecodable media rather than failing the batch.
    """

    def _target(w, h):
        if w is None or h is None or w <= 0 or h <= 0:
            return None, None
        scale = min(max_width / w, max_height / h, 1.0)
        return int(w * scale), int(h * scale)

    def _real_resize(payload):
        # Corrupt/unidentifiable member: QUARANTINE as unresized
        # passthrough with NULL dims — the same convention the fake
        # branch applies to rows without metadata. DecodeNotAvailable
        # (whole modality uncovered) still raises.
        try:
            img = decode_image(payload)
            fmt = img.format or "PNG"
            img.thumbnail((max_width, max_height))
            buf = io.BytesIO()
            img.save(buf, format=fmt)
        except DecodeNotAvailable:
            raise
        except NotImplementedError as e:
            # a fallback codec that can DECODE the format but not
            # RE-ENCODE it (JPEG without Pillow): same loud seam as a
            # missing decoder — silently quarantining every member of
            # a decodable modality would drop valid data
            raise DecodeNotAvailable(str(e)) from e
        except Exception:
            return payload, None, None
        return buf.getvalue(), img.width, img.height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["meta"]
            if use_fake_decoder:
                dims = [
                    _target((m or {}).get("width"), (m or {}).get("height"))
                    for m in metas
                ]
                payloads = pdf["payload"]
                widths = [d[0] for d in dims]
                heights = [d[1] for d in dims]
            else:
                resized = [_real_resize(p) for p in pdf["payload"]]
                payloads = [r[0] for r in resized]
                widths = [r[1] for r in resized]
                heights = [r[2] for r in resized]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": metas.map(lambda m: (m or {}).get("mime")),
                    "width": widths,
                    "height": heights,
                }
            )

    # Guide §4: mapInPandas is opaque to column pruning — ship only
    # the columns the function touches (payload rows are huge; an
    # extra metadata column would cross the Arrow boundary for free).
    return df.select("media_id", "meta", "payload").mapInPandas(
        op, schema=RESIZED_SCHEMA
    )


def audio_chunks(
    df: DataFrame,
    chunk_ms: int = 1000,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    channels: int = 1,
) -> DataFrame:
    """PCM audio chunking plumbing: one row per fixed-duration chunk
    with its exact byte range (chunk_idx, byte_start, byte_len) —
    the windowing step of an audio-training ingest, computed from
    metadata alone (pure codegen arithmetic: NO payload bytes are
    touched or shuffled until a downstream decode slices them).

    Byte math: frame = ``bytes_per_sample × channels`` bytes; a
    ``chunk_ms`` window covers ``sample_rate × chunk_ms / 1000``
    frames. The final chunk is short (bounded by ``duration_ms``),
    mirroring ``chunk_documents``' tail behavior.
    """
    frame_bytes = bytes_per_sample * channels
    chunk_frames = sample_rate * chunk_ms // 1000
    chunk_bytes = chunk_frames * frame_bytes
    total_frames = (
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) * sample_rate / 1000)
        .cast("long")
    )
    total_bytes = total_frames * frame_bytes
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(total_bytes - 1, F.lit(0)),
        F.lit(chunk_bytes).cast("long"),
    )
    base = df.filter(total_frames > 0).select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        total_bytes.alias("__total"),
        F.explode(starts).alias("byte_start"),
    )
    return base.select(
        "media_id",
        "mime",
        (F.col("byte_start") / chunk_bytes).cast("int").alias("chunk_idx"),
        "byte_start",
        F.least(F.lit(chunk_bytes).cast("long"), F.col("__total") - F.col("byte_start")).alias(
            "byte_len"
        ),
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    Real frame extraction is codec work (stubbed); the *plan shape* —
    explode over a generated timestamp sequence, payload carried
    alongside — is the part that matters for partitioning and is real.
    """
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms).cast("long"),
    )
    return df.select(
        "media_id",
        F.explode(ts).alias("frame_ts_ms"),
        F.col("meta.mime").alias("mime"),
    )


IMAGE_META_SCHEMA = "media_id long, mime string, width int, height int, n_bytes long"

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers (all carry precision+height+width);
# C4=DHT, C8=JPG-extension, CC=DAC are NOT frames.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes | None):
    """(mime, width, height) sniffed from container bytes alone — a
    minimal pure-Python header parser, NO codec library:

    - PNG: 8-byte signature, then the IHDR chunk's big-endian
      width/height (bytes 16-24 — IHDR is required to come first).
    - JPEG: walk the FFxx segment chain from SOI to the first SOFn
      marker; its body is precision(1) + height(2) + width(2).
    - GIF: 6-byte version signature, then the logical screen
      descriptor's little-endian width/height.

    Unknown/truncated payloads return (None, None, None) — the
    quarantine path, never an exception. This is the codec-free leg of
    capability rows 37/85: metadata extraction is fully real in this
    sandbox; only pixel DECODE still needs Pillow.
    """
    if not payload:
        return None, None, None
    if payload[:8] == _PNG_SIG and len(payload) >= 24 and payload[12:16] == b"IHDR":
        return (
            "image/png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            "image/gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone marker, no length field
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                break
            if marker in _JPEG_SOF:
                if i + 9 <= n:
                    return (
                        "image/jpeg",
                        int.from_bytes(payload[i + 7 : i + 9], "big"),
                        int.from_bytes(payload[i + 5 : i + 7], "big"),
                    )
                break
            i += 2 + seg_len
        return "image/jpeg", None, None
    return None, None, None


def extract_image_meta(df: DataFrame) -> DataFrame:
    """payload → sniffed (mime, width, height, n_bytes) with the pure
    byte-level header parser — REAL metadata extraction that needs no
    codec anywhere, Arrow-batched through mapInPandas. Disagreements
    with the metadata column (or nulls) flag corrupt/mislabeled media
    upstream of any expensive decode."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [p[0] for p in parsed],
                    "width": pd.array(
                        [p[1] for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] for p in parsed], dtype="Int32"
                    ),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    # Guide §4: mapInPandas is opaque to column pruning — ship only
    # the columns the function touches (payload rows are huge; an
    # extra metadata column would cross the Arrow boundary for free).
    return df.select("media_id", "payload").mapInPandas(
        op, schema=IMAGE_META_SCHEMA
    )


def perceptual_hashes(
    df: DataFrame,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """64-bit average-hash (aHash) per image: decode → grayscale 8×8
    grid → bit b set iff cell b is above the grid mean → packed
    BIGINT. The standard cheap perceptual fingerprint (near-identical
    images differ in a few bits; crops/rewrites diverge) — the IMAGE
    member of the dedup family's fingerprint column.

    Decode rides the module's seam: the real branch grayscales
    through ``_decode_for_fingerprint`` — 8-bit PNG ALWAYS takes the
    deterministic stdlib decode (area-average resize), so PNG hash
    bits are identical with or without Pillow and staged phash tables
    stay portable across environments; other formats use whatever
    codec is installed (hashes codec-dependent). MIGRATION NOTE: phash
    tables staged in a Pillow environment BEFORE this routing existed
    carry bicubic-resample bits — they will not band-match hashes
    computed now; rebuild staged PNG phash tables once after
    upgrading (a one-time, loud-by-documentation break in exchange
    for permanent cross-environment portability); the deterministic fake
    (sha512-derived grid — 64 digest bytes, one per cell) keeps the
    full plumbing — schema, packing, banding, Hamming verify —
    testable in codec-less environments, where "near-dup" degenerates
    to exact-payload (the fake grid is avalanche). An undecodable
    payload (NULL/empty/corrupt bytes) QUARANTINES as a NULL phash —
    the module convention (extract_image_meta, resize) — because a
    web-crawl image corpus always contains corrupt members and one
    must never abort the job. One Arrow-batched projection, no
    shuffle.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:

            def grid(p: bytes) -> list[float] | None:
                if not p:
                    # absent/empty payload: undecodable in ANY mode —
                    # quarantine (a fake hash of b"" would instead
                    # cluster every NULL payload into one fake dup)
                    return None
                if use_fake_decoder:
                    # sha512: 64 digest bytes — one per grid cell
                    # (_fake_feature's sha256 only covers 32 dims)
                    dg = hashlib.sha512(p).digest()
                    return [dg[i] / 255.0 for i in range(64)]
                try:
                    # _decode_for_fingerprint: 8-bit PNG always takes
                    # the deterministic stdlib decode+resize, so PNG
                    # aHash bits are portable across codec
                    # environments (staged phash tables band-match
                    # regardless of whether Pillow is installed)
                    img = (
                        _decode_for_fingerprint(p)
                        .convert("L")
                        .resize((8, 8))
                    )
                except DecodeNotAvailable:
                    raise
                except Exception:
                    return None  # corrupt member: quarantine, not abort
                return [v / 255.0 for v in img.getdata()]

            def ahash(p: bytes):
                g = grid(p)
                if g is None:
                    return None
                mean = sum(g) / len(g)
                bits = 0
                for i, v in enumerate(g):
                    if v > mean:
                        bits |= 1 << i
                # two's-complement into signed 64-bit (Spark BIGINT)
                return bits - (1 << 64) if bits >= (1 << 63) else bits

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["payload"].map(ahash).astype("Int64"),
                }
            )

    # Guide §4: mapInPandas is opaque to column pruning — ship only
    # the columns the function touches (payload rows are huge; an
    # extra metadata column would cross the Arrow boundary for free).
    return df.select("media_id", "payload").mapInPandas(
        op, schema="media_id long, phash long"
    )


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | str = 10_000,
    use_fake_decoder: bool = True,
    stage_path: str | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by banded perceptual-hash Hamming
    join — the text-SimHash protocol (row 32) applied verbatim to the
    image modality: the hash table delegates to
    ``dedup.simhash_pairs`` (shared chunk explode, data-driven
    ``max_bucket`` hot-bucket guard incl. ``"auto"``, ``bit_count``
    verify — ONE implementation of the protocol, two fingerprint
    producers). Quarantined (NULL-phash) members never pair.

    The hash projection is the expensive leg in real-decoder mode
    (one decode per image): ``stage_path`` materializes the (id,
    phash) table to parquet; without it the table is lineage-cut with
    ``localCheckpoint`` so the decoder still runs ONCE, not once per
    plan consumer (the bucket-size aggregate and both self-join
    sides).
    """
    from .dedup import _stage_roundtrip, simhash_pairs  # noqa: PLC0415

    ph = perceptual_hashes(df, use_fake_decoder=use_fake_decoder).select(
        F.col("media_id").alias("id"), F.col("phash").alias("h")
    )
    if stage_path is not None:
        ph = _stage_roundtrip(ph, stage_path)
    else:
        ph = ph.localCheckpoint(eager=False)
    return simhash_pairs(
        ph, max_hamming=max_hamming, max_bucket=max_bucket, bands=bands
    )
