"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs through ``mapInPandas`` so
each Arrow batch is processed vectorized.

Two decode depths:
  * REAL: image dimensions are parsed from the container headers in pure
    Python — PNG IHDR and JPEG SOFn need no pillow — so the width/height
    path is a genuine decoder, not a stub.
  * STUBBED: pixel/sample feature extraction (the pillow/ffmpeg step) —
    ``fake_decode=True`` produces a deterministic hash-derived unit vector
    so the Spark-side plumbing (schema, partitioning, batch shape, UDF
    signature) is fully real and testable; ``fake_decode=False`` raises
    NotImplementedError where the real library call would go.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # REAL pixel statistics (8-bit gray PNG decode, pure Python);
        # null for formats whose pixel decode still needs pillow/ffmpeg
        T.StructField("pix_mean", T.DoubleType()),
        T.StructField("pix_std", T.DoubleType()),
    ]
)

FEATURE_DIM = 16

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def png_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG IHDR chunk — pure header decode."""
    if len(payload) < 24 or not payload.startswith(_PNG_SIG) or payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h)


def jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the first JPEG SOFn segment — marker walk."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        # real JPEGs pad with runs of 0xFF fill bytes before a marker
        # (ISO 10918-1 B.1.1.2) — skip to the last 0xFF of the run
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone markers
            pos += 2
            continue
        if pos + 4 > len(payload):
            return None
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if pos + 9 > len(payload):
                return None
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return (w, h)
        pos += 2 + seg_len
    return None


def image_dims(payload: bytes) -> tuple[int, int] | None:
    """Container-header dimension decode for the formats we recognize."""
    return png_dims(payload) or jpeg_dims(payload)


def png_pixels(width: int, height: int, body_seed: bytes, channels: int = 1) -> bytes:
    """The fixture pixel formula: sample k (row-major, channel-interleaved)
    is ``body_seed[k % len(body_seed)]`` — shared with the q27 oracle,
    which computes expected pixel statistics from this formula WITHOUT
    running the decoder.  ``channels=3`` gives the RGB variant."""
    seed = body_seed or b"\x00"
    n = width * height * channels
    reps = bytes(seed * (n // len(seed) + 1))
    return reps[:n]


def make_png(width: int, height: int, body_seed: bytes = b"", color_type: int = 0) -> bytes:
    """Fully-valid 8-bit PNG (signature + IHDR + IDAT + IEND) for fixtures
    — correct CRCs, REAL deterministic pixel data (``png_pixels``), rows
    filtered with cycling PNG filter types 0-4 so the decoder's unfilter
    dispatch is exercised.  ``color_type`` 0 = grayscale, 2 = RGB truecolor
    (bpp=3 filter look-back, the dominant real-world flavor)."""
    from ..kernels.pdfx import png_predictor_encode

    if color_type not in (0, 2):
        raise ValueError("fixture builder supports gray (0) and RGB (2)")
    channels = 3 if color_type == 2 else 1

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = png_pixels(width, height, body_seed, channels)
    idat = zlib.compress(
        png_predictor_encode(raw, [0, 1, 2, 3, 4], colors=channels, columns=width)
    )
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def png_decode(payload: bytes) -> np.ndarray:
    """REAL pixel decode for 8-bit grayscale (color 0) and RGB truecolor
    (color 2) non-interlaced PNG — pure Python/zlib: chunk walk,
    concatenated-IDAT inflate, PNG row-filter reversal (None/Sub/Up/
    Average/Paeth with the channel-count bpp look-back).  Returns (h, w)
    uint8 for gray, (h, w, 3) for RGB; raises ValueError for other flavors
    (palette/16-bit/interlaced, which would need pillow) or malformed
    data."""
    from ..kernels.pdfx import apply_png_predictor

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    # truncated chunks (struct.error) and corrupt IDAT (zlib.error) are
    # normalized to ValueError — the documented contract, so callers'
    # damaged-download handling (null stats, not a failed Spark task) holds
    try:
        pos = 8
        width = height = None
        channels = 1
        idat = bytearray()
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                width, height, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
                if depth != 8 or color not in (0, 2) or interlace != 0:
                    raise ValueError(
                        f"unsupported PNG flavor (depth={depth} color={color} interlace={interlace})"
                    )
                channels = 3 if color == 2 else 1
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if width is None or not idat:
            raise ValueError("malformed PNG (missing IHDR/IDAT)")
        raw = apply_png_predictor(
            zlib.decompress(bytes(idat)), colors=channels, columns=width
        )
    except (struct.error, zlib.error) as exc:
        raise ValueError(f"malformed PNG: {exc}") from exc
    n = width * height * channels
    if len(raw) < n:
        raise ValueError("truncated PNG pixel data")
    arr = np.frombuffer(raw[:n], dtype=np.uint8)
    return arr.reshape(height, width) if channels == 1 else arr.reshape(height, width, 3)


def png_decode_gray(payload: bytes) -> np.ndarray:
    """Gray-only wrapper over :func:`png_decode` (kept for callers that
    require the (h, w) shape; RGB input raises ValueError)."""
    arr = png_decode(payload)
    if arr.ndim != 2:
        raise ValueError("RGB PNG: use png_decode")
    return arr


def make_jpeg(width: int, height: int, body_seed: bytes = b"") -> bytes:
    """Minimal JPEG byte stream (SOI + APP0 JFIF + SOF0 + EOI) for fixtures."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + body_seed
        + b"\xff\xd9"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: blake2b-seeded unit vector."""
    digest = hashlib.blake2b(payload, digest_size=dim * 4).digest()
    arr = np.frombuffer(digest, dtype=np.uint32).astype(np.float32)
    arr = (arr / np.float32(2**32)) * 2 - 1
    norm = float(np.linalg.norm(arr)) or 1.0
    return arr / norm


def real_png_features(pixels: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL pixel-derived feature vector for decoded gray or RGB images
    (stats pool over all channel samples): [mean, std, min, max] / 255
    followed by a (dim-4)-bin normalized intensity histogram."""
    flat = pixels.astype(np.float64).ravel()
    hist, _ = np.histogram(flat, bins=dim - 4, range=(0, 256))
    head = np.array([flat.mean(), flat.std(), flat.min(), flat.max()]) / 255.0
    return np.concatenate([head, hist / max(1, flat.size)]).astype(np.float32)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Batch feature extraction over binary media via mapInPandas.

    width/height come from a REAL pure-Python container-header decode (PNG
    IHDR / JPEG SOFn; null for other payloads), and 8-bit gray PNGs get a
    REAL pixel decode (``png_decode_gray``: IDAT inflate + row-unfilter) —
    pix_mean/pix_std are genuine pixel statistics.  The ``feature`` vector
    is the documented deterministic stub when ``fake_decode=True``; with
    ``fake_decode=False`` PNGs produce REAL pixel features
    (``real_png_features``) and other formats raise NotImplementedError
    (pillow/ffmpeg absent here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, widths, heights = [], [], [], []
            pmeans, pstds = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nbytes.append(0)
                    widths.append(None)
                    heights.append(None)
                    pmeans.append(None)
                    pstds.append(None)
                    continue
                raw = bytes(payload)
                dims = image_dims(raw)
                widths.append(dims[0] if dims else None)
                heights.append(dims[1] if dims else None)
                pixels = None
                if raw.startswith(_PNG_SIG):
                    try:
                        pixels = png_decode(raw)
                    except ValueError:
                        pixels = None  # unsupported flavor: stats stay null
                if pixels is not None:
                    flat = pixels.astype(np.float64)
                    pmeans.append(float(flat.mean()))
                    pstds.append(float(flat.std()))
                else:
                    pmeans.append(None)
                    pstds.append(None)
                if not fake_decode:
                    if pixels is None:
                        raise NotImplementedError(
                            "real decode beyond gray-8/RGB-8 PNG requires pillow/"
                            "ffmpeg; not available in this environment"
                        )
                    feats.append(real_png_features(pixels).tolist())
                else:
                    feats.append(_fake_features(raw).tolist())
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "pix_mean": pd.Series(pmeans, dtype="float64"),
                    "pix_std": pd.Series(pstds, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests: image rows carry
    REAL PNG/JPEG containers (alternating) with deterministic dimensions;
    audio/video stay opaque hash blobs."""
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        blob = hashlib.blake2b(f"media:{i}".encode(), digest_size=64).digest() * (i % 4 + 1)
        if mtype == "image":
            w, h = 16 + (i % 9) * 8, 12 + (i % 5) * 16
            if i % 2 == 0:
                # every other PNG row is RGB truecolor (color type 2), the
                # dominant real-world flavor — bpp=3 unfilter exercised
                payload = make_png(w, h, blob, color_type=2 if i % 12 == 6 else 0)
            else:
                payload = make_jpeg(w, h, blob)
            meta = (w, h, 0, "png" if i % 2 == 0 else "jpeg")
        else:
            payload = blob
            meta = (None, None, 1000 * (i % 7), "fake")
        rows.append((i, mtype, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
