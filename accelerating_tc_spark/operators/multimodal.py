"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as vectorized pandas
kernels over `mapInPandas`. Image decode is REAL for library-free formats —
pure-numpy P6 PPM and uncompressed 24-bit BMP decoders, plus a stdlib-zlib
non-interlaced 8-bit RGB/RGBA PNG decoder, dispatch on magic bytes
(encoders included as the test-fixture inverses). The boundary to JPEG and
audio/video codecs remains an explicit stub: `decode_image` raises
NotImplementedError for those
unless `fake=True`, in which case a deterministic fake decoder (seeded by
the payload hash) produces stable pseudo-features so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — stays
fully real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for binary PPM (P6, maxval<=255) -> HxWx3 uint8.

    Header: 'P6' then whitespace-separated width/height/maxval, with
    '#'-comments allowed between tokens; a single whitespace byte ends the
    header, then raw RGB triplets row-major."""
    if not payload or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte that terminates the header
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 24-bit BMP -> HxWx3 uint8.

    BITMAPFILEHEADER (14 bytes: pixel-array offset at 10) +
    BITMAPINFOHEADER (width i32 @18, height i32 @22 — positive means
    bottom-up, bpp u16 @28 must be 24, compression u32 @30 must be 0);
    rows are BGR, padded to 4-byte multiples."""
    if not payload or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Pure stdlib-zlib + numpy decoder for non-interlaced 8-bit RGB/RGBA
    PNG -> HxWx3 uint8 (alpha dropped).

    Chunk walk -> IHDR geometry -> zlib-inflate the concatenated IDAT
    stream -> per-scanline unfilter. Filters None/Up are whole-row numpy
    ops; Sub is a wrapping uint8 accumulate along the pixel axis; Average/
    Paeth (never emitted by encode_png, but legal input) fall back to a
    per-byte loop on those scanlines only."""
    import zlib

    if not payload or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat: list[bytes] = []
    w = h = None
    bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, interlace = data[8], data[9], data[12]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise ValueError(
            "only non-interlaced 8-bit RGB/RGBA PNG supported "
            f"(depth={bit_depth}, color_type={color_type}, interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 4
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch + 1
    if raw.size < h * stride:
        raise ValueError("PNG pixel data shorter than geometry requires")
    raw = raw[: h * stride].reshape(h, stride)
    filters = raw[:, 0]
    lines = raw[:, 1:]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y]
        prev = out[y - 1] if y else np.zeros(w * ch, dtype=np.uint8)
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-ch]
            out[y] = np.add.accumulate(
                cur.reshape(w, ch), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif f == 2:  # Up
            out[y] = cur + prev  # uint8 wraps mod 256 per the spec
        elif f in (3, 4):  # Average / Paeth: sequential in x, per-byte
            row = out[y]
            for x in range(w * ch):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:
                    row[x] = (int(cur[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, :3].copy()


def encode_png(img: np.ndarray) -> bytes:
    """Inverse of decode_png (test-fixture generator): HxWx3 uint8 ->
    non-interlaced 8-bit RGB PNG, filter 0 on every scanline."""
    import zlib

    h, w, _ = img.shape
    body = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    body[:, 1:] = img.astype(np.uint8).reshape(h, w * 3)
    compressed = zlib.compress(body.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, color type 2 (RGB), no interlace
    )
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", compressed) + chunk(b"IEND", b"")


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of decode_ppm (test-fixture generator): HxWx3 uint8 -> P6."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """Inverse of decode_bmp (test-fixture generator): bottom-up 24-bit."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_bytes = body.tobytes()
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_bytes).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    header = b"BM" + (14 + 40 + len(pixel_bytes)).to_bytes(4, "little") + b"\0\0\0\0" + (54).to_bytes(4, "little")
    return header + dib + pixel_bytes


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    REAL decoders cover P6 PPM, uncompressed 24-bit BMP, and non-interlaced
    8-bit RGB/RGBA PNG (stdlib zlib + numpy — dispatch on magic bytes).
    JPEG still needs a codec library not present in this container — those
    payloads raise NotImplementedError unless fake=True, in which case a
    deterministic 8x8x3 array derived from the payload digest keeps the
    plumbing testable (stable across runs/machines)."""
    if payload:
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)
    if not fake:
        raise NotImplementedError(
            "only PPM / BMP / non-interlaced 8-bit PNG decode in this "
            "environment (JPEG needs a codec library); pass fake=True for tests"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


FEATURE_DIM = 16
_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, feature array<float>) via mapInPandas — the real plumbing:
    Arrow batches in, per-batch numpy feature extraction, Arrow batches out.
    The decode call is the stub boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(payload, fake=fake).astype(np.float32)
                # channel means/stds + 4x4 pooled luma: a real feature shape
                luma = img.mean(axis=2)
                pooled = _pool_grid(luma, 4).ravel()
                f = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1)), pooled[:10]])
                feats.append(f[:FEATURE_DIM].astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, schema=_FEATURES_SCHEMA)


def _pool_grid(luma: np.ndarray, g: int) -> np.ndarray:
    """g x g block-mean pooling for ANY HxW (uneven blocks get the
    remainder rows/cols, matching how resize-then-pool would bucket)."""
    h, w = luma.shape
    ys = (np.arange(g + 1) * h) // g
    xs = (np.arange(g + 1) * w) // g
    return np.array(
        [
            [
                luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
                for j in range(g)
            ]
            for i in range(g)
        ]
    )


_PIXELS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("r", IntegerType()),
        StructField("g", IntegerType()),
        StructField("b", IntegerType()),
    ]
)


def decode_pixels(media: DataFrame) -> DataFrame:
    """(media_id, y, x, r, g, b): every pixel of every REAL-decodable
    payload (P6 PPM / 24-bit BMP), exploded — the oracle surface for the
    decoder: DuckDB can aggregate these rows and must agree with the
    numpy-side channel statistics computed independently from the same
    payloads (media_channel_stats contract row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "y", "x", "r", "g", "b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload)
                h, w, _ = img.shape
                yy, xx = np.mgrid[0:h, 0:w]
                out["media_id"].append(np.full(h * w, mid, dtype=np.int64))
                out["y"].append(yy.ravel())
                out["x"].append(xx.ravel())
                out["r"].append(img[:, :, 0].ravel())
                out["g"].append(img[:, :, 1].ravel())
                out["b"].append(img[:, :, 2].ravel())
            yield pd.DataFrame(
                {k: np.concatenate(v) if v else np.array([], dtype=np.int64) for k, v in out.items()}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=_PIXELS_SCHEMA)


_CHANNEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_pixels", LongType()),
        # doubles: float32 cannot hold 4 decimals of a 0..255 mean exactly,
        # and the oracle compares rounded values
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("std_luma", DoubleType()),
    ]
)


def media_channel_stats(media: DataFrame) -> DataFrame:
    """Per-image channel means + population luma std from the REAL decode
    path (numpy over Arrow batches). Cross-checked against SQL aggregates
    over decode_pixels' exploded rows in the driver's oracle gate. Stats round to 4 decimals on BOTH sides
    so numpy-vs-DuckDB summation-order ulps can never flip the hash."""

    def _r4(x: float) -> float:
        # half-AWAY-from-zero at 4 decimals, matching SQL ROUND (python's
        # round is half-even: round(128.65625, 4) -> .6562 vs SQL .6563)
        import math

        return math.floor(x * 1e4 + 0.5) / 1e4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload).astype(np.float64)
                luma = img.mean(axis=2)
                rows.append(
                    (
                        mid,
                        img.shape[0] * img.shape[1],
                        _r4(float(img[:, :, 0].mean())),
                        _r4(float(img[:, :, 1].mean())),
                        _r4(float(img[:, :, 2].mean())),
                        _r4(float(luma.std())),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_pixels", "mean_r", "mean_g", "mean_b", "std_luma"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=_CHANNEL_STATS_SCHEMA
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Sample one frame per `every_ms` of video duration.

    STUB decode: frame payloads are deterministic digests of
    (payload, frame_idx); the row-explosion plumbing (one input row ->
    duration//every_ms output rows) is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError("video decoding not available; use fake=True")
                n_frames = max(int((dur or 0) // every_ms), 0)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(
                        hashlib.sha256((payload or b"") + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=_FRAME_SCHEMA
    )


def generate_media(spark, n_rows: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic media table matching MEDIA_SCHEMA. Image rows rotate
    through REAL P6 PPM / 24-bit BMP / RGB PNG payloads (all decodable by
    the pure-python paths); audio/video payloads stay opaque bytes behind
    the documented stub boundary."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    encoders = [encode_ppm, encode_bmp, encode_png]
    rows = []
    n_images = 0
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
            payload = encoders[n_images % 3](img)
            n_images += 1
        else:
            payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                int(rng.integers(500, 5000)) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
