"""Multimodal column plumbing (training-data pipeline surface).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (ASSET schema).  The Spark-side plumbing — schema, partitioning,
Arrow batch shapes, UDF signatures — is real and tested.

Codecs: **uncompressed formats decode for real, pure-python** — BMP
(24/32-bit) and binary PPM (P6) images, PCM WAV audio — so decode /
resize / feature-extract run end-to-end on genuine bytes.  Compressed
codecs (JPEG/PNG/MP4) need PIL/ffmpeg, absent from this container: those
payloads raise ``NotImplementedError`` (or use the deterministic fake
decoder in tests).

At 100 TB these stages run as ``mapInPandas`` over binary Arrow batches —
payload bytes never surface into Python objects row-by-row, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory
(binary columns make batch *bytes*, not rows, the constraint; cap it with
``maxBytesPerBatch``-style sizing of the input files instead).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ASSET

_MAGIC = b"FAKEIMG1"


def synth_assets(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake asset table: payload = magic + packed (w, h, seed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w, h = 64 + (i * 13) % 960, 64 + (i * 7) % 540
                kind = ("image", "audio", "video")[i % 3]
                rows.append(
                    {
                        "asset_id": f"asset-{i:08d}",
                        "kind": kind,
                        "payload": _MAGIC + struct.pack("<IIQ", w, h, i),
                        "meta": {"w": str(w), "h": str(h)},
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, ASSET)


def encode_bmp(w: int, h: int, rgb) -> bytes:
    """Minimal 24-bit BMP writer (bottom-up rows, 4-byte row padding) —
    deterministic real payloads for tests/bench; ``rgb(x, y)`` → (r, g, b)."""
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        for x in range(w):
            r, g, b = rgb(x, y)
            body += bytes((b, g, r))
        body += b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + dib + bytes(body)


def encode_ppm(w: int, h: int, rgb) -> bytes:
    """Binary PPM (P6) writer."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body.extend(rgb(x, y))
    return f"P6\n{w} {h}\n255\n".encode() + bytes(body)


def synth_real_assets(
    spark: SparkSession, n: int, partitions: int = 8
) -> DataFrame:
    """Deterministic REAL-bytes asset table: alternating 24-bit BMP and
    binary-PPM payloads with an index-derived gradient pattern — the
    driver-visible input for ``mm_image_stats`` (decoded by the real
    codecs, not the fake header path)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w, h = 16 + (i * 5) % 48, 16 + (i * 3) % 32

                def rgb(x, y, i=i):
                    return (
                        (x * 7 + i) % 256,
                        (y * 11 + 2 * i) % 256,
                        (x + y + 3 * i) % 256,
                    )

                fmt = "bmp" if i % 2 == 0 else "ppm"
                payload = (
                    encode_bmp(w, h, rgb) if fmt == "bmp" else encode_ppm(w, h, rgb)
                )
                rows.append(
                    {
                        "asset_id": f"real-{i:08d}",
                        "kind": "image",
                        "payload": payload,
                        "meta": {"w": str(w), "h": str(h), "format": fmt},
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, ASSET)


def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    assert payload[:8] == _MAGIC, "not a fake payload"
    w, h, seed = struct.unpack("<IIQ", payload[8:24])
    rng = np.random.default_rng(seed)
    # 8x8 luma thumbnail stands in for decoded pixels
    return w, h, rng.random((8, 8), dtype=np.float32)


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24/32-bit BMP → (w, h, float32 luma HxW in [0,1])."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    flipped = h > 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3  # 4-byte row padding
    img = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if flipped:
        img = img[::-1]
    # BMP stores BGR(A)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    return w, h, luma.astype(np.float32)


def _decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6, maxval ≤ 255) → (w, h, float32 luma HxW)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> then a single whitespace byte
    tokens, i, tok = [], 2, b""
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment to EOL
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            if tok:
                tokens.append(int(tok))
                tok = b""
        else:
            tok += c
        i += 1
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    img = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )
    luma = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ) / maxval
    return w, h, luma.astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, np.ndarray]:
    """(width, height, float32 luma plane).  Real decode for uncompressed
    BMP / binary-PPM payloads (pure numpy); compressed formats raise."""
    if fake:
        return _decode_fake(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == _MAGIC:
        return _decode_fake(payload)
    raise NotImplementedError(
        "compressed image decode (JPEG/PNG) requires PIL/libjpeg — not "
        "available in this sandbox; BMP and binary PPM decode natively"
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PCM WAV → (sample_rate, n_channels, float32 mono samples in [-1,1]).
    Pure stdlib/numpy (RIFF chunk walk; 8/16/32-bit integer PCM)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (fmt={audio_fmt})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype="u1").astype(np.float32) - 128.0) / 128.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return rate, n_ch, x


def resize_luma(luma: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded luma plane (pure numpy)."""
    h, w = luma.shape
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return luma[ys][:, xs]


def image_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """(asset_id, width, height, mean_luma, feat array<float>[16]) via
    mapInPandas over binary Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, plane = decode_image(bytes(payload), fake=fake)
                thumb = plane if plane.shape == (8, 8) else resize_luma(plane, 8, 8)
                feat = thumb.mean(axis=0).tolist() + thumb.mean(axis=1).tolist()
                out.append(
                    {
                        "asset_id": asset_id,
                        "width": w,
                        "height": h,
                        "mean_luma": float(thumb.mean()),
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "width", "height", "mean_luma", "feat"]
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(
        fn,
        "asset_id string, width int, height int, mean_luma double, feat array<float>",
    )


def resize_plan(assets: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-metadata resize planning (JVM-side): target dims from meta,
    payload untouched — the shuffle-free part of a resize stage."""
    w = F.col("meta")["w"].cast("int")
    h = F.col("meta")["h"].cast("int")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return assets.select(
        "asset_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_w"),
        F.round(h * scale).cast("int").alias("target_h"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(assets: DataFrame, fps: float = 1.0, max_frames: int = 30) -> DataFrame:
    """Deterministic frame-sampling plan for video rows (timestamps only;
    actual extraction is the stubbed codec stage)."""
    dur = (F.xxhash64("asset_id") % 300 + 300) % 300 + 5  # fake duration 5-305s
    n_frames = F.least(F.floor(dur * F.lit(fps)), F.lit(max_frames)).cast("int")
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            dur.cast("double").alias("duration_sec"),
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.round(i / F.lit(fps), 3),
            ).alias("frame_ts"),
        )
    )


def audio_features(assets: DataFrame) -> DataFrame:
    """(asset_id, sample_rate, n_channels, duration_sec, rms) from real PCM
    WAV payloads — mapInPandas over binary Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, n_ch, x = decode_wav(bytes(payload))
                out.append(
                    {
                        "asset_id": asset_id,
                        "sample_rate": rate,
                        "n_channels": n_ch,
                        "duration_sec": float(len(x)) / rate,
                        "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "sample_rate", "n_channels", "duration_sec", "rms",
                ],
            )

    return assets.filter(F.col("kind") == "audio").mapInPandas(
        fn,
        "asset_id string, sample_rate int, n_channels int, "
        "duration_sec double, rms double",
    )


def resize_images(assets: DataFrame, max_side: int = 512) -> DataFrame:
    """Decode + nearest-neighbor resize of real (BMP/PPM) payloads:
    (asset_id, width, height, target_w, target_h, resized_mean)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, plane = decode_image(bytes(payload))
                scale = min(1.0, max_side / max(w, h))
                tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                resized = (
                    plane
                    if (tw, th) == (w, h)
                    else resize_luma(plane, tw, th)
                )
                out.append(
                    {
                        "asset_id": asset_id,
                        "width": w,
                        "height": h,
                        "target_w": tw,
                        "target_h": th,
                        "resized_mean": float(resized.mean()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "width", "height", "target_w", "target_h",
                    "resized_mean",
                ],
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(
        fn,
        "asset_id string, width int, height int, target_w int, "
        "target_h int, resized_mean double",
    )
