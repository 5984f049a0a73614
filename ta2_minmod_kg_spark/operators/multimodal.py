"""Multimodal column plumbing (training-data pipeline surface).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (ASSET schema).  The Spark-side plumbing — schema, partitioning,
Arrow batch shapes, UDF signatures — is real and tested; the actual
codec work is stubbed: the decode libraries (PIL/ffmpeg/librosa) are not
in this container, so ``decode_image`` raises ``NotImplementedError``
unless the deterministic fake decoder is requested (it parses our
synthetic payload header instead of real image bytes).

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


def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    assert payload[:8] == _MAGIC, "not a fake payload"
    w, h, seed = struct.unpack("<IIQ", payload[8:24])
    rng = np.random.default_rng(seed)
    # 8x8 luma thumbnail stands in for decoded pixels
    return w, h, rng.random((8, 8), dtype=np.float32)


def decode_image(payload: bytes, fake: bool = False):
    """Real decode is stubbed: PIL/libjpeg are not in this container."""
    if fake:
        return _decode_fake(payload)
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available in this sandbox; "
        "pass fake=True for the deterministic test decoder"
    )


def image_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """(asset_id, width, height, mean_luma, feat array<float>[16]) via
    mapInPandas over binary Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, thumb = decode_image(bytes(payload), fake=fake)
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
