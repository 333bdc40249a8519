"""Multimodal (image) column plumbing — decode / feature-extract /
resize / frame-ops over opaque binary columns via Arrow-batched
``mapInPandas`` (task brief: "make the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and tested").

Real image codecs (PIL/libjpeg/ffmpeg) are NOT installed in this
container; the *container format* here is the deterministic fake codec
from synth.py (FKIM header + raw/quantized pixels). Every operator is
written so a real codec drops into ``_decode_blob`` behind the same
(image_id, bytes) → ndarray contract; hooks that would need a real
library raise NotImplementedError with a clear message.

Scale notes: rows carry MB-scale payloads → the session caps Arrow
batches (session.py maxRecordsPerBatch); operators never collect, and
feature outputs are slim columns so downstream joins don't reshuffle
pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..synth import FMT_NAMES, MAGIC

HEADER_LEN = 9  # 4 magic + 1 fmt + 2 w + 2 h


def decode_blob(blob: bytes) -> tuple[str, int, int, np.ndarray]:
    """(fmt, w, h, pixels[h*w*3 uint8]) from a fake-codec blob."""
    if blob[:4] != bytes(MAGIC):
        raise NotImplementedError(
            "real image codecs (PNG/JPEG) are not available in this "
            "environment; only the FKIM fake codec is supported here — "
            "swap this branch for PIL/turbojpeg on a real cluster"
        )
    fmt = FMT_NAMES[blob[4]]
    w = int.from_bytes(blob[5:7], "big")
    h = int.from_bytes(blob[7:9], "big")
    px = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_LEN)
    return fmt, w, h, px


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("fmt", StringType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("pixel_sum", LongType(), False),
        StructField("pixel_min", IntegerType(), False),
        StructField("pixel_max", IntegerType(), False),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every blob, emit integer pixel statistics. The canonical
    decode-path verification: stats are exactly reproducible from
    phash by the closed-form pixel rule, so a SQL oracle can check the
    full encode→store→decode roundtrip without touching bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob in zip(pdf["image_id"], pdf["bytes"]):
                fmt, w, h, px = decode_blob(bytes(blob))
                out.append(
                    (image_id, fmt, w, h, int(px.astype(np.int64).sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODE_STATS_SCHEMA.fields])

    return images.select("image_id", "bytes").mapInPandas(run, DECODE_STATS_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
    ]
)


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded lossless. Vectorized per
    batch (numpy indexing, no per-pixel Python)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs = [], [], [], []
            for image_id, blob in zip(pdf["image_id"], pdf["bytes"]):
                fmt, w, h, px = decode_blob(bytes(blob))
                img = px.reshape(h, w, 3)
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = img[yi][:, xi]
                header = bytes(MAGIC) + bytes([0]) + out_w.to_bytes(2, "big") + out_h.to_bytes(2, "big")
                ids.append(image_id)
                blobs.append(header + small.tobytes())
                ws.append(out_w)
                hs.append(out_h)
            yield pd.DataFrame({"image_id": ids, "bytes": blobs, "w": ws, "h": hs})

    return images.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


EMBED_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("embedding", StringType(), True),  # placeholder, see below
    ]
)


def feature_embed(images: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Visual-embedding extraction — STUB. A real pipeline plugs a
    model server / ONNX runtime into the same mapInPandas shape as
    decode_stats. Raises until such a backend exists here."""
    raise NotImplementedError(
        "no vision model runtime in this environment; wire an ONNX/torch "
        "backend into the decode_stats mapInPandas pattern"
    )


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR between two uint8 pixel arrays (∞ → 999.0 sentinel)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return 999.0
    return 10.0 * np.log10(255.0 * 255.0 / mse)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
    ]
)


def frame_sample(videos: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video-shaped payloads (task brief): a 'video'
    here is a fake-codec blob whose pixel payload stacks F frames of
    w×h×3 (F = len(payload)/(w·h·3)); real containers (mp4/webm) would
    slot a demuxer into this exact mapInPandas shape. Emits one
    re-encoded lossless frame row per sampled index — a 1:N unnest in
    Arrow batches, never per-pixel Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, ws, hs = [], [], [], [], []
            for image_id, blob in zip(pdf["image_id"], pdf["bytes"]):
                fmt, w, h, px = decode_blob(bytes(blob))
                frame_sz = w * h * 3
                n_frames = max(len(px) // frame_sz, 1)
                header = bytes(MAGIC) + bytes([0]) + w.to_bytes(2, "big") + h.to_bytes(2, "big")
                for fi in range(0, n_frames, every_nth):
                    frame = px[fi * frame_sz:(fi + 1) * frame_sz]
                    ids.append(image_id)
                    idxs.append(fi)
                    blobs.append(header + frame.tobytes())
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {"image_id": ids, "frame_idx": idxs, "bytes": blobs, "w": ws, "h": hs}
            )

    return videos.select("image_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)
