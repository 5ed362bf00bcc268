"""Multimodal column operators: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is ONE BinaryType
cell per row; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions inside ``mapInPandas`` so pixels never leave
the executor and never become JVM objects. Partitioning is by row (any
repartition works — the ops are row-local), and batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size.

Image ops are REAL end-to-end for the engine's codecs (ppm/png/qdct —
imageops.py, pure numpy). Foreign formats (jpeg/webp) and the audio/video
ops raise/stub deterministically: the sandbox ships no Pillow/cv2/ffmpeg
(SURVEY.md §7.0), so the STUB path returns md5-seeded deterministic fakes
with the production schema and batch shape, clearly marked. Swapping in a
real decoder changes only the kernel body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import imageops

SUPPORTED_IMAGE_FMTS = {"ppm", "png", "qdct"}

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dec_w", T.IntegerType(), True),
        T.StructField("dec_h", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("std_px", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract: (image_id, bytes, fmt) → stats + phash.

    Real decode for engine codecs; unknown fmt → decode_ok=False row (the
    pipeline quarantines, never crashes the stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt not in SUPPORTED_IMAGE_FMTS or data is None:
                    rows.append(
                        dict(image_id=iid, dec_w=None, dec_h=None, mean_px=None,
                             std_px=None, phash=None, decode_ok=False)
                    )
                    continue
                arr = imageops.decode_image(bytes(data), fmt)
                rows.append(
                    dict(
                        image_id=iid,
                        dec_w=int(arr.shape[1]),
                        dec_h=int(arr.shape[0]),
                        mean_px=float(arr.mean()),
                        std_px=float(arr.std()),
                        phash=imageops.phash64(arr),
                        decode_ok=True,
                    )
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def _area_resize(arr: np.ndarray, size: int) -> np.ndarray:
    """Nearest/area resample to size×size (pure numpy, deterministic)."""
    h, w, _ = arr.shape
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return arr[ys][:, xs]


def resize_images(images: DataFrame, size: int = 32) -> DataFrame:
    """Re-encode every image as size×size ppm (training-shard normalizer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt not in SUPPORTED_IMAGE_FMTS or data is None:
                    rows.append(dict(image_id=iid, bytes=None, w=None, h=None, fmt="ppm"))
                    continue
                arr = _area_resize(imageops.decode_image(bytes(data), fmt), size)
                rows.append(
                    dict(image_id=iid, bytes=imageops.encode_ppm(arr), w=size, h=size, fmt="ppm")
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=RESIZED_SCHEMA)


# --------------------------------------------------------------------------
# audio / video — STUBS (no codec libs in sandbox; see module docstring)
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_phash", T.LongType(), True),
    ]
)


def _det64(*parts) -> int:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big", signed=False) >> 1


def audio_features(clips: DataFrame, strict: bool = False) -> DataFrame:
    """STUB decode: real audio parsing needs soundfile/ffmpeg (absent).

    strict=True raises NotImplementedError (production posture); default
    emits md5-deterministic fakes so the plumbing (schema, Arrow batching,
    partition behavior) is fully exercised in tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decode requires soundfile/ffmpeg — not in sandbox"
                )
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "duration_s": [(_det64("dur", c) % 30000) / 1000.0 for c in pdf["clip_id"]],
                    "rms": [(_det64("rms", c) % 1000) / 1000.0 for c in pdf["clip_id"]],
                    "sample_rate": [16000] * n,
                }
            )

    return clips.select("clip_id", "bytes").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def video_frame_sample(clips: DataFrame, every_n: int = 10, strict: bool = False) -> DataFrame:
    """STUB frame sampler: emits one row per sampled frame (explode shape).
    Real implementation would pyav/ffmpeg-decode inside the same batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video decode requires pyav/ffmpeg — not in sandbox")
            rows = []
            for c in pdf["clip_id"]:
                n_frames = 30 + _det64("nf", c) % 270
                for i in range(0, n_frames, every_n):
                    rows.append(
                        dict(clip_id=c, frame_idx=i, frame_phash=int(_det64("fp", c, i)))
                    )
            yield pd.DataFrame(rows, columns=["clip_id", "frame_idx", "frame_phash"])

    return clips.select("clip_id", "bytes").mapInPandas(run, schema=VIDEO_FRAMES_SCHEMA)
