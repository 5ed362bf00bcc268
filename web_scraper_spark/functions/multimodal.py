"""Multimodal column operators: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is ONE BinaryType
cell per row; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions inside ``mapInPandas`` so pixels never leave
the executor and never become JVM objects. Partitioning is by row (any
repartition works — the ops are row-local), and batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size.

Image ops are REAL end-to-end for the engine's codecs (ppm/png/qdct —
imageops.py, pure numpy). Audio is REAL for PCM WAV (stdlib `wave` —
decode_wav) and video is REAL for the engine's QV01 container of qdct
frames (decode_qvid_frames). Only FOREIGN formats (jpeg/webp, mp3/ogg,
mp4/webm) stub deterministically: the sandbox ships no Pillow/ffmpeg/pyav
(SURVEY.md §7.0), so that path returns md5-seeded deterministic fakes with
the production schema and batch shape, clearly marked. Swapping in a real
decoder changes only the kernel body.
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


IMAGE_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("sharp_milli", T.LongType(), True),
        T.StructField("ent_milli", T.LongType(), True),
        T.StructField("mean_milli", T.LongType(), True),
        T.StructField("std_milli", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_quality(
    images: DataFrame,
    min_sharp_milli: int = 2_000_000,
    min_ent_milli: int = 4_000,
) -> DataFrame:
    """Blur/flat image filter: (image_id, bytes, fmt) → perceptual-quality
    integers (imageops.quality_stats) + a ``keep`` verdict — the decode-side
    quality gate a pair-training pipeline runs before batch assembly
    (geometry filters catch tiny images; THIS catches blurry and
    near-constant ones that geometry cannot see).

    One mapInPandas decode stage (pixels never leave the executor, batch
    memory bounded by Arrow maxRecordsPerBatch), then ``keep`` is a plain
    codegen boolean over the integer stats — thresholds are tunable without
    touching the Arrow stage, and a downstream filter on ``keep`` prunes
    BEFORE any shuffle. Undecodable rows quarantine as decode_ok=False /
    keep=False, never crash the stage. Row-local ⇒ scales linearly at
    10^10 rows under any partitioning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt not in SUPPORTED_IMAGE_FMTS or data is None:
                    rows.append(
                        dict(image_id=iid, sharp_milli=None, ent_milli=None,
                             mean_milli=None, std_milli=None, decode_ok=False)
                    )
                    continue
                s = imageops.quality_stats(imageops.decode_image(bytes(data), fmt))
                rows.append(dict(image_id=iid, decode_ok=True, **s))
            yield pd.DataFrame(rows)

    stats = images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=IMAGE_QUALITY_SCHEMA
    )
    return stats.withColumn(
        "keep",
        F.col("decode_ok")
        & (F.col("sharp_milli") >= F.lit(int(min_sharp_milli)))
        & (F.col("ent_milli") >= F.lit(int(min_ent_milli))),
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


def _area_resize_wh(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest/area resample to th×tw (pure numpy, deterministic)."""
    h, w, _ = arr.shape
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return arr[ys][:, xs]


def _area_resize(arr: np.ndarray, size: int) -> np.ndarray:
    """Nearest/area resample to size×size (pure numpy, deterministic)."""
    return _area_resize_wh(arr, size, size)


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


BUCKET_RESIZED_SCHEMA = T.StructType(
    RESIZED_SCHEMA.fields + [T.StructField("batch_key", T.StringType(), False)]
)


def resize_to_buckets(images: DataFrame, sides=(16, 32, 64, 128)) -> DataFrame:
    """Batch-assembly normalizer: resize every image to the canonical
    shape of ITS (aspect, resolution) batch bucket
    (imageops.bucket_target_dims_expr — square s → s×s, wide → 2s×s,
    tall → s×2s), re-encoded ppm, with the bucket's batch_key attached
    so a loader groups shape-homogeneous batches directly.

    The targets are integer codegen exprs computed from the METADATA
    columns before any pixel work; the decode → per-row-target resample
    → encode runs as ONE mapInPandas stage (one Arrow transfer, one
    decode per image). Row-local ⇒ linear at 10^10 rows, no exchange."""

    tw, th = imageops.bucket_target_dims_expr(F.col("w"), F.col("h"), sides)
    ar = imageops.aspect_bucket_expr(F.col("w"), F.col("h"))
    src = images.select(
        "image_id", "bytes", "fmt",
        tw.alias("_tw"), th.alias("_th"),
        F.concat_ws(
            "_", ar, F.least(tw, th).cast("string")
        ).alias("batch_key"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt, t_w, t_h, bk in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"],
                pdf["_tw"], pdf["_th"], pdf["batch_key"],
            ):
                if fmt not in SUPPORTED_IMAGE_FMTS or data is None:
                    rows.append(
                        dict(image_id=iid, bytes=None, w=None, h=None,
                             fmt="ppm", batch_key=bk)
                    )
                    continue
                arr = _area_resize_wh(
                    imageops.decode_image(bytes(data), fmt), int(t_w), int(t_h)
                )
                rows.append(
                    dict(image_id=iid, bytes=imageops.encode_ppm(arr),
                         w=int(t_w), h=int(t_h), fmt="ppm", batch_key=bk)
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=BUCKET_RESIZED_SCHEMA)


AUGMENTED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("flip", T.BooleanType(), False),
        T.StructField("crop", T.BooleanType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def augment_images(images: DataFrame, epoch: int = 1, size: int = 32) -> DataFrame:
    """Deterministic per-epoch training augmentation: horizontal flip and
    1/8-margin center crop, each switched on by a bit of
    md5_60(image_id ':' epoch), then area-resample to size×size ppm.
    Seeded augmentation is the reproducibility contract a training run
    needs — re-running any epoch (or any single shard of it) regenerates
    byte-identical pixels, on any partitioning, with no RNG state to
    checkpoint.

    The flip/crop DECISIONS are pure metadata codegen (the same portable
    md5-60 rule the sampling family uses — textanalysis.md5_60_expr), so
    an auditor can replay them in SQL without touching pixels; the pixel
    chain (decode → flip → crop → resample → encode) is ONE mapInPandas
    stage: one Arrow transfer and one decode per image, row-local ⇒
    linear at 10^10 rows, no exchange. Crop removes floor(dim/8) per
    side from the ORIGINAL frame (a no-op below 8px); flip reverses
    columns before the crop so the two compose in a fixed documented
    order.
    """
    from web_scraper_spark.functions.textanalysis import md5_60_expr

    hsh = md5_60_expr(
        F.concat_ws(":", F.col("image_id"), F.lit(int(epoch)).cast("string"))
    )
    src = images.select(
        "image_id", "bytes", "fmt",
        (F.pmod(hsh, F.lit(2)) == 1).alias("flip"),
        (F.pmod(F.shiftright(hsh, 1), F.lit(2)) == 1).alias("crop"),
    )
    ep = int(epoch)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt, fl, cr in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["flip"], pdf["crop"]
            ):
                if fmt not in SUPPORTED_IMAGE_FMTS or data is None:
                    rows.append(
                        dict(image_id=iid, epoch=ep, flip=bool(fl), crop=bool(cr),
                             bytes=None, w=None, h=None, fmt="ppm")
                    )
                    continue
                arr = imageops.decode_image(bytes(data), fmt)
                if fl:
                    arr = arr[:, ::-1, :]
                if cr:
                    hh, ww, _ = arr.shape
                    mh, mw = hh // 8, ww // 8
                    arr = arr[mh:hh - mh, mw:ww - mw]
                arr = _area_resize(np.ascontiguousarray(arr), size)
                rows.append(
                    dict(image_id=iid, epoch=ep, flip=bool(fl), crop=bool(cr),
                         bytes=imageops.encode_ppm(arr), w=size, h=size, fmt="ppm")
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=AUGMENTED_SCHEMA)


# --------------------------------------------------------------------------
# audio — REAL for PCM WAV (stdlib `wave`, zero external deps); other
# formats remain a disclosed deterministic stub (no mp3/ogg codecs here)
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def _wav_pcm(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float64 sample array, sample_rate) via stdlib `wave`.
    Raises on non-RIFF / non-16-bit payloads — callers route those to the
    stub or to strict failure."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        if width != 2:
            raise ValueError(f"only 16-bit PCM supported, got width={width}")
        pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.float64)
    return pcm, rate


def decode_wav(data: bytes) -> dict:
    """PCM WAV → {duration_s, rms, sample_rate} from the REAL decoded
    frames (stdlib `wave` + numpy; 16-bit mono/stereo PCM). rms is over
    samples normalized to [-1, 1), rounded like every oracle-compared
    float."""
    pcm, rate = _wav_pcm(data)
    rms = float(np.sqrt(np.mean((pcm / 32768.0) ** 2))) if len(pcm) else 0.0
    return {
        "duration_s": round(len(pcm) / rate, 6),
        "rms": round(rms, 6),
        "sample_rate": int(rate),
    }


def wav_fingerprint(data: bytes, n_windows: int = 64) -> int:
    """Gain-invariant envelope-shape fingerprint of a PCM WAV clip: split
    the decoded samples into n_windows equal windows (zero-padded tail),
    take per-window mean |amplitude|, and set bit i when window i is
    louder than window i+1 — 63 comparison bits packed LSB-first into a
    non-negative int64 that rides the SAME LSH band join as the image
    phash (imageops.phash_band_exprs / hamming_expr).

    Hamming distance counts envelope-shape disagreements: a splice edit
    touching k contiguous windows flips at most k+1 bits, while
    independent clips disagree on ~half the comparisons. Gain-invariant by
    construction (both sides of each comparison scale together); NOT
    robust to re-encoding through a lossy codec — that needs a
    codec-domain fingerprint and codecs aren't in this sandbox."""
    pcm, _ = _wav_pcm(data)
    win = (len(pcm) + n_windows - 1) // n_windows
    pad = np.zeros(win * n_windows, dtype=np.float64)
    pad[: len(pcm)] = np.abs(pcm)
    env = pad.reshape(n_windows, win).mean(axis=1)
    fp = 0
    for i in range(n_windows - 1):
        if env[i] > env[i + 1]:
            fp |= 1 << i
    return fp


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("afp", T.LongType(), True),
    ]
)


def audio_fingerprints(clips: DataFrame, strict: bool = False) -> DataFrame:
    """(clip_id, bytes) → (clip_id, afp): the wav_fingerprint envelope hash
    per clip, Arrow-batched. REAL decode for PCM WAV; non-WAV payloads
    raise under strict=True and fall back to the DISCLOSED deterministic
    fake otherwise (same routing as audio_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, data in zip(pdf["clip_id"], pdf["bytes"]):
                if data is not None and bytes(data[:4]) == b"RIFF":
                    rows.append((cid, wav_fingerprint(bytes(data))))
                elif strict:
                    raise NotImplementedError(
                        "non-WAV audio decode requires soundfile/ffmpeg — "
                        "not in sandbox"
                    )
                else:
                    rows.append((cid, _det64("afp", cid)))
            yield pd.DataFrame(rows, columns=["clip_id", "afp"])

    return clips.select("clip_id", "bytes").mapInPandas(run, schema=AUDIO_FP_SCHEMA)

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
    """Audio feature extraction: (clip_id, bytes) → duration/rms/rate.

    REAL decode for PCM WAV payloads (RIFF magic → stdlib `wave`, see
    decode_wav) — frames actually parsed, features computed from samples.
    Non-WAV payloads (mp3/ogg — codecs absent in this sandbox): strict=True
    raises NotImplementedError (production posture); default emits the
    DISCLOSED md5-deterministic fake so the Arrow plumbing stays
    exercised end to end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, data in zip(pdf["clip_id"], pdf["bytes"]):
                if data is not None and bytes(data[:4]) == b"RIFF":
                    d = decode_wav(bytes(data))
                    rows.append(dict(clip_id=cid, **d))
                elif strict:
                    raise NotImplementedError(
                        "non-WAV audio decode requires soundfile/ffmpeg — "
                        "not in sandbox"
                    )
                else:
                    rows.append(
                        dict(
                            clip_id=cid,
                            duration_s=(_det64("dur", cid) % 30000) / 1000.0,
                            rms=(_det64("rms", cid) % 1000) / 1000.0,
                            sample_rate=16000,
                        )
                    )
            yield pd.DataFrame(rows, columns=["clip_id", "duration_s", "rms", "sample_rate"])

    return clips.select("clip_id", "bytes").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_MAGIC = b"QV01"


def decode_qvid_frames(data: bytes, every_n: int = 1):
    """Iterate (frame_idx, decoded HxWx3 uint8 array) of every every_n-th
    frame of a QV01 container (magic + u32 n_frames + u32 fps + per frame
    u32 len + qdct bytes — the engine's own deterministic codec,
    imageops.decode_image). Frames NOT sampled are seeked over without
    decoding — the length prefix exists exactly so a sampler pays I/O, not
    DCT, for skipped frames."""
    import struct

    if bytes(data[:4]) != VIDEO_MAGIC:
        raise ValueError("not a QV01 container")
    n_frames, _fps = struct.unpack_from("<II", data, 4)
    off = 12
    for idx in range(n_frames):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if idx % every_n == 0:
            yield idx, imageops.decode_image(bytes(data[off : off + ln]), "qdct")
        off += ln


def video_frame_sample(clips: DataFrame, every_n: int = 10, strict: bool = False) -> DataFrame:
    """Frame sampler: one row per sampled frame (explode shape), with the
    frame's REAL phash for QV01 payloads — container parsed and qdct
    frames decoded inside the Arrow batches (decode_qvid_frames), exactly
    where a pyav/ffmpeg kernel would run for foreign containers. Non-QV01
    payloads: strict=True raises (production posture); default keeps the
    DISCLOSED md5-deterministic fake so the plumbing stays exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for c, data in zip(pdf["clip_id"], pdf["bytes"]):
                if data is not None and bytes(data[:4]) == VIDEO_MAGIC:
                    for idx, arr in decode_qvid_frames(bytes(data), every_n):
                        rows.append(
                            dict(
                                clip_id=c,
                                frame_idx=idx,
                                frame_phash=imageops.phash64(arr),
                            )
                        )
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-QV01 video decode requires pyav/ffmpeg — not in sandbox"
                    )
                n_frames = 30 + _det64("nf", c) % 270
                for i in range(0, n_frames, every_n):
                    rows.append(
                        dict(clip_id=c, frame_idx=i, frame_phash=int(_det64("fp", c, i)))
                    )
            yield pd.DataFrame(rows, columns=["clip_id", "frame_idx", "frame_phash"])

    return clips.select("clip_id", "bytes").mapInPandas(run, schema=VIDEO_FRAMES_SCHEMA)
