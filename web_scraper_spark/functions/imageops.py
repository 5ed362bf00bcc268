"""Image payload operators: pure-numpy codecs, perceptual hash, PSNR.

The graft's authoritative input table is image+caption pairs
(BASELINE.json input_hint: image_id, bytes, w, h, fmt, caption, phash).
The reference's image surface is the Postgres images sink
(data_store.c:121-148: page_url, src, alt=caption, width, height); this
module supplies the decode / hash / invariant operators the Spark engine
runs over those payloads.

No Pillow/cv2 in the sandbox, so codecs are numpy+zlib:

- ``ppm``  — binary P6, lossless.
- ``png``  — real PNG subset: 8-bit RGB truecolor, filter types 0-2 on
  encode (None), full 0-4 unfilter on decode, zlib IDAT, CRC-checked.
- ``qdct`` — toy lossy codec: per-channel 8x8 orthonormal DCT-II, uniform
  quantization step q (default 4 → PSNR ≈ 46 dB, comfortably over the
  40 dB contract), int16 coefficients, zlib.

- ``phash64`` — 64-bit DCT perceptual hash: grayscale → 32x32 area
  resize → 2D DCT-II → top-left 8x8 block → bit i = coeff_i > median
  (median excludes the DC term), packed row-major MSB-first into a
  signed int64 (two's complement), matching the int64 `phash` column.

All Spark entry points are Arrow-vectorized (mapInPandas / pandas_udf);
the per-image numpy work happens inside the Arrow batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ PPM (P6)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # header: P6\n<w> <h>\n255\n
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    raw = parts[3][: w * h * 3]
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    rows = arr.astype(np.uint8)
    # filter type 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rows.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a png")
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError("png crc mismatch")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 2 or interlace != 0:
                raise ValueError("unsupported png variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3 + 1
    raw = raw.reshape(h, stride)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, w * 3), dtype=np.int32)
    bpp = 3
    for y in range(h):
        f, cur = filters[y], rows[y].copy()
        prior = out[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub
            for x in range(w * 3):
                cur[x] = (cur[x] + (cur[x - bpp] if x >= bpp else 0)) & 0xFF
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(w * 3):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prior[x]) // 2) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            for x in range(w * 3):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad png filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------ QDCT

_DCT8 = None
_DCT32 = None


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = np.cos((2 * j + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def _dct8() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        _DCT8 = _dct_matrix(8)
    return _DCT8


def _dct32() -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        _DCT32 = _dct_matrix(32)
    return _DCT32


QDCT_MAGIC = b"QDCT"
QDCT_Q_DEFAULT = 4


def encode_qdct(arr: np.ndarray, q: int = QDCT_Q_DEFAULT) -> bytes:
    h, w, _ = arr.shape
    if h % 8 or w % 8:
        raise ValueError("qdct requires dims divisible by 8")
    d = _dct8()
    x = arr.astype(np.float64) - 128.0
    blocks = x.reshape(h // 8, 8, w // 8, 8, 3)
    coeffs = np.einsum("ai,hiwjc,bj->hawbc", d, blocks, d)
    qc = np.round(coeffs / q).astype(np.int16)
    payload = zlib.compress(qc.tobytes(), 6)
    return QDCT_MAGIC + struct.pack(">HHB", w, h, q) + payload


def decode_qdct(data: bytes) -> np.ndarray:
    if not data.startswith(QDCT_MAGIC):
        raise ValueError("not qdct")
    w, h, q = struct.unpack(">HHB", data[4:9])
    qc = np.frombuffer(zlib.decompress(data[9:]), dtype=np.int16).reshape(
        h // 8, 8, w // 8, 8, 3
    ).astype(np.float64)
    d = _dct8()
    blocks = np.einsum("ai,hawbc,bj->hiwjc", d, qc * q, d)
    x = blocks.reshape(h, w, 3) + 128.0
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ dispatch

LOSSLESS_FMTS = {"ppm", "png"}
LOSSY_FMTS = {"qdct"}


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "png":
        return encode_png(arr)
    if fmt == "qdct":
        return encode_qdct(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "qdct":
        return decode_qdct(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ------------------------------------------------------------------ phash


def _resize32(gray: np.ndarray) -> np.ndarray:
    h, w = gray.shape
    out = gray
    if h > 32:
        out = out.reshape(32, h // 32, w).mean(axis=1) if h % 32 == 0 else out[
            (np.arange(32) * h // 32)
        ]
    elif h < 32:
        out = np.repeat(out, 32 // h, axis=0) if 32 % h == 0 else out[
            (np.arange(32) * h // 32)
        ]
    h2, w2 = out.shape
    if w > 32:
        out = out.reshape(h2, 32, w // 32).mean(axis=2) if w % 32 == 0 else out[
            :, (np.arange(32) * w // 32)
        ]
    elif w < 32:
        out = np.repeat(out, 32 // w, axis=1) if 32 % w == 0 else out[
            :, (np.arange(32) * w // 32)
        ]
    return out


def phash64(arr: np.ndarray) -> int:
    gray = arr.astype(np.float64).mean(axis=2)
    g32 = _resize32(gray)
    d = _dct32()
    coeffs = d @ g32 @ d.T
    block = coeffs[:8, :8].copy()
    flat = block.flatten()
    med = np.median(flat[1:])  # exclude DC
    bits = (flat > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(np.int64(val))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ------------------------------------------------------------------ Spark UDFs


@F.pandas_udf(T.LongType())
def phash_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
    out = [
        phash64(decode_image(d, f)) if d is not None else None
        for d, f in zip(data, fmt)
    ]
    return pd.Series(out, dtype="Int64")


_DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


@F.pandas_udf(_DECODE_STATS_SCHEMA)
def decode_stats_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    ws, hs, ms = [], [], []
    for d, f in zip(data, fmt):
        if d is None:
            ws.append(None), hs.append(None), ms.append(None)
            continue
        arr = decode_image(d, f)
        hs.append(arr.shape[0])
        ws.append(arr.shape[1])
        ms.append(float(arr.mean()))
    return pd.DataFrame({"dec_w": ws, "dec_h": hs, "mean_px": pd.Series(ms, dtype="float64")})


def phash_band_exprs(phash_col, n_bands: int = 4):
    """Split a 64-bit phash into n_bands equal bit-bands (native exprs).

    LSH guarantee: two hashes within hamming distance t < n_bands share at
    least one identical band, so the band equi-join finds every pair with
    distance <= n_bands - 1 (t<=3 for 4 bands) without an O(n^2) cross join.
    """
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [
        F.shiftrightunsigned(phash_col, i * width).bitwiseAND(F.lit(mask)).alias(f"band{i}")
        for i in range(n_bands)
    ]


def hamming_expr(a, b):
    """bit_count(a XOR b) — whole-stage-codegen'd JVM expression."""
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------------------------
# batch-assembly bucketing — aspect-ratio + resolution classes
# --------------------------------------------------------------------------
#
# Image training batches must be shape-homogeneous: a loader groups images
# into (aspect class, resolution class) buckets and pads/crops inside the
# bucket only. Both classifications below are pure integer comparisons
# (cross-multiplied ratios, squared side thresholds) so Spark and any SQL
# oracle agree bit-for-bit — no float division anywhere.

ASPECT_WIDE_NUM, ASPECT_WIDE_DEN = 4, 3  # w/h > 4/3 → wide; < 3/4 → tall


def aspect_bucket_expr(w, h):
    """'wide' (w/h > 4/3), 'tall' (w/h < 3/4), else 'square' — stated as
    integer cross-products."""
    return (
        F.when(w * ASPECT_WIDE_DEN > h * ASPECT_WIDE_NUM, F.lit("wide"))
        .when(w * ASPECT_WIDE_NUM < h * ASPECT_WIDE_DEN, F.lit("tall"))
        .otherwise(F.lit("square"))
    )


def aspect_bucket_sql(w: str, h: str) -> str:
    return (
        f"CASE WHEN {w} * {ASPECT_WIDE_DEN} > {h} * {ASPECT_WIDE_NUM} THEN 'wide' "
        f"WHEN {w} * {ASPECT_WIDE_NUM} < {h} * {ASPECT_WIDE_DEN} THEN 'tall' "
        f"ELSE 'square' END"
    )


def area_bucket_expr(w, h, sides=(16, 32, 64, 128)):
    """Largest ladder side s with w*h >= s*s (the resolution class the
    image can fill); images below the smallest rung take it."""
    px = w * h
    expr = F.lit(int(sides[0]))
    for s in sides[1:]:
        expr = F.when(px >= int(s) * int(s), F.lit(int(s))).otherwise(expr)
    return expr


def area_bucket_sql(w: str, h: str, sides=(16, 32, 64, 128)) -> str:
    branches = " ".join(
        f"WHEN {w} * {h} >= {int(s) * int(s)} THEN {int(s)}"
        for s in reversed(sides[1:])
    )
    return f"CASE {branches} ELSE {int(sides[0])} END"


def bucket_target_dims_expr(w, h, sides=(16, 32, 64, 128)):
    """Canonical training shape of an image's (aspect, resolution) batch
    bucket — the dims a loader pads/crops/resizes to so every batch is
    shape-homogeneous: square s → (s, s), wide → (2s, s), tall → (s, 2s)
    with s the area-bucket side. Pure integer CASE exprs (codegen);
    returns (target_w, target_h) Columns."""
    s = area_bucket_expr(w, h, sides)
    ar = aspect_bucket_expr(w, h)
    tw = F.when(ar == "wide", s * 2).otherwise(s).cast("int")
    th = F.when(ar == "tall", s * 2).otherwise(s).cast("int")
    return tw, th


def bucket_target_dims(w: int, h: int, sides=(16, 32, 64, 128)) -> tuple[int, int]:
    """Sequential twin of bucket_target_dims_expr (oracle derivations)."""
    px = w * h
    s = sides[0]
    for side in sides[1:]:
        if px >= side * side:
            s = side
    if w * ASPECT_WIDE_DEN > h * ASPECT_WIDE_NUM:
        return 2 * s, s
    if w * ASPECT_WIDE_NUM < h * ASPECT_WIDE_DEN:
        return s, 2 * s
    return s, s


# ------------------------------------------------------------- quality stats


def quality_stats(arr: np.ndarray) -> dict:
    """Perceptual-quality statistics of one decoded image (pure numpy,
    deterministic): the per-row kernel behind the blur/flat filter every
    image-training pipeline runs before batch assembly.

    - sharp_milli: variance of the 4-neighbor Laplacian over the grayscale
      interior ×1000 — the classic blur detector (lossy qdct decode
      measurably lowers it: quantization strips high-frequency energy).
    - ent_milli: 256-bin grayscale histogram entropy in millibits — flat /
      near-constant images (failed renders, tracking pixels) land near 0.
    - mean_milli / std_milli: brightness and global contrast ×1000.

    All outputs are integers (round-half-even on float64), so the
    distributed run and the sequential oracle derivation agree exactly.
    """
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h >= 3 and w >= 3:
        core = gray[1:-1, 1:-1]
        lap = (
            4.0 * core
            - gray[:-2, 1:-1]
            - gray[2:, 1:-1]
            - gray[1:-1, :-2]
            - gray[1:-1, 2:]
        )
        sharp = float(lap.var())
    else:
        sharp = 0.0  # no interior: too small to measure blur on
    hist = np.bincount(
        np.clip(gray, 0.0, 255.0).astype(np.int64).ravel(), minlength=256
    )
    p = hist[hist > 0] / float(gray.size)
    ent = float(-(p * np.log2(p)).sum())
    return {
        "sharp_milli": int(round(sharp * 1000.0)),
        "ent_milli": int(round(ent * 1000.0)),
        "mean_milli": int(round(float(gray.mean()) * 1000.0)),
        "std_milli": int(round(float(gray.std()) * 1000.0)),
    }


_QUALITY_STRUCT = T.StructType(
    [
        T.StructField("sharp_milli", T.LongType()),
        T.StructField("ent_milli", T.LongType()),
        T.StructField("mean_milli", T.LongType()),
        T.StructField("std_milli", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

_QUALITY_FMTS = {"ppm", "png", "qdct"}  # = multimodal.SUPPORTED_IMAGE_FMTS


@F.pandas_udf(_QUALITY_STRUCT)
def quality_struct_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """quality_stats as a SCALAR column (struct): lets a composite filter
    on decode-side quality INLINE in an existing row stream — no extra
    mapInPandas pass, no join, no shuffle. Undecodable rows → NULL stats +
    decode_ok=False (quarantine, never a crash)."""
    out = {k: [] for k in ("sharp_milli", "ent_milli", "mean_milli", "std_milli")}
    ok = []
    for d, f in zip(data, fmt):
        if f not in _QUALITY_FMTS or d is None:
            for k in out:
                out[k].append(None)
            ok.append(False)
            continue
        s = quality_stats(decode_image(bytes(d), f))
        for k in out:
            out[k].append(s[k])
        ok.append(True)
    return pd.DataFrame(
        {**{k: pd.Series(v, dtype="Int64") for k, v in out.items()},
         "decode_ok": ok}
    )
