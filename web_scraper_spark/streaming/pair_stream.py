"""Streaming image+caption pair curation: the image twin of
``curation_stream.curate_documents_stream`` — the north-rule data shape
(image_id, bytes, w, h, fmt, caption, phash) arriving as a continuous
file stream and flowing through the SAME kernels the batch
``pairs.pair_corpus_clean(min_sharp_milli=..., min_ent_milli=...)``
composite oracles:

1. geometry + caption-token filters — pure JVM codegen exprs with the
   batch constants (a pair passes streaming iff it passes batch);
2. decode-side quality gate — ``imageops.quality_struct_udf`` inline
   (stateless Arrow UDF: pixels are decoded ONLY for metadata-filter
   survivors, never buffered in state);
3. exact dedup — two chained dropDuplicates state stores: per ``phash``
   (byte-identical / re-encoded-identical image re-posts) then per
   caption fingerprint (boilerplate caption re-use). Keep-FIRST holds
   ACROSS micro-batches (state always beats later arrivals); within one
   micro-batch each key keeps one arbitrary representative (Spark
   dropDuplicates semantics). Optional ttl bounds both states via
   dropDuplicatesWithinWatermark.

What is deliberately NOT here, and why (same boundary as the docs
stage): NEAR-dup pruning (phash hamming 1..3, caption simhash) needs a
pairwise-within-corpus banded self-join with no bounded-state streaming
equivalent — run the batch keep-set periodically over the sink (the
incremental contract: pairs.neardup_image_ids over everything kept).

Scale shape: stages 1-2 are per-row (no exchange); the two dedup states
hash-partition on phash / caption fp — the same keys the batch op
shuffles on — and each holds one 8-byte key per distinct image/caption
ever kept (ttl bounds it for unbounded runs). Bytes are dropped BEFORE
the stateful exchange, so state and shuffle carry no pixel payloads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.imageops import quality_struct_udf
from ..functions.textanalysis import md5_60_expr, token_count_expr

# ingest schema: the input_hint pair table + event_time for ttl'd runs
PAIRS_STREAM_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, event_time double"
)

# ingest schema when an upstream inference stage attached embeddings —
# required iff min_alignment is set (the CLIP-score gate)
PAIRS_EMB_STREAM_SCHEMA = (
    PAIRS_STREAM_SCHEMA
    + ", image_emb array<double>, caption_emb array<double>"
)

# what the sink emits — batch pair_corpus_clean_quality's columns plus
# event_time, so periodic batch near-dup passes read it directly
CURATED_PAIRS_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "phash long, n_pixels long, aspect double, caption_tokens int, "
    "sharp_milli long, ent_milli long, event_time double"
)


def curate_pairs_stream(
    spark: SparkSession,
    pairs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    min_pixels: int = 1024,
    max_aspect: float = 4.0,
    min_caption_tokens: int = 4,
    min_sharp_milli: int = 2_000_000,
    min_ent_milli: int = 4_000,
    min_alignment: float | None = None,
    allowed_langs: tuple[str, ...] | None = None,
    max_banned_frac: float | None = None,
    ttl: float | None = None,
):
    """Start the pair-curation stream (availableNow trigger: drains
    everything currently in pairs_dir then stops; call again after
    dropping more files to continue against the same checkpoint — the
    keep-FIRST dedup contract lives in the checkpoint state).
    Returns the StreamingQuery. Sink rows: CURATED_PAIRS_SCHEMA, one per
    KEPT pair.

    With ``min_alignment`` set, the source must carry the
    PAIRS_EMB_STREAM_SCHEMA embedding columns and the CLIP-score gate
    (batch rule: round-6 cosine >= threshold, simsearch.pair_alignment)
    runs STATELESS between the metadata filters and the decode gate —
    codegen only, so it adds no state store and no exchange, and the
    embedding arrays are dropped at the gate so neither the dedup state
    nor the shuffle ever carries a vector payload.

    With ``allowed_langs`` and/or ``max_banned_frac`` set, the batch
    composite's caption-language gate (pairs.pair_corpus_clean 2a:
    marker-argmax lang id) and caption SAFETY gate (the blocklist
    whole-token rule) also run STATELESS after the metadata filters —
    same codegen rules, same drop decisions as the batch path, no state
    store, no exchange."""
    schema = (
        PAIRS_EMB_STREAM_SCHEMA if min_alignment is not None
        else PAIRS_STREAM_SCHEMA
    )
    src = spark.readStream.schema(schema).parquet(pairs_dir)
    scored = (
        src.withColumn("n_pixels", (F.col("w") * F.col("h")).cast("long"))
        .withColumn(
            "aspect", F.round(F.greatest("w", "h") / F.least("w", "h"), 6)
        )
        .withColumn(
            "caption_tokens", token_count_expr(F.col("caption")).cast("int")
        )
        .filter(
            (F.col("n_pixels") >= min_pixels)
            & (F.col("aspect") <= max_aspect)
            & (F.col("caption_tokens") >= min_caption_tokens)
        )
    )
    if max_banned_frac is not None:
        from ..functions.curation import blocklist_stats_expr

        scored = scored.filter(
            blocklist_stats_expr(F.col("caption"))["banned_frac"]
            <= F.lit(float(max_banned_frac))
        )
    if allowed_langs is not None:
        from ..functions.textanalysis import lang_id_expr

        scored = scored.filter(
            lang_id_expr(F.col("caption")).isin(
                *[F.lit(l) for l in allowed_langs]
            )
        )
    if min_alignment is not None:
        from ..functions.simsearch import cosine_expr

        a = F.round(
            cosine_expr(F.col("image_emb"), F.col("caption_emb")), 6
        )
        scored = (
            scored.withColumn("alignment", a)
            .filter(F.col("alignment") >= F.lit(float(min_alignment)))
            .drop("image_emb", "caption_emb", "alignment")
        )
    gated = (
        scored.withColumn("_q", quality_struct_udf(F.col("bytes"), F.col("fmt")))
        .filter(
            F.col("_q.decode_ok")
            & (F.col("_q.sharp_milli") >= F.lit(int(min_sharp_milli)))
            & (F.col("_q.ent_milli") >= F.lit(int(min_ent_milli)))
        )
        .withColumn("sharp_milli", F.col("_q.sharp_milli"))
        .withColumn("ent_milli", F.col("_q.ent_milli"))
        .drop("_q", "bytes")
        .withColumn("_cap_fp", md5_60_expr(F.col("caption")))
    )
    if ttl is None:
        kept = gated.dropDuplicates(["phash"]).dropDuplicates(["_cap_fp"])
    else:
        ms = f"{int(float(ttl) * 1000)} milliseconds"
        kept = (
            gated.withColumn("event_ts", F.timestamp_seconds(F.col("event_time")))
            .withWatermark("event_ts", ms)
            .dropDuplicatesWithinWatermark(["phash"])
            .dropDuplicatesWithinWatermark(["_cap_fp"])
            .drop("event_ts")
        )
    return (
        kept.select(
            "image_id", "w", "h", "fmt", "caption", "phash",
            "n_pixels", "aspect", "caption_tokens",
            "sharp_milli", "ent_milli", "event_time",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
