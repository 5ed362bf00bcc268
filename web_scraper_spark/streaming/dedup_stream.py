"""Streaming document keep-set: continuous-ingest exact dedup.

The training-data twin of the streaming crawl's URL-seen state
(crawl_stream.py) and the batch corpus dedup (dedupops.exact_dedup /
dedup_keep_ids): documents arrive as a file stream, the 60-bit content
fingerprint (the SAME md5_60 kernel the batch engine oracles) keys a
dropDuplicates state store, and only each fingerprint's FIRST arrival
reaches the sink. State is hash-partitioned by fingerprint across
executors and persisted in the checkpoint, so:

- exactly-once per distinct text across micro-batches AND restarts
  (the file sink's _spark_metadata commit log de-dupes replayed batches);
- a killed run resumed against the same checkpoint never re-emits a text
  it already kept — the keep-set survives, same contract as the crawl
  stream's url_sha1 state.

Keep-FIRST here is arrival-order, the only meaningful "first" in
continuous ingest; the batch op keeps min-id because a batch has no
arrival order (both mirror the reference's ON CONFLICT keep-first,
data_store.c:104-109). Within one micro-batch arrival order is not
defined across partitions, so the kept doc_id for texts duplicated
INSIDE a single batch is whichever partition's row the state store
admits — the kept TEXT set is deterministic, the representative id is
not (documented, matching dropDuplicates semantics).

State-size note (same honest trade-off as crawl_stream): ttl=None keeps
one state row per distinct fingerprint forever — the exact batch
semantics, scaled out but never shrinking. Pass ttl (seconds) to bound
state via a watermark + dropDuplicatesWithinWatermark: a text not seen
for ttl may be kept again (sliding-window dedup, the standard bounded
contract for infinite corpora).

Watermark fine print (pinned by the TTL test): the initial watermark is
epoch 0, so with ttl set any row whose event_time <= the current
watermark is discarded as LATE before it reaches the state — feed real
event times, not 0.0. A duplicate does NOT extend its key's expiry
(first event_time + ttl), and eviction takes effect the batch AFTER the
watermark passes expiry.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.textanalysis import md5_60_expr

DOCS_STREAM_SCHEMA = "doc_id long, text string, event_time double"


def dedup_documents_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    ttl: float | None = None,
):
    """Start the keep-set query (availableNow trigger: drains everything
    currently in docs_dir then stops; call again after dropping more files
    to continue against the same checkpoint). Returns the StreamingQuery.

    Sink rows: (doc_id, text, fp, event_time) — one per KEPT document.
    """
    src = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(docs_dir)
    fp = src.withColumn("fp", md5_60_expr(F.col("text")))
    if ttl is None:
        kept = fp.dropDuplicates(["fp"])
    else:
        kept = (
            fp.withColumn("event_ts", F.timestamp_seconds(F.col("event_time")))
            .withWatermark("event_ts", f"{int(float(ttl) * 1000)} milliseconds")  # ms: int(ttl) would truncate 0.5 to a 0s watermark
            .dropDuplicatesWithinWatermark(["fp"])
            .drop("event_ts")
        )
    return (
        kept.select("doc_id", "text", "fp", "event_time")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
