"""End-to-end Structured Streaming crawl: continuous-ingest shape of the
generation loop (SURVEY.md §2.7), exercising the streaming analogs of the
batch operators plus checkpointed state recovery:

    frontier file-stream (url, priority, event_time)
      → canonicalize + identity (JVM exprs — same P1/P2/P14 kernels)
      → dropDuplicates(url_sha1)        — the URL-seen set as the streaming
                                          dedup state store (S3/S4 analog;
                                          exactly-once per url across
                                          micro-batches AND restarts)
      → politeness_gate                 — applyInPandasWithState per host
                                          (T1/T2; AIMD state persisted in
                                          the state store)
      → fetch_pages (mapInPandas)       — S1, the same Arrow fetch seam
      → analyze_udf                     — P8-P13 single-pass extraction
      → parquet sink + checkpoint       — append mode, atomic with state

Restarting the query against the same checkpoint resumes BOTH state stores:
already-streamed urls stay deduplicated (never refetched) and each host's
politeness clock keeps advancing from its persisted last_fetch — the
streaming twin of the batch engine's byte-identical snapshot resume.

Scope notes (the batch engine stays the primary execution mode):
- robots filtering and the retry/backoff table are batch-side concerns
  here; a production stream would insert the same broadcast decision
  before the gate (stateless — composes freely).
- dropDuplicates without a watermark keeps one state row per url — the
  honest streaming equivalent of the seen set, which also never forgets.
  State is hash-partitioned by url_sha1 across executors like every other
  key in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textops
from ..functions.urlops import canonicalize, host_expr, sha1_expr
from ..sources import fetch as fetch_src
from ..synth import SynthWebConfig
from .politeness import politeness_gate

FRONTIER_STREAM_SCHEMA = "url string, priority int, event_time double"


def streaming_crawl(
    spark: SparkSession,
    frontier_dir: str,
    pages_dir: str,
    checkpoint_dir: str,
    web: SynthWebConfig,
):
    """Build and start the streaming crawl query (availableNow trigger:
    drains everything currently in frontier_dir, then stops — call again
    after dropping more frontier files to continue from the checkpoint).

    Returns the StreamingQuery; caller awaits termination."""
    src = (
        spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
        .parquet(frontier_dir)
    )
    cand = (
        src.withColumn(
            "url_canon", canonicalize(F.lit("http://seed.invalid/"), F.col("url"))
        )
        .filter(F.col("url_canon").isNotNull())
        .withColumn("url_sha1", sha1_expr(F.col("url_canon")))
        .withColumn("host", host_expr(F.col("url_canon")))
        .dropDuplicates(["url_sha1"])
        .select(
            "host",
            "url_canon",
            "priority",
            "event_time",
            F.lit(None).cast("int").alias("status"),
            F.lit(None).cast("int").alias("response_ms"),
        )
    )
    admitted = politeness_gate(cand)
    fetched = fetch_src.fetch_pages(
        admitted.select("host", "url_canon", "priority", "fetch_time"), web
    )
    pages = (
        fetched.filter(F.col("content").isNotNull())
        .withColumn("_an", textops.analyze_udf(F.col("content")))
        .select(
            F.col("url_canon").alias("url"),
            "host",
            "priority",
            "fetch_time",
            "status",
            F.length("content").cast("long").alias("content_size"),
            F.col("_an.title").alias("title"),
            F.col("_an.description").alias("description"),
            F.col("_an.sentiment").alias("sentiment"),
        )
    )
    return (
        pages.writeStream.format("parquet")
        .option("path", pages_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
