"""Streaming training-shard emission: continuous ingest → shard files.

The streaming twin of ``operators/sharding.py``'s writer — curated
documents arrive as a file stream and land, per micro-batch, as appended
per-shard training segments plus a per-batch manifest. This closes the
continuous-pipeline loop: curate_documents_stream's sink directory IS a
valid docs_dir for this stage, so crawl → curation → training shards runs
end-to-end without a batch hand-off.

Idempotence (the exactly-once story): every micro-batch writes under its
OWN ``ingest_batch=<id>`` directory with mode=overwrite — a replayed batch
(checkpoint recovery fires foreachBatch at-least-once) overwrites its own
output byte-identically instead of double-appending. A loader consumes
``ingest_batch=*/shard=K/`` in batch order; within a segment rows are in
the batch's seeded epoch order — the "ordered list of ordered segments"
contract append_training_shards already documents, with the batch id as
the outer order. The standing manifest is the merge (operators.sharding.
merge_manifests) of all batch manifests — counts and modular checksums
fold, so the manifest of an unbounded stream is maintained in O(delta)
per batch and never re-reads shipped data.

Scale shape per micro-batch: one hash repartition into n_shards write
partitions + per-partition sort — identical to the batch writer; no
stream-side aggregation state at all (placement is a pure hash, so this
stage needs NO state store — the only stateful stage in the pipeline
remains curation's dedup).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sharding import shard_assign, shard_manifest
from .dedup_stream import DOCS_STREAM_SCHEMA


def emit_shard_batch(
    batch_df: DataFrame,
    batch_id: int,
    shards_dir: str,
    manifest_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> None:
    """One micro-batch → its own ingest_batch=<id> segment tree + batch
    manifest, both mode=overwrite so a foreachBatch REPLAY of the same
    batch id (at-least-once delivery under checkpoint recovery) rewrites
    the same output instead of double-appending. Batch ids are stable
    within a checkpoint lineage — the replay scope that needs guarding."""
    if batch_df.isEmpty():
        return
    assigned = shard_assign(batch_df, n_shards, id_col=id_col, salt=salt)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(shards_dir, f"ingest_batch={batch_id}"))
    )
    (
        shard_manifest(
            batch_df, n_shards, id_col=id_col, text_col=text_col, salt=salt
        )
        # the ingest_batch=<id> DIRECTORY carries the batch id (partition
        # inference restores it on read; a duplicate data column would
        # collide with it)
        .write.mode("overwrite")
        .parquet(os.path.join(manifest_dir, f"ingest_batch={batch_id}"))
    )


def shard_documents_stream(
    spark: SparkSession,
    docs_dir: str,
    shards_dir: str,
    manifest_dir: str,
    checkpoint_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
    schema: str = DOCS_STREAM_SCHEMA,
):
    """Start the shard-emission query (availableNow trigger: drains
    everything currently in docs_dir then stops; call again after more
    files arrive to continue against the same checkpoint). Returns the
    StreamingQuery.

    Output layout: ``shards_dir/ingest_batch=<id>/shard=<k>/*.parquet``
    (epoch-ordered within each segment) and one manifest parquet per
    batch at ``manifest_dir/ingest_batch=<id>`` with (shard, n_docs,
    n_tokens, content_ck)."""

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        emit_shard_batch(
            batch_df,
            batch_id,
            shards_dir,
            manifest_dir,
            n_shards,
            id_col=id_col,
            text_col=text_col,
            salt=salt,
        )

    src = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        src.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def standing_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """The stream's cumulative manifest: fold every batch manifest with
    merge_manifests semantics (one groupBy over rows-per-batch-per-shard —
    O(batches x shards) input, never corpus-sized)."""
    from ..operators.sharding import _CKSUM_MOD

    m = spark.read.parquet(manifest_dir)
    return m.groupBy("shard").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("content_ck") % _CKSUM_MOD).alias("content_ck"),
    )
