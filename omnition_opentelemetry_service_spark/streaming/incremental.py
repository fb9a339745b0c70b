"""Streaming incremental dedup — continuous ingestion against the persisted
signature store (operators/incremental.py), the streaming face of the
process_drop job: every micro-batch is a "drop", deduped exact+near against
the store, survivors appended, so the store IS the stream's state — on
disk, corpus-bounded, shared with the batch path (a batch process_drop run
and a stream can interleave against the same store).

Why foreachBatch and not a stateful operator: the dedup state here is the
WHOLE RETAINED CORPUS (10^12 fingerprints), orders of magnitude beyond any
in-executor state store; dropDuplicatesWithinWatermark (streaming/dedup.py)
handles the in-horizon duplicates cheaply, and this layer handles "have we
EVER kept this document" by joining the micro-batch (small) against the
store (huge, bucket-pruned) — exactly the batch incremental shape, reused
verbatim per batch.

Exactly-once: survivors commit under ``<store>_batches/batch_id=N`` — a
SIBLING of the base store, not inside it (nesting a second partition layout
under the fpb-partitioned store trips Spark's partition discovery with
CONFLICTING_DIRECTORY_STRUCTURES) — with the same idempotent per-batch-
directory recipe as stream_pipeline.run_routed_to_parquet: re-delivery of
batch N overwrites batch N, never duplicates it. The history read unions
the base store with all committed batch dirs; a crash between commit and
checkpoint advance re-runs the batch and the overwrite makes that safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators import incremental as inc


def batches_dir(store_path: str) -> str:
    return store_path.rstrip("/") + "_batches"


def read_full_history(spark: SparkSession, store_path: str) -> DataFrame:
    """Base store + every committed streaming batch append."""
    hist = inc.read_signature_store(spark, store_path)
    bdir = batches_dir(store_path)
    if os.path.isdir(bdir) and any(
            n.startswith("batch_id=") for n in os.listdir(bdir)):
        extra = (spark.read.option("basePath", bdir).parquet(
            os.path.join(bdir, "batch_id=*"))
            .select("id", "fp", "minhash", "fpb"))
        hist = hist.unionByName(extra)
    return hist


def run_dedup_stream(stream_docs: DataFrame, store_path: str,
                     checkpoint_dir: str, est_threshold: float = 0.5,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Start the continuous-dedup query: each micro-batch of documents is
    deduped against the store (base + prior batches) and its survivors are
    committed under batches/batch_id=N. Returns the StreamingQuery.

    Shape per batch = the batch incremental_dedup shape: bucket-pruned
    exact anti-join + broadcast-batch LSH band join; the stream side is
    always the (small) broadcast side, the store streams map-side."""
    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        history = read_full_history(spark, store_path)
        bstore = inc.signature_store(batch_df, id_col, text_col).persist()
        buckets = inc.batch_bucket_list(bstore)
        survivors, _near = inc.incremental_dedup(
            batch_df, history, id_col=id_col, text_col=text_col,
            est_threshold=est_threshold, prune_buckets=buckets,
            batch_store=bstore)
        # idempotent per-batch commit: overwrite, never append, so a
        # re-delivered batch replaces its own output
        (survivors.write.mode("overwrite")
         .parquet(os.path.join(batches_dir(store_path),
                               f"batch_id={batch_id}")))
        bstore.unpersist()

    return (stream_docs.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(process)
            .trigger(availableNow=True)
            .start())
