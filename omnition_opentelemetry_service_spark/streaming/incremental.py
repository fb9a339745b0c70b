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
directory recipe as stream_pipeline.run_stream_to_sinks: re-delivery of
batch N overwrites batch N, never duplicates it. The history read for
batch N unions the base store with committed batch dirs id < N ONLY —
including N itself (possible after a commit-then-crash-before-checkpoint
window) would dedup the re-delivered batch against its own output to zero
survivors and overwrite the commit with an empty dir; with the exclusion,
re-delivery recomputes the identical survivor set and the overwrite is
genuinely idempotent (pinned in test_streaming_incremental's re-delivery
test).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import incremental as inc


def batches_dir(store_path: str) -> str:
    return store_path.rstrip("/") + "_batches"


def read_full_history(spark: SparkSession, store_path: str,
                      before_batch_id: int | None = None) -> DataFrame:
    """Base store + every committed streaming batch append.

    ``before_batch_id`` excludes batch dirs with batch_id >= the given id —
    REQUIRED when reading history for batch N itself: a crash between
    batch N's commit and the checkpoint advance re-delivers batch N, and
    with its own committed output in the history every one of its fps
    looks like a dup, so the idempotent overwrite would replace the commit
    with an EMPTY directory — permanent data loss, not a harmless re-run.

    Also heals a crashed compaction first (recover_compaction is local,
    idempotent, and cheap): a bucket left invisible mid-swap is a
    DURABILITY hole for a dedup reader — absent history rows admit
    permanent duplicates — not just an availability blip."""
    recover_compaction(store_path)
    hist = inc.read_signature_store(spark, store_path)
    bdir = batches_dir(store_path)
    if os.path.isdir(bdir) and any(
            n.startswith("batch_id=") for n in os.listdir(bdir)):
        extra = spark.read.option("basePath", bdir).parquet(
            os.path.join(bdir, "batch_id=*"))
        if before_batch_id is not None:
            # partition-pruned: batch_id is a partition column under bdir
            extra = extra.filter(F.col("batch_id") < int(before_batch_id))
        hist = hist.unionByName(
            extra.select("id", "fp", "minhash", "fpb"))
    return hist


def run_dedup_stream(stream_docs: DataFrame, store_path: str,
                     checkpoint_dir: str, est_threshold: float = 0.5,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Start the continuous-dedup query: each micro-batch of documents is
    deduped against the store (base + prior batches) and its survivors are
    committed under batches/batch_id=N. Returns the StreamingQuery.

    Shape per batch = the batch incremental_dedup shape: bucket-pruned
    exact anti-join + broadcast-batch LSH band join; the stream side is
    always the (small) broadcast side, the store streams map-side.

    Fresh-checkpoint guard: a new checkpoint restarts batch ids at 0, and
    batch_id=N overwrites would silently DESTROY a prior generation's
    committed survivor dirs (their fingerprints leave the history and
    those documents' duplicates are re-admitted forever). When the
    checkpoint has no commits but batch dirs exist, compact_store folds
    them into the base store first — committed identity is preserved and
    the id space is genuinely fresh."""
    spark = stream_docs.sparkSession
    if not os.path.exists(os.path.join(checkpoint_dir, "commits")):
        bdir = batches_dir(store_path)
        if os.path.isdir(bdir) and any(
                n.startswith("batch_id=") for n in os.listdir(bdir)):
            compact_store(spark, store_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_dedup_batch(batch_df, batch_id, store_path,
                            est_threshold=est_threshold,
                            id_col=id_col, text_col=text_col)

    return (stream_docs.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(process)
            .trigger(availableNow=True)
            .start())


def process_dedup_batch(batch_df: DataFrame, batch_id: int,
                        store_path: str, est_threshold: float = 0.5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> None:
    """One micro-batch of the stream — importable so tests can replay a
    batch id directly (the web_ingest redelivery-idempotence probe
    pattern; restarting a real checkpoint trips Spark's concurrent-
    checkpoint guard in-process)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    # exclude THIS batch's own (possibly committed) dir from history:
    # on re-delivery it would dedup the batch against itself to zero
    # and the idempotent overwrite would erase the commit
    history = read_full_history(spark, store_path,
                                before_batch_id=batch_id)
    bstore = inc.signature_store(batch_df, id_col, text_col).persist()
    buckets = inc.batch_bucket_list(bstore)
    survivors, _near = inc.incremental_dedup(
        batch_df, history, id_col=id_col, text_col=text_col,
        est_threshold=est_threshold, prune_buckets=buckets,
        batch_store=bstore)
    # idempotent per-batch commit: overwrite, never append, so a
    # re-delivered batch replaces its own output. Zero survivors (a
    # fully-replayed drop) commit NOTHING: a parquet dir with zero
    # part files would poison the basePath-glob history read (the
    # web_ingest store-commit guard), and an absent dir is already
    # the correct idempotent state for such a batch
    survivors = survivors.persist()  # two consumers: isEmpty + write
    if not survivors.isEmpty():
        (survivors.write.mode("overwrite")
         .parquet(os.path.join(batches_dir(store_path),
                               f"batch_id={batch_id}")))
    survivors.unpersist()
    bstore.unpersist()


def compact_store(spark: SparkSession, store_path: str,
                  buckets: list[int] | None = None) -> dict:
    """Fold streamed batch appends into the base store and bin-pack each
    fpb partition to ONE file — the maintenance job that keeps the two
    unbounded-growth axes of a continuously-ingesting store in check:
    ``read_full_history`` otherwise unions one directory per micro-batch
    forever, and every ``append_signature_store`` adds task-sized files to
    the base partitions. (Iceberg analog: RewriteDataFiles + snapshot
    expiration; the sandbox parquet layout gets the same contract here.)

    Shape at scale: ONE job computes the compacted layout —
    ``repartition("fpb")`` keys the exchange on the bucket column so each
    bucket lands in exactly one task → exactly one output file per bucket;
    shuffle volume = the rows being rewritten, never more. ``buckets``
    restricts the rewrite to a subset of fpb partitions — the incremental
    form a 10^12-row store actually runs (compact a few buckets per cycle);
    subset mode rewrites BASE partitions only and leaves batch dirs alone
    (folding a batch dir requires rewriting every bucket it touches).

    Crash contract (single maintainer; a live concurrent reader may see a
    partition dir swap mid-scan — Iceberg's snapshot isolation is the real
    fix, documented not papered over):
    - staging is written fully before any swap; a crash before the first
      swap leaves the store untouched.
    - each partition swap is two renames (old → trash, staging → live); a
      crash between them leaves that one bucket invisible until the next
      recover_compaction, which restores any trash partition missing from
      the live store. For a dedup reader an invisible bucket is a
      DURABILITY hole (absent history admits permanent duplicates), so
      read_full_history recovers unconditionally before every read —
      compact_store and the stream path both go through it or call
      recover_compaction first; no committed row is ever lost.
    - batch dirs are deleted only after ALL swaps; a crash in between
      leaves their rows duplicated against the freshly-folded partitions —
      harmless for dedup (anti-join/banding are idempotent under duplicate
      history rows, pinned in tests) and healed by the next compact's
      ``dropDuplicates(["id"])``.
    """
    recover_compaction(store_path)
    fold_batches = buckets is None
    src = (read_full_history(spark, store_path) if fold_batches
           else inc.read_signature_store(spark, store_path)
           .filter(F.col("fpb").isin([int(b) for b in buckets])))
    src = src.dropDuplicates(["id"])

    staging = store_path.rstrip("/") + ".compact.staging"
    trash = store_path.rstrip("/") + ".compact.trash"
    # post-recovery, anything left in trash is superseded (its live
    # counterpart exists) — purge it so this run's swaps can't collide
    for d in (staging, trash):
        if os.path.isdir(d):
            shutil.rmtree(d)
    (src.repartition("fpb")
        .write.mode("overwrite").partitionBy("fpb").parquet(staging))

    files_before = sum(
        len([f for f in os.listdir(d) if f.endswith(".parquet")])
        for d in _part_dirs(store_path).values())
    os.makedirs(trash, exist_ok=True)
    live = _part_dirs(store_path)
    swapped = 0
    for b, sdir in sorted(_part_dirs(staging).items()):
        if b in live:
            os.rename(live[b], os.path.join(trash, f"fpb={b}"))
        os.rename(sdir, os.path.join(store_path, f"fpb={b}"))
        swapped += 1
    batches_folded = 0
    if fold_batches:
        bdir = batches_dir(store_path)
        if os.path.isdir(bdir):
            batches_folded = sum(
                1 for n in os.listdir(bdir) if n.startswith("batch_id="))
            shutil.rmtree(bdir)
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    # the session's FileStatusCache may still hold the pre-swap file lists
    # for this path; a same-session read after compaction would otherwise
    # hit FileNotFound on the renamed part files
    spark.catalog.refreshByPath(store_path)
    files_after = sum(
        len([f for f in os.listdir(d) if f.endswith(".parquet")])
        for d in _part_dirs(store_path).values())
    return {"buckets_rewritten": swapped, "batches_folded": batches_folded,
            "files_before": files_before, "files_after": files_after}


def _part_dirs(root: str) -> dict[int, str]:
    if not os.path.isdir(root):
        return {}
    return {int(n.split("=", 1)[1]): os.path.join(root, n)
            for n in os.listdir(root) if n.startswith("fpb=")}


def recover_compaction(store_path: str) -> int:
    """Heal a compact_store crash: any trash partition with NO live
    counterpart was mid-swap when the process died — restore it (the new
    copy never landed). Trash partitions that DO have a live counterpart
    are superseded leftovers; leave them for compact_store's final sweep.
    Returns the number of restored partitions."""
    trash = store_path.rstrip("/") + ".compact.trash"
    live = _part_dirs(store_path)
    restored = 0
    for b, tdir in sorted(_part_dirs(trash).items()):
        if b not in live:
            os.rename(tdir, os.path.join(store_path, f"fpb={b}"))
            restored += 1
    return restored
