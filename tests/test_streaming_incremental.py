"""Streaming incremental dedup (streaming/incremental.py): micro-batches
dedup against the persisted signature store; survivors commit idempotently
per batch id; later drops dedup against earlier drops' survivors."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import incremental as inc
from omnition_opentelemetry_service_spark.streaming import incremental as sinc

SCHEMA = "doc_id long, text string"


def _write_drop(spark, rows, in_dir, name):
    (spark.createDataFrame(rows, SCHEMA).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(in_dir, name)))


def _run_once(spark, in_dir, store, ckpt):
    stream = spark.readStream.schema(SCHEMA).option(
        "pathGlobFilter", "*.parquet").parquet(in_dir + "/*")
    q = sinc.run_dedup_stream(stream, store, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def _kept_ids(spark, store):
    bdir = sinc.batches_dir(store)
    if not os.path.isdir(bdir):
        return []
    return sorted(r.id for r in spark.read.parquet(bdir).select("id").collect())


@pytest.mark.slow
def test_streaming_drops_dedup_against_store_and_each_other(spark, tmp_path):
    corpus = [(i, f"retained corpus document {i} topic {i % 3}")
              for i in range(20)]
    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)

    # drop 1: two exact dups of the corpus + three fresh docs
    drop1 = [(100, corpus[0][1]), (101, corpus[5][1]),
             (102, "fresh stream doc alpha"), (103, "fresh stream doc beta"),
             (104, "fresh stream doc gamma")]
    _write_drop(spark, drop1, in_dir, "drop1")
    _run_once(spark, in_dir, store, ckpt)
    assert _kept_ids(spark, store) == [102, 103, 104]

    # drop 2: dups of drop-1 SURVIVORS (cross-batch dedup must see them)
    # + a corpus dup + one genuinely new doc
    drop2 = [(200, "fresh stream doc alpha"), (201, "fresh stream doc beta"),
             (202, corpus[1][1]), (203, "second drop brand new doc")]
    _write_drop(spark, drop2, in_dir, "drop2")
    _run_once(spark, in_dir, store, ckpt)
    assert _kept_ids(spark, store) == [102, 103, 104, 203]

    # idempotent: nothing new → re-running the stream changes nothing
    _run_once(spark, in_dir, store, ckpt)
    assert _kept_ids(spark, store) == [102, 103, 104, 203]
    spark.catalog.clearCache()


@pytest.mark.slow
def test_redelivered_batch_preserves_its_commit(spark, tmp_path):
    """Commit-then-crash-before-checkpoint: re-delivery of batch N must
    recompute the SAME survivors, not dedup the batch against its own
    committed output to zero and erase the commit with the idempotent
    overwrite (the before_batch_id exclusion in read_full_history)."""
    corpus = [(i, f"redelivery corpus doc {i}") for i in range(8)]
    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)
    drop = [(300, corpus[0][1]), (301, "redelivered fresh doc one"),
            (302, "redelivered fresh doc two")]
    _write_drop(spark, drop, in_dir, "d1")
    ckpt = str(tmp_path / "ckpt1")
    _run_once(spark, in_dir, store, ckpt)
    assert _kept_ids(spark, store) == [301, 302]
    # crash redelivery: replay BATCH 0 itself with its committed dir on
    # disk (the state after a crash between the sink commit and the
    # checkpoint advance) — the before_batch_id exclusion must recompute
    # the identical survivors, not dedup the batch against its own output
    sinc.process_dedup_batch(spark.createDataFrame(drop, SCHEMA),
                             batch_id=0, store_path=store)
    assert _kept_ids(spark, store) == [301, 302]  # not erased
    spark.catalog.clearCache()


@pytest.mark.slow
def test_stream_read_heals_crashed_compaction(spark, tmp_path):
    """A compact_store crash mid-swap leaves a bucket in trash with no
    live counterpart; read_full_history must restore it BEFORE reading —
    absent history rows would admit permanent duplicates (durability,
    not availability)."""
    corpus = [(i, f"compaction heal doc {i}") for i in range(12)]
    store = str(tmp_path / "store")
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)
    full = sinc.read_full_history(spark, store).count()
    assert full == 12
    # simulate the crash window: one live bucket moved to trash, new copy
    # never landed
    live = sorted(d for d in os.listdir(store) if d.startswith("fpb="))
    trash = store.rstrip("/") + ".compact.trash"
    os.makedirs(trash)
    os.rename(os.path.join(store, live[0]), os.path.join(trash, live[0]))
    spark.catalog.refreshByPath(store)
    hist = sinc.read_full_history(spark, store)
    assert hist.count() == full  # healed, nothing lost
    assert not os.path.isdir(os.path.join(trash, live[0]))
    spark.catalog.clearCache()


@pytest.mark.slow
def test_full_history_unions_base_and_batches(spark, tmp_path):
    corpus = [(i, f"base doc {i}") for i in range(5)]
    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)
    assert sinc.read_full_history(spark, store).count() == 5
    _write_drop(spark, [(50, "streamed new doc")], in_dir, "d1")
    _run_once(spark, in_dir, store, str(tmp_path / "ckpt"))
    hist = sinc.read_full_history(spark, store)
    assert hist.count() == 6
    assert hist.filter(F.col("id") == 50).count() == 1
    spark.catalog.clearCache()


@pytest.mark.slow
def test_fresh_checkpoint_folds_prior_generation(spark, tmp_path):
    """A NEW checkpoint restarts batch ids at 0 — without the start-time
    compaction fold, batch 0 of generation 2 would overwrite generation
    1's batch_id=0 survivors AND dedup against a history that excludes
    every prior dir (batch_id < 0), re-admitting their duplicates."""
    corpus = [(i, f"gen guard corpus doc {i}") for i in range(6)]
    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)

    # generation 1 (checkpoint c1): two fresh docs survive as batch dirs
    drop1 = [(100, "generation one fresh doc A"),
             (101, "generation one fresh doc B")]
    _write_drop(spark, drop1, in_dir, "drop1")
    _run_once(spark, in_dir, store, str(tmp_path / "c1"))
    assert _kept_ids(spark, store) == [100, 101]

    # generation 2 (FRESH checkpoint c2): re-sends gen-1's docs + one new.
    # The start-time fold moves gen-1 survivors into the base store, so
    # the re-sent docs dedup away and nothing is overwritten.
    drop2 = [(200, "generation one fresh doc A"),
             (201, "generation two brand new doc")]
    in2 = str(tmp_path / "in2")
    os.makedirs(in2)
    _write_drop(spark, drop2, in2, "drop2")
    _run_once(spark, in2, store, str(tmp_path / "c2"))

    base_ids = {r.id for r in
                inc.read_signature_store(spark, store).select("id").collect()}
    assert {100, 101} <= base_ids, "gen-1 survivors folded into the base"
    assert _kept_ids(spark, store) == [201]
    spark.catalog.clearCache()


@pytest.mark.slow
def test_all_dup_batch_commits_no_dir(spark, tmp_path):
    """A batch fully contained in the store commits NOTHING — an empty
    parquet dir would poison the basePath-glob history read."""
    corpus = [(i, f"noop batch corpus doc {i}") for i in range(4)]
    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)
    _write_drop(spark, [(300, corpus[0][1]), (301, corpus[1][1])],
                in_dir, "dropA")
    _run_once(spark, in_dir, store, str(tmp_path / "ck"))
    bdir = sinc.batches_dir(store)
    assert (not os.path.isdir(bdir)
            or not any(n.startswith("batch_id=") for n in os.listdir(bdir)))
    # and the NEXT drop still reads history fine (nothing poisoned)
    _write_drop(spark, [(302, "post noop genuinely new doc")],
                in_dir, "dropB")
    _run_once(spark, in_dir, store, str(tmp_path / "ck"))
    assert _kept_ids(spark, store) == [302]
    spark.catalog.clearCache()
