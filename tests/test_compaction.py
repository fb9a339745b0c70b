"""Signature-store compaction (streaming/incremental.compact_store): fold
streamed batch dirs into the base store, bin-pack each fpb partition to one
file, heal crash windows. Pins the invariants the 10^12-row story rests on:
history is row-identical across compaction, dedup is idempotent under
duplicated history rows, mid-swap crashes are recoverable without data loss.
"""

from __future__ import annotations

import os

from omnition_opentelemetry_service_spark.operators import incremental as inc
from omnition_opentelemetry_service_spark.streaming import incremental as sinc

SCHEMA = "doc_id long, text string"


def _mk_store(spark, tmp_path, n=30):
    corpus = [(i, f"corpus doc {i} body {i % 7}") for i in range(n)]
    store = str(tmp_path / "store")
    inc.write_signature_store(
        inc.signature_store(spark.createDataFrame(corpus, SCHEMA)), store)
    return store


def _append_batch_dir(spark, store, rows, batch_id):
    bstore = inc.signature_store(spark.createDataFrame(rows, SCHEMA))
    (bstore.write.mode("overwrite")
     .parquet(os.path.join(sinc.batches_dir(store), f"batch_id={batch_id}")))


def _history_rows(spark, store):
    return sorted(
        (r.id, r.fp, tuple(r.minhash) if r.minhash else None, r.fpb)
        for r in sinc.read_full_history(spark, store).collect())


def test_compact_folds_batches_and_packs_one_file_per_bucket(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _append_batch_dir(spark, store, [(100, "streamed doc A"),
                                     (101, "streamed doc B")], 0)
    _append_batch_dir(spark, store, [(102, "streamed doc C")], 1)
    # plus a small-file batch append on the base store (process_drop path)
    inc.append_signature_store(
        inc.signature_store(
            spark.createDataFrame([(103, "appended doc D")], SCHEMA)), store)

    before = _history_rows(spark, store)
    stats = sinc.compact_store(spark, store)
    after = _history_rows(spark, store)

    assert after == before, "compaction must not change the visible history"
    assert not os.path.isdir(sinc.batches_dir(store))
    assert stats["batches_folded"] == 2
    buckets = [d for d in os.listdir(store) if d.startswith("fpb=")]
    assert stats["files_after"] == len(buckets)  # exactly 1 file per bucket
    for d in buckets:
        parts = [f for f in os.listdir(os.path.join(store, d))
                 if f.endswith(".parquet")]
        assert len(parts) == 1, f"{d} not packed to one file: {parts}"


def test_dedup_idempotent_under_duplicated_history(spark, tmp_path):
    """The crash window between batch-fold and batch-dir delete leaves
    history rows duplicated — exact anti-join and banded near-join must
    give the same survivors as a clean history."""
    store = _mk_store(spark, tmp_path)
    clean = sinc.read_full_history(spark, store)
    doubled = clean.unionByName(clean)

    batch = spark.createDataFrame(
        [(200, "corpus doc 3 body 3"),       # exact dup of history
         (201, "a genuinely new document")], SCHEMA)
    s1, n1 = inc.incremental_dedup(batch, clean)
    s2, n2 = inc.incremental_dedup(batch, doubled)
    assert sorted(r.id for r in s1.collect()) == \
        sorted(r.id for r in s2.collect()) == [201]
    assert (sorted(map(tuple, n1.collect()))
            == sorted(map(tuple, n2.collect())))
    # and the next compaction heals the duplication
    extra = str(tmp_path / "doubled_store")
    inc.write_signature_store(doubled, extra)
    sinc.compact_store(spark, extra)
    healed = sinc.read_full_history(spark, extra)
    assert healed.count() == clean.count()


def test_recover_compaction_restores_mid_swap_bucket(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    before = _history_rows(spark, store)
    # simulate a crash between the two swap renames: one live partition
    # moved to trash, its replacement never landed
    bucket_dir = next(d for d in sorted(os.listdir(store))
                      if d.startswith("fpb="))
    trash = store + ".compact.trash"
    os.makedirs(trash)
    os.rename(os.path.join(store, bucket_dir), os.path.join(trash, bucket_dir))
    spark.catalog.refreshByPath(store)
    # the hole exists at the STORAGE level (raw read bypassing the heal)...
    raw = spark.read.parquet(store).count()
    assert raw < len(before)
    # ...but read_full_history heals unconditionally before reading — an
    # invisible bucket is a DURABILITY hole for a dedup reader, so the
    # window must not be observable through the real read path
    assert _history_rows(spark, store) == before
    assert not os.listdir(trash)  # bucket moved back by the read's heal

    # the read already restored it, so an explicit recover is a no-op
    spark.catalog.refreshByPath(store)
    assert sinc.recover_compaction(store) == 0
    assert _history_rows(spark, store) == before

    # a full compact after recovery works and is a no-op on content
    sinc.compact_store(spark, store)
    assert _history_rows(spark, store) == before
    assert not os.path.isdir(trash)


def test_subset_compaction_rewrites_only_listed_buckets(spark, tmp_path):
    store = _mk_store(spark, tmp_path, n=40)
    before = _history_rows(spark, store)
    live = sorted(int(d.split("=")[1]) for d in os.listdir(store)
                  if d.startswith("fpb="))
    target, untouched = live[0], live[1:]
    mtimes = {b: os.stat(os.path.join(store, f"fpb={b}")).st_mtime_ns
              for b in untouched}
    # leave a batch dir in place: subset mode must NOT fold or delete it
    _append_batch_dir(spark, store, [(300, "streamed doc kept aside")], 0)

    stats = sinc.compact_store(spark, store, buckets=[target])
    assert stats["buckets_rewritten"] == 1
    assert stats["batches_folded"] == 0
    assert os.path.isdir(sinc.batches_dir(store))
    for b in untouched:
        assert os.stat(os.path.join(store, f"fpb={b}")).st_mtime_ns == \
            mtimes[b], f"bucket {b} was rewritten"
    # visible history = base (incl. rewritten bucket) + the batch dir
    spark.catalog.refreshByPath(store)
    got = _history_rows(spark, store)
    assert [g for g in got if g[0] != 300] == before
    assert any(g[0] == 300 for g in got)


def test_process_drop_cli_compacts(spark, tmp_path):
    """--compact end-to-end through the spark-submit entrypoint."""
    import json
    import subprocess
    import sys

    corpus_pq = str(tmp_path / "corpus.parquet")
    batch_pq = str(tmp_path / "batch.parquet")
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(i, f"cli corpus doc {i}") for i in range(10)], SCHEMA
    ).write.parquet(corpus_pq)
    spark.createDataFrame(
        [(100, "cli corpus doc 1"), (101, "cli fresh doc")], SCHEMA
    ).write.parquet(batch_pq)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "process_drop.py"),
         "--store", store, "--batch", batch_pq, "--init-from", corpus_pq,
         "--compact", "--parallelism", "4"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["survivors"] == 1
    buckets = [d for d in os.listdir(store) if d.startswith("fpb=")]
    assert rep["compacted"]["files_after"] == len(buckets)
    for d in buckets:
        parts = [f for f in os.listdir(os.path.join(store, d))
                 if f.endswith(".parquet")]
        assert len(parts) == 1
