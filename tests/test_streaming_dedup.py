"""Bounded-state streaming dedup (streaming/dedup.py): duplicates within
the watermark horizon collapse exactly once; state expires past the horizon
(the bounded-buffering contract — nothing is remembered forever)."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.streaming import dedup as sd

SCHEMA = "doc_id string, ts_str string, n_tok int"


def _write(path, name: str, rows: list[tuple[str, str, int]]) -> None:
    ids, ts, ntok = zip(*rows)
    pq.write_table(
        pa.table({"doc_id": list(ids), "ts_str": list(ts),
                  "n_tok": pa.array(ntok, type=pa.int32())}),
        str(path / name))


def _run(spark, in_dir, ckpt, name: str):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out = sd.dedup_stream(sd.with_event_time_from_ts(stream),
                          key_cols=("doc_id",), delay="2 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_duplicates_within_horizon_collapse_and_state_expires(
        spark, tmp_path):
    """Timeline (horizon 2 min):
    batch 0: A twice + B          → A, B emitted once each
    batch 1: A again (in horizon) → dropped; C advances the watermark past
                                    A's expiry (10:00:00 + 2 min)
    batch 2: spacer (state eviction runs one batch behind the watermark —
                                    the same lag the windowed-late-data test
                                    pins for aggregates)
    batch 3: A re-occurs AFTER expiry → emitted again (state was bounded,
                                    the batch layer owns old re-occurrences)
    """
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write(in_dir, "b0.parquet", [
        ("A", "2026-01-01T10:00:00Z", 1),
        ("A", "2026-01-01T10:00:10Z", 2),
        ("B", "2026-01-01T10:00:20Z", 3),
    ])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write(in_dir, "b1.parquet", [
        ("A", "2026-01-01T10:00:50Z", 4),   # duplicate inside horizon
        ("C", "2026-01-01T10:10:00Z", 5),   # watermark → 10:08 > A expiry
    ])
    time.sleep(1.1)
    _write(in_dir, "b2.parquet", [
        ("D", "2026-01-01T10:11:00Z", 9),   # spacer: eviction pass runs
    ])
    time.sleep(1.1)
    _write(in_dir, "b3.parquet", [
        ("A", "2026-01-01T10:12:00Z", 6),   # past horizon: state evicted
    ])

    rows = _run(spark, in_dir, tmp_path / "ckpt", "dedup_out").collect()
    by_key: dict[str, list[int]] = {}
    for r in rows:
        by_key.setdefault(r.doc_id, []).append(r.n_tok)
    assert sorted(by_key["A"]) == [1, 6]  # first occurrence + post-expiry
    assert by_key["B"] == [3]
    assert by_key["C"] == [5]
    assert by_key["D"] == [9]


def test_streaming_dedup_matches_batch_exact_dedup_within_horizon(
        spark, tmp_path):
    """One micro-batch of redelivered rows: streaming output keys ==
    batch exact-dedup keys (the crash-redelivery window is where the two
    layers must agree)."""
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    rows = [(f"doc{i % 5}", f"2026-01-01T10:00:{i:02d}Z", i)
            for i in range(15)]  # every key delivered 3x
    _write(in_dir, "b0.parquet", rows)

    out = _run(spark, in_dir, tmp_path / "ckpt2", "dedup_out2")
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert got == sorted({k for k, _, _ in rows})  # exactly once per key
