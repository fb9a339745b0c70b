"""Structured Streaming pipeline: the streamed stage chain must produce the
SAME per-sink totals as the batch pipeline on the same input (micro-batching
must not change routing), and resume from its checkpoint without
reprocessing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.plans import pipeline as pl
from omnition_opentelemetry_service_spark.streaming import stream_pipeline as sp

N = 400


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    fx.materialize_input(spark, N, d, num_partitions=4)
    return d


def test_stream_counts_equal_batch_counts(spark, input_dir, tmp_path):
    got = sp.run_stream_once(
        spark, input_dir, str(tmp_path / "ckpt"), out_table="sc1",
        window="1 hour",
    )
    stream_totals = {
        r.sink: (r.n_rows, r.sum_n_tok)
        for r in got.groupBy("sink").agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_n_tok").alias("sum_n_tok")).collect()
    }
    st = pl.build_routed(spark, pl.PipelineConfig(input_dir=input_dir))
    batch_totals = {
        r.sink: (r.n_rows, r.sum_n_tok)
        for r in st["routed"].groupBy("sink").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tok").alias("sum_n_tok")).collect()
    }
    assert stream_totals == batch_totals


def test_stream_resume_is_idempotent(spark, input_dir, tmp_path):
    """Second availableNow run over the same checkpoint finds no new data —
    the queued-retry/replay contract in streaming form."""
    ckpt = str(tmp_path / "ckpt2")
    first = sp.run_stream_once(spark, input_dir, ckpt, out_table="sc2",
                               window="1 hour").collect()
    assert len(first) > 0
    again = sp.run_stream_once(spark, input_dir, ckpt, out_table="sc3",
                               window="1 hour")
    # complete-mode memory sink after a no-new-data restart re-emits state or
    # nothing; either way no sink may exceed the first run's totals.
    a = {(r.win_start, r.sink): r.n_rows for r in again.collect()}
    f = {(r.win_start, r.sink): r.n_rows for r in first}
    for k, v in a.items():
        assert v <= f.get(k, 0) or f == {}


def test_stateful_running_counts_equal_batch(spark, input_dir, tmp_path):
    """applyInPandasWithState counters, drained over multiple micro-batches,
    must converge to exactly the batch groupBy totals (the streaming
    obsreport-equality check)."""
    from omnition_opentelemetry_service_spark.streaming import stateful

    got = {
        r.source: (r.received, r.sum_n_tok)
        for r in stateful.run_counts_once(
            spark, input_dir, str(tmp_path / "ckpt_state"),
            max_files_per_trigger=1).collect()
    }
    batch = {
        r.source: (r.cnt, r.s)
        for r in spark.read.parquet(f"{input_dir}/sequences")
        .groupBy("source").agg(F.count(F.lit(1)).alias("cnt"),
                               F.sum("n_tok").alias("s")).collect()
    }
    assert got == batch


def test_stateful_counts_survive_resume_with_no_new_data(spark, input_dir,
                                                         tmp_path):
    """A resumed run over an already-drained checkpoint must still report
    the full totals: update mode emits nothing for quiet keys in the new
    run, so totals must come from the persisted update log, not from a
    per-run memory sink (which returned 0 rows here before)."""
    from omnition_opentelemetry_service_spark.streaming import stateful

    ckpt = str(tmp_path / "ckpt_state_resume")
    first = {r.source: (r.received, r.sum_n_tok) for r in
             stateful.run_counts_once(spark, input_dir, ckpt).collect()}
    assert first  # non-vacuous
    again = {r.source: (r.received, r.sum_n_tok) for r in
             stateful.run_counts_once(spark, input_dir, ckpt).collect()}
    assert again == first


def test_windowed_counts_respect_window(spark, input_dir, tmp_path):
    got = sp.run_stream_once(spark, input_dir, str(tmp_path / "ckpt3"),
                             out_table="sc4", window="1 minute")
    rows = got.collect()
    # fixture timestamps advance 1s per row from EPOCH0 → N=400 rows span
    # ~7 one-minute windows
    wins = {r.win_start for r in rows}
    assert 6 <= len(wins) <= 8
    assert {r.sink for r in rows} <= {
        "sink_archive", "sink_kinesis", "sink_oc", "sink_metrics",
        "sink_logging"}


def test_stream_sinks_write_matches_batch_envelope(spark, input_dir, tmp_path):
    """The streaming exporter (foreachBatch → envelope write) must produce
    the same per-sink row totals as the batch envelope over the same input —
    exporter parity across execution modes."""
    from pyspark.sql import functions as F

    from omnition_opentelemetry_service_spark.operators.translate import (
        encode_envelope,
    )

    out = str(tmp_path / "stream_sinks")
    n_batches = sp.run_stream_to_sinks(
        spark, input_dir, str(tmp_path / "ckpt_sinks"), out)
    assert n_batches >= 1
    streamed = {r.sink: r.n for r in
                spark.read.parquet(out).groupBy("sink")
                .agg(F.count("*").alias("n")).collect()}
    st = pl.build_routed(spark, pl.PipelineConfig(input_dir=input_dir))
    batch = {r.sink: r.n for r in
             encode_envelope(st["routed"]).groupBy("sink")
             .agg(F.count("*").alias("n")).collect()}
    assert streamed == batch


def test_stream_sinks_redelivery_is_idempotent(spark, input_dir, tmp_path):
    """Exactly-once under crash-redelivery: foreachBatch re-delivers a
    batch whose parquet write finished but whose checkpoint commit didn't.
    Simulated by deleting the newest commit marker from the checkpoint —
    the restart re-runs that batch, and because each batch owns (and
    overwrites) its batch_id=N directory, totals must be UNCHANGED rather
    than doubled."""
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "stream_sinks")
    ckpt = str(tmp_path / "ckpt_sinks")
    sp.run_stream_to_sinks(spark, input_dir, ckpt, out)

    def totals():
        return {r.sink: r.n for r in
                spark.read.parquet(out).groupBy("sink")
                .agg(F.count("*").alias("n")).collect()}

    before = totals()
    commits = os.path.join(ckpt, "commits")
    newest = max((f for f in os.listdir(commits) if not f.startswith(".")),
                 key=int)
    os.remove(os.path.join(commits, newest))  # crash window: write done,
    crc = os.path.join(commits, f".{newest}.crc")  # local-FS artifact: the
    if os.path.exists(crc):  # checksum twin must go too or the re-commit
        os.remove(crc)  # rename fails (ChecksumFileSystem only)
    n = sp.run_stream_to_sinks(spark, input_dir, ckpt, out)  # commit lost
    assert n >= 1  # the batch really was re-delivered
    assert totals() == before


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """The at-most-once loss model in streaming form (SURVEY §2.5: 'no
    late-data policy — at-most-once with counted drops'): a row arriving
    after its window was finalized and emitted is DROPPED from the windowed
    per-sink counts, and the drop is COUNTED in the state-operator metrics
    (the spans_dropped analog, memorylimiter.go:119-127's observable
    contract).

    Timing subtlety this test pins (measured, Spark 4.1): the late-row
    filter uses the watermark as of the END of the PREVIOUS batch, while
    state eviction/emission uses the watermark current for THIS batch — so
    a late row landing in the same micro-batch where its window is first
    evicted still merges; one batch later it is dropped. The layout below
    therefore advances the watermark in batch 1 and delivers the late row
    in batch 2."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = tmp_path / "late_in"
    in_dir.mkdir()

    def write_file(name: str, rows: list[tuple[str, str, int]]) -> None:
        ts, sink, ntok = zip(*rows)
        pq.write_table(
            pa.table({"ts_str": list(ts), "sink": list(sink),
                      "n_tok": pa.array(ntok, type=pa.int32())}),
            str(in_dir / name))

    # batch 0: window 10:00 gets ONE row; max event 10:05:30 sets the
    # batch-1 watermark to 10:03:30 (> the 10:00 window's end)
    write_file("b1.parquet", [
        ("2026-01-01T10:00:30Z", "s1", 1),
        ("2026-01-01T10:05:30Z", "s1", 1),
    ])
    time.sleep(1.1)  # distinct mtimes → deterministic file→micro-batch order
    # batch 1: on-time row; eviction at batch end emits the 10:00 window
    write_file("b2.parquet", [("2026-01-01T10:06:00Z", "s1", 1)])
    time.sleep(1.1)
    # batch 2: VERY LATE row into the already-finalized 10:00 window
    write_file("b3.parquet", [("2026-01-01T10:00:45Z", "s1", 1)])

    stream = (
        spark.readStream.schema("ts_str string, sink string, n_tok int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    counts = sp.windowed_sink_counts(stream, window="1 minute",
                                     watermark="2 minutes")
    q = (
        counts.writeStream.outputMode("append")
        .format("memory").queryName("late_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress for op in p["stateOperators"])
    assert dropped == 1, dropped
    # append mode emits a window exactly once, when the watermark passes it:
    # the finalized 10:00 window holds only its on-time row — the late row
    # neither mutates it nor re-emits it
    emitted = {(str(r.win_start), r.sink): r.n_rows
               for r in spark.table("late_counts").collect()}
    assert emitted == {("2026-01-01 10:00:00", "s1"): 1}, emitted


def test_session_windows_equal_batch_sessionize(spark, input_dir, tmp_path):
    """Streaming session_window (merge-based) must produce exactly the
    sessions the batch lag/cumsum gap-sessionize finds on the same routed
    rows: same (source, start, end, n_rows, sum_n_tok) set, where a session
    ends gap seconds after its last event. Non-vacuity: the sampler's drops
    must actually split some source into multiple sessions."""
    from pyspark.sql import Window

    gap_s = 10
    got = sp.run_sessions_once(spark, input_dir, str(tmp_path / "ckpt_sess"),
                               out_table="sess1", gap=f"{gap_s} seconds")
    stream_rows = sorted(
        (r.source, r.sess_start, r.sess_end, r.n_rows, r.sum_n_tok)
        for r in got.collect())

    st = pl.build_routed(spark, pl.PipelineConfig(input_dir=input_dir))
    ts = st["routed"].withColumn(
        "event_time", F.to_timestamp("ts_str", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    w = Window.partitionBy("source").orderBy("event_time")
    sess = (
        ts.withColumn("prev", F.lag("event_time").over(w))
        .withColumn("new_sess",
                    (F.col("prev").isNull() |
                     (F.unix_timestamp("event_time")
                      - F.unix_timestamp("prev") > gap_s)).cast("int"))
        .withColumn("sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("source", "sess_id")
        .agg(F.min("event_time").alias("sess_start"),
             (F.timestamp_seconds(
                 F.unix_timestamp(F.max("event_time")) + gap_s))
             .alias("sess_end"),
             F.count(F.lit(1)).alias("n_rows"),
             F.sum("n_tok").alias("sum_n_tok"))
    )
    batch_rows = sorted(
        (r.source, r.sess_start, r.sess_end, r.n_rows, r.sum_n_tok)
        for r in sess.collect())
    assert stream_rows == batch_rows
    n_sources = len({r[0] for r in batch_rows})
    assert len(batch_rows) > n_sources  # some source split into >1 session


def test_stateful_counters_reset_with_checkpoint(spark, input_dir, tmp_path):
    """The updates log lives INSIDE the checkpoint dir: wiping the
    checkpoint to reprocess a smaller corrected input must NOT leak the old
    generation's larger counters through the max-over-log rule."""
    import shutil

    from omnition_opentelemetry_service_spark.streaming import stateful

    small_dir = str(tmp_path / "small_in")
    fx.materialize_input(spark, 100, small_dir, num_partitions=2)
    ckpt = str(tmp_path / "ckpt_reset")

    big = {r.source: r.received for r in
           stateful.run_counts_once(spark, input_dir, ckpt).collect()}
    shutil.rmtree(ckpt)  # reset: reprocess from scratch with NEW input
    small = {r.source: r.received for r in
             stateful.run_counts_once(spark, small_dir, ckpt).collect()}
    batch_small = {r.source: r.cnt for r in
                   spark.read.parquet(f"{small_dir}/sequences")
                   .groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
                   .collect()}
    assert small == batch_small          # not inflated by generation 1
    assert sum(small.values()) < sum(big.values())


def test_sink_writes_fresh_checkpoint_clears_stale_batches(
        spark, input_dir, tmp_path):
    """foreachBatch overwrite is idempotent only within one checkpoint
    lifetime — a fresh checkpoint must clear batch_id dirs left by a
    previous generation or whole-directory reads double-count."""
    import os

    out = str(tmp_path / "sinks_out")
    stale = os.path.join(out, "batch_id=99")
    os.makedirs(stale)
    spark.createDataFrame([("junk", "x", "sink_oc")],
                          "doc_id string, payload string, sink string") \
        .write.parquet(os.path.join(stale, "sink=sink_oc"))

    n = sp.run_stream_to_sinks(spark, input_dir,
                               str(tmp_path / "ckpt_fresh"), out)
    assert n > 0
    assert not os.path.exists(stale)
    total = spark.read.option("basePath", out).parquet(out).count()
    st = pl.build_routed(spark, pl.PipelineConfig(input_dir=input_dir))
    assert total == st["routed"].count()


def test_stream_stream_interval_join_equals_batch(spark, input_dir, tmp_path):
    """The watermarked span↔ack interval join drained via availableNow must
    emit exactly the rows the SAME functions produce on batch frames
    (withWatermark is a no-op in batch) — stream-stream join correctness
    plus the bounded-state contract compiling at all."""
    got = sp.run_span_ack_join_once(
        spark, input_dir, str(tmp_path / "ckpt_ss"), out_table="ssj1")
    stream_rows = sorted(map(tuple, got.collect()))

    from omnition_opentelemetry_service_spark.functions import parse as pfn

    pay = spark.read.parquet(f"{input_dir}/payloads")
    parsed = pfn.parse_payload_native(pay).filter(F.col("valid"))
    spans = parsed.select(
        "doc_id",
        F.to_timestamp("ts_str", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("span_time"))
    acks = parsed.select(
        "doc_id",
        (F.to_timestamp("ts_str", "yyyy-MM-dd'T'HH:mm:ss'Z'")
         + F.make_interval(secs=F.pmod(F.xxhash64("doc_id"), F.lit(30)).cast("double")))
        .alias("ack_time"))
    batch_rows = sorted(map(tuple,
                            sp.span_ack_latency(spans, acks).collect()))
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0
    # every ack matched within the horizon: latency in [0, 30)
    assert all(0 <= r[2] < 30 for r in stream_rows)


def test_streaming_pack_ids_equal_batch_across_feeds(spark, tmp_path):
    """Streaming packer == batch with_pack_id when the same rows arrive as
    TWO sequential feeds (separate availableNow runs over one checkpoint):
    the per-source offset survives in the state store, so bins continue
    across the feed boundary exactly where a one-shot batch run would put
    them."""
    import os

    from omnition_opentelemetry_service_spark.operators import packing as pk
    from omnition_opentelemetry_service_spark.streaming import stateful

    budget = 512
    in_dir = str(tmp_path / "feed")
    seq_dir = os.path.join(in_dir, "sequences")
    ckpt = str(tmp_path / "ckpt")

    # feed 1: rows [0, 200); feed 2: rows [200, 400) — in-order delivery
    # per source across triggers (the documented contract)
    fx.sequences(spark, 200).coalesce(1).write.mode("append").parquet(seq_dir)
    first = stateful.run_pack_once(spark, in_dir, ckpt, budget=budget)
    assert first.count() == 200
    fx.sequences(spark, 400, start=200).coalesce(1) \
        .write.mode("append").parquet(seq_dir)
    log = stateful.run_pack_once(spark, in_dir, ckpt, budget=budget)

    # a third run with NO new data must leave the log unchanged (no
    # re-emission, no duplicate appends — the idempotent batch-dir sink)
    again = stateful.run_pack_once(spark, in_dir, ckpt, budget=budget)
    assert again.count() == log.count() == 400

    got = {r.doc_id: r.pack_id for r in log.collect()}
    batch = pk.with_pack_id(fx.sequences(spark, 400), budget=budget)
    want = {r.doc_id: r.pack_id for r in batch.collect()}
    assert got == want
    # non-vacuous continuation: feed-2 rows exist whose bin STARTED in feed 1
    seq_of = {r.doc_id: r.seq_no for r in batch.collect()}
    f1_max_pack = {}
    for r in batch.collect():
        if seq_of[r.doc_id] < 200:
            f1_max_pack[r.source] = max(
                f1_max_pack.get(r.source, -1), r.pack_id)
    assert any(want[d] == f1_max_pack.get(r_source, -2)
               for d, r_source in
               ((r.doc_id, r.source) for r in batch.collect()
                if r.seq_no >= 200))
