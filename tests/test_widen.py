"""widen_if_narrow: the adaptive input-widening policy for Arrow kernels.

Contract under test: an exchange-free plan narrower than half the
session's default parallelism is round-robined to full parallelism;
anything at least that wide is returned UNTOUCHED (same object — the
at-scale no-op path); plans that already shuffle are always untouched
(AQE owns their parallelism, and probing them via Dataset.rdd() would
eagerly EXECUTE the shuffle stages); and the check itself runs no job.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnition_opentelemetry_service_spark.operators.widen import (
    has_exchange,
    num_partitions,
    widen_if_narrow,
)


def test_narrow_input_is_widened_to_default_parallelism(spark):
    narrow = spark.range(100).coalesce(1)  # coalesce is narrow: no exchange
    assert not has_exchange(narrow)
    assert num_partitions(narrow) == 1
    out = widen_if_narrow(narrow)
    assert num_partitions(out) == spark.sparkContext.defaultParallelism
    # values survive the round-robin exchange
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_wide_input_returned_untouched(spark):
    wide = spark.range(1000)  # exchange-free, defaultParallelism partitions
    assert num_partitions(wide) == spark.sparkContext.defaultParallelism
    assert widen_if_narrow(wide) is wide  # literally zero added plan nodes


def test_half_parallelism_boundary(spark):
    par = spark.sparkContext.defaultParallelism
    # exactly half is NOT narrow (strict < in the guard)
    at_half = spark.range(100).coalesce(max(1, par // 2))
    assert widen_if_narrow(at_half) is at_half


def test_explicit_min_tasks_overrides_session_default(spark):
    narrow = spark.range(100).coalesce(1)
    out = widen_if_narrow(narrow, min_tasks=6)
    assert num_partitions(out) == 6


def test_small_file_scan_widens_to_byte_capped_tasks(spark, tmp_path):
    """A small (but multi-64KB) file scan widens to ~64 KB of input per
    task, NOT the session's full parallelism: per-task Arrow/worker fixed
    cost exceeds the work once tasks fall under ~64 KB of input (measured,
    see WIDEN_TASK_INPUT_BYTES). A sub-128KB file stays untouched entirely
    (byte target 2, and 1 partition is not narrower than 2//2).
    spark.range inputs have no files, so the cap never applies to them
    (covered by the tests above)."""
    import glob
    import os

    from pyspark.sql import functions as F

    # ~300 KB compressed: md5 hex is high-entropy, so snappy keeps ~1 B/char
    p = str(tmp_path / "small.parquet")
    spark.range(9000).select(
        "id", F.md5(F.col("id").cast("string")).alias("a"),
    ).coalesce(1).write.parquet(p)
    nbytes = sum(os.path.getsize(f) for f in glob.glob(p + "/*.parquet"))
    par = spark.sparkContext.defaultParallelism
    expected = min(par, nbytes // (64 << 10) + 1)
    assert 2 < expected < par, f"fixture out of range: {nbytes} bytes"
    scan = spark.read.parquet(p)
    assert not has_exchange(scan)
    out = widen_if_narrow(scan)
    assert num_partitions(out) == expected

    # sub-128KB single-partition file: byte target 2 -> returned untouched
    tiny = str(tmp_path / "tiny.parquet")
    spark.range(50).coalesce(1).write.parquet(tiny)
    tscan = spark.read.parquet(tiny)
    assert widen_if_narrow(tscan) is tscan


def test_shuffled_plan_untouched_and_no_job_runs(spark):
    """The AQE trap: Dataset.rdd() on a shuffled plan finalizes the
    adaptive plan and RUNS its map stages (observed: one eager job whose
    result the later real action does not reuse). widen_if_narrow must
    detect the exchange from the plan alone and bail without probing."""
    shuffled = spark.range(1000).repartition(2)  # narrow-looking, but AQE's
    assert has_exchange(shuffled)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    assert widen_if_narrow(shuffled) is shuffled
    assert tracker.getJobIdsForGroup(None) == before  # plan-side only


def test_scan_rooted_check_runs_no_job(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(500).write.parquet(p)
    scan = spark.read.parquet(p).select("id")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    widen_if_narrow(scan)
    assert tracker.getJobIdsForGroup(None) == before
