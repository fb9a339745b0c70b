"""Adaptive input widening for expensive vectorized (Arrow/pandas) stages.

A mapInPandas stage inherits the input's partitioning. At the target scale
(10^12-row table, thousands of file splits) a scan is always at least as
wide as the executor fleet, so the zero-shuffle signature/feature kernels
parallelize for free. At the small end — a single parquet row group, a
filtered dimension, a bench fixture — the same kernel lands on ONE task and
serializes the whole stage onto one core (measured: the sf0.1 documents
table is one 580 KB row group, so the memoized MinHash map ran 1-task and
regressed vs the shuffling grouped form that round-robins after exchange).

``widen_if_narrow`` closes that gap with a policy Spark's AQE cannot apply
itself (AQE coalesces post-shuffle partitions; it never SPLITS a narrow
scan feeding a map-only stage): repartition round-robin to the session's
default parallelism iff the input is narrower than half of it. The check is
plan-side only (partition count of the physical RDD — no job, no rows
moved); the repartition shuffles only narrow inputs, i.e. exactly the ones
whose byte size makes the exchange ~free relative to the kernel it feeds.
At scale the guard is false and the operator stays literally zero-shuffle.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Target compressed-input bytes per widened task. Measured on the sf0.1
# documents table (594 KB, one row group) under local[32]: 4-16 tasks run
# the MinHash kernel in ~0.31-0.35 s, 32 tasks in 0.41-0.64 s — per-task
# Arrow/worker fixed cost dominates once tasks fall under ~40 KB of input.
# 64 KB/task puts that file at ~10 tasks (the measured plateau) while any
# real multi-split scan still caps at the session's full parallelism.
WIDEN_TASK_INPUT_BYTES = 64 << 10


def _input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of ``df``'s input files (metadata-only — no job).
    None when the plan has no file source or a size can't be read."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return None
        try:
            # inputFiles() returns URIs: percent-decode the path (a space
            # or non-ASCII char would otherwise OSError and silently
            # disable the byte cap, over-widening tiny inputs)
            total += os.path.getsize(unquote(p.path) or f)
        except OSError:
            return None
    return total


def materialize(df: DataFrame) -> DataFrame:
    """persist + eager count — the fix for the CONCURRENT-FIRST-SCAN race:
    a persist() alone does not dedupe work when its first two consumers run
    inside ONE action. A self-join's two scans execute as concurrent map
    stages, each computing the full subtree before the other has populated
    the cache — measured on the banded SimHash join at sf0.1, the Arrow
    signature kernel ran TWICE (0.65 s vs 0.26 s once a count() populated
    the cache first), and the MinHash verify pipeline paid 2.7 s vs 0.8 s.
    The count() is one extra pass over the subtree that would otherwise run
    2+ times; at scale it is the 'write the signature table before
    bucketing' step every production dedup pipeline has anyway. Cache
    RELEASE stays caller-owned (registry.release_caches / clearCache)."""
    df.persist()
    df.count()
    return df


def has_exchange(df: DataFrame) -> bool:
    """True if ``df``'s physical plan already contains a shuffle. Uses the
    pre-adaptive sparkPlan (planning only — never executes): on an AQE plan
    a ``Dataset.rdd()`` call would FINALIZE the adaptive plan, eagerly
    running its shuffle map stages, and those stages are not reused by the
    later real action — so shuffled plans must be detected and left alone
    before any partition-count probe."""
    import re

    # match the standalone shuffle operator only: 'BroadcastExchange' (a
    # broadcast-join build side) and 'ReusedExchange' are NOT shuffles of
    # this plan's main lineage — substring-matching 'Exchange' classified
    # every broadcast-join plan as shuffled and silently disabled widening
    # exactly where a narrow scan feeds an enrich join + Arrow kernel
    plan = df._jdf.queryExecution().sparkPlan().toString()
    return re.search(r"(?<![A-Za-z])Exchange", plan) is not None


def num_partitions(df: DataFrame) -> int:
    """Physical partition count of ``df``'s plan. Safe ONLY for
    exchange-free (scan-rooted) plans, where Dataset.rdd() builds the RDD
    DAG lazily — no job runs, no rows cross into Python. Guard with
    ``has_exchange`` first; see its docstring for the AQE trap."""
    return df._jdf.rdd().getNumPartitions()


def widen_if_narrow(df: DataFrame, min_tasks: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``min_tasks`` (default: the
    session's defaultParallelism) iff it is a scan-rooted plan currently
    narrower than half that — otherwise return it untouched (the no-op
    path taken by every at-scale input). Plans that already shuffle are
    always untouched: AQE owns post-shuffle parallelism there, and probing
    their width would eagerly execute the shuffle (see has_exchange).

    The target is additionally capped by input size (~64 KB of compressed
    input per task, see WIDEN_TASK_INPUT_BYTES): splitting a sub-megabyte
    scan across the full session parallelism makes each task's fixed
    Arrow/worker cost exceed its work. At scale the cap is never the
    binding term — any input past ``parallelism × 64 KB`` (a few MB)
    already widens to full parallelism, and genuinely wide scans skip the
    repartition entirely via the narrowness guard."""
    if has_exchange(df):
        return df
    spark = df.sparkSession
    target = min_tasks or spark.sparkContext.defaultParallelism
    nbytes = _input_bytes(df)
    if nbytes is not None:
        target = min(target, max(2, nbytes // WIDEN_TASK_INPUT_BYTES + 1))
    if num_partitions(df) < max(1, target // 2):
        return df.repartition(target)
    return df
