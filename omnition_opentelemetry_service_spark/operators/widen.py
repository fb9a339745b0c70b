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

from pyspark.sql import DataFrame


def num_partitions(df: DataFrame) -> int:
    """Physical partition count of ``df``'s plan. JVM-side plan inspection
    (Dataset.rdd() via py4j builds the RDD DAG lazily — no action runs, no
    rows cross into Python)."""
    return df._jdf.rdd().getNumPartitions()


def widen_if_narrow(df: DataFrame, min_tasks: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``min_tasks`` (default: the
    session's defaultParallelism) iff it is currently narrower than half
    that — otherwise return it untouched (the no-op path taken by every
    at-scale input)."""
    spark = df.sparkSession
    target = min_tasks or spark.sparkContext.defaultParallelism
    if num_partitions(df) < max(1, target // 2):
        return df.repartition(target)
    return df
