"""SparkSession factory with scale-appropriate defaults.

The reference tunes throughput with queue sizes / worker counts / batch caps
(exporter/kinesis/factory.go:47-59); the Spark analogs are AQE, shuffle
partition count, Arrow batch size and broadcast thresholds, set here once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "omnition-otel-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the pipeline.

    ``parallelism`` maps to ``local[N]`` — the sandbox substitute for
    executor count (scaling evidence runs the same job at local[1] vs
    local[4] in fresh pinned JVMs; wider than ~8 on this host saturates
    the shared memory bus / SMT siblings and measures neighbor load, not
    the engine — BASELINE.md §"Scaling-evidence plan", bench.py header).
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime re-plan, skew-join splitting, partition coalescing.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow columnar exchange for every pandas-UDF stage — the analog of
        # the reference's gogoproto fast-serialization rewrite
        # (Makefile:146-150).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamp rendering for oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # Small dims (source_dim, route_rules) must broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
