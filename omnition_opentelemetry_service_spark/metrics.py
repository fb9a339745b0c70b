"""Counters + lineage — the obsreport analog (SURVEY.md §2.4).

Reference: per-stage tagged counters (received/dropped spans per receiver
tag, octrace/opencensus.go:34-37,183,196,206; spans_dropped Sum and
batches_dropped Count views, processor/memorylimiter/metrics.go:33-59) and a
self-trace span per forward (octrace/opencensus.go:187-209).

Spark-first: counters are *declarative side-outputs* — `df.observe()` rides
the existing action with zero extra passes; lineage rows come from a
mapInPandas pass-through that emits (stage, partition_id, rows) without
materializing anything extra.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class StageCounters:
    """Collects (stage, tag, received, dropped) rows across pipeline stages."""

    def __init__(self) -> None:
        self.rows: list[tuple[str, str, int, int]] = []
        self._observations: list[tuple[str, str, Observation, Observation | None]] = []

    def observe_stage(self, df: DataFrame, stage: str, tag: str,
                      drop_predicate=None) -> DataFrame:
        """Attach an Observation to the stage's DataFrame. ``drop_predicate``
        marks rows that the following filter will drop (so received/dropped
        are measured in the SAME pass as the real action)."""
        obs = Observation(f"{stage}:{tag}")
        if drop_predicate is not None:
            df = df.observe(
                obs,
                F.count(F.lit(1)).alias("received"),
                F.sum(F.when(drop_predicate, 1).otherwise(0)).alias("dropped"),
            )
        else:
            df = df.observe(obs, F.count(F.lit(1)).alias("received"))
        self._observations.append((stage, tag, obs, None))
        return df

    def harvest(self) -> list[tuple[str, str, int, int]]:
        """Read observation results (valid after an action ran on the DF).
        ``or 0`` guards the zero-row stage: F.sum over an empty input
        observes NULL (the key is PRESENT with value None, so a plain
        .get default never applies) and int(None) would crash the whole
        harvest."""
        for stage, tag, obs, _ in self._observations:
            got = obs.get
            self.rows.append(
                (stage, tag, int(got.get("received") or 0),
                 int(got.get("dropped") or 0))
            )
        self._observations.clear()
        return self.rows

    def record(self, stage: str, tag: str, received: int, dropped: int) -> None:
        self.rows.append((stage, tag, received, dropped))

    def to_df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            self.rows, "stage string, tag string, received long, dropped long"
        )


def with_lineage(df: DataFrame, stage: str):
    """Pass-through that also yields per-partition lineage rows.

    Returns (df_unchanged, lineage_df) where lineage_df materializes
    (stage, partition_id, rows) per partition — the self-trace analog.
    Lineage is computed in its own lightweight count pass over the same
    partitioning (mapInPandas emitting one row per batch group).
    """
    def count_parts(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in it:
            n += len(pdf)
        yield pd.DataFrame({"stage": [stage], "partition_id": [pid], "rows": [n]})

    # Counting needs no payload: project to one tiny column so the Arrow
    # exchange doesn't ship token arrays just to measure row counts.
    # (select is narrow — the partition structure being measured survives.)
    lineage = df.select(F.lit(1).alias("one")).mapInPandas(
        count_parts, "stage string, partition_id int, rows long")
    return df, lineage


def lineage_summary(lineage: DataFrame) -> DataFrame:
    """Deterministic roll-up (partition counts vary with parallelism; totals
    must not — the parallelism-invariance check uses this)."""
    return lineage.groupBy("stage").agg(
        F.count("*").alias("n_partitions"), F.sum("rows").alias("rows_total")
    )
