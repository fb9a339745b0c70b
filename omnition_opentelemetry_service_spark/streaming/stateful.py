"""Custom stateful streaming operator — applyInPandasWithState.

The reference's obsreport counters are long-lived process state updated per
batch (octrace/opencensus.go:183,196,206). The streaming twin: a per-source
running received/token count maintained as EXPLICIT group state across
micro-batches. This is the engine's custom-stateful extension surface —
anything the built-in windowed aggregates can't express (counters that never
expire, per-key session machines, ...) follows this shape.

Scale notes: state is partitioned by the group key (source — the hot-key
caveat applies; a high-cardinality key is the normal case), lives in the
state store, and survives restarts via checkpointLocation. Arrow-batched per
group per trigger — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "source string, received long, sum_n_tok long"
STATE_SCHEMA = "received long, sum_n_tok long"


def _update(key: tuple, pdfs: Iterator["pd.DataFrame"],
            state: GroupState) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    received, sum_n_tok = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        received += len(pdf)
        sum_n_tok += int(pdf["n_tok"].sum())
    state.update((received, sum_n_tok))
    yield pd.DataFrame({"source": [key[0]], "received": [received],
                        "sum_n_tok": [sum_n_tok]})


def running_source_counts(seq_stream: DataFrame) -> DataFrame:
    """Per-source running totals across ALL micro-batches (never expires —
    obsreport counters don't window)."""
    return seq_stream.groupBy("source").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_counts_once(spark, input_dir: str, checkpoint_dir: str,
                    out_table: str = "running_counts",
                    max_files_per_trigger: int = 2) -> DataFrame:
    """Drain the sequences table as micro-batches, maintaining the running
    counters; returns the final per-source rows (last update wins)."""
    from .stream_pipeline import SEQ_SCHEMA

    stream = (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{input_dir}/sequences")
    )
    counts = running_source_counts(stream.select("source", "n_tok"))
    q = (
        counts.writeStream.outputMode("update")
        .format("memory").queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends every emitted update. The counters the
    # stateful function emits are monotone non-decreasing per source, so the
    # FINAL value per source is simply the max — no reliance on cross-batch
    # scan order (which is an implementation detail, not a contract).
    from pyspark.sql import functions as F

    return (
        spark.table(out_table)
        .groupBy("source")
        .agg(F.max("received").alias("received"),
             F.max("sum_n_tok").alias("sum_n_tok"))
    )
