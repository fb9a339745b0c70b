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
                    max_files_per_trigger: int = 2) -> DataFrame:
    """Drain the sequences table as micro-batches, maintaining the running
    counters; returns the final per-source rows.

    The emitted updates are persisted to a parquet log INSIDE the
    checkpoint directory, not to a per-run memory sink: update mode only
    emits for keys that saw input in THIS run, so a resumed run with no (or
    partial) new data would report empty/partial totals from a memory table
    even though the true counters live on in the state store. The counters
    are monotone non-decreasing per source, so the final value per source
    is the max over the WHOLE log — re-runs and crash-redelivered batches
    only append dominated or duplicate rows, which the max ignores. The
    max-over-log rule is only sound while the log and the state store share
    a lifetime, which is WHY the log lives inside the checkpoint dir: a
    sibling path would survive a checkpoint reset and leak the old
    generation's (larger) counters into the fresh run's result."""
    import os

    from pyspark.sql import functions as F

    from .stream_pipeline import SEQ_SCHEMA

    stream = (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{input_dir}/sequences")
    )
    counts = running_source_counts(stream.select("source", "n_tok"))
    # inside the checkpoint dir (Spark only reads its own subdirs there), so
    # `rm -rf checkpoint_dir` resets state store and log TOGETHER
    updates_dir = os.path.join(checkpoint_dir, "_updates")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(updates_dir)

    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()  # release the checkpoint registration for resumed runs
    if not os.path.exists(updates_dir):  # zero batches ever emitted
        emitted = spark.createDataFrame([], OUT_SCHEMA)
    else:
        emitted = spark.read.parquet(updates_dir)
    return (
        emitted
        .groupBy("source")
        .agg(F.max("received").alias("received"),
             F.max("sum_n_tok").alias("sum_n_tok"))
    )


# ---------------------------------------------------------------------------
# Streaming packer — with_pack_id's stateful twin
# ---------------------------------------------------------------------------
PACK_OUT_SCHEMA = ("doc_id string, source string, seq_no bigint, n_tok int, "
                   "pack_id bigint")
PACK_STATE_SCHEMA = "off bigint"


def streaming_pack_ids(seq_stream: DataFrame, budget: int = 2048) -> DataFrame:
    """packing.with_pack_id as a streaming stage: the per-source running
    token offset lives in the state store, so pack ids CONTINUE across
    micro-batches and restarts — a fed-forever ingest packs into the same
    bins a one-shot batch run would produce (pytest-pinned equality).

    Contract: in-order delivery per source ACROSS triggers (the log-stream
    assumption; seq_no is the arrival order). Within a trigger the kernel
    sorts its Arrow batch by seq_no, so intra-batch file ordering is free;
    cross-trigger reordering is the feed's responsibility, exactly as in
    the batch form where seq_no is the window order.

    Scale shape: state = ONE bigint per source (not per pack, not per
    row); emitted rows are append-mode (each input row exactly once per
    delivery). Hot-key caveat matches the batch form: one source = one
    state partition per trigger — the node_batches_scalable slicing applies
    upstream if a single source dominates a trigger.
    """
    def update(key: tuple, pdfs: Iterator["pd.DataFrame"],
               state: GroupState) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        off = state.get[0] if state.exists else 0
        chunks = [c for c in pdfs if len(c)]
        if not chunks:  # zero-data invocation (e.g. a future timeout path):
            state.update((off,))  # keep state, emit nothing — and never
            return                # feed pd.concat an empty list (it raises)
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values("seq_no", kind="mergesort", ignore_index=True)
        n = pdf["n_tok"].astype("int64")
        starts = off + n.cumsum() - n
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"], "source": pdf["source"],
            "seq_no": pdf["seq_no"].astype("int64"),
            "n_tok": pdf["n_tok"].astype("int32"),
            "pack_id": (starts // budget).astype("int64"),
        })
        state.update((int(off + int(n.sum())),))
        yield out

    return seq_stream.groupBy("source").applyInPandasWithState(
        update,
        outputStructType=PACK_OUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_pack_once(spark, input_dir: str, checkpoint_dir: str,
                  budget: int = 2048) -> DataFrame:
    """Drain <input_dir>/sequences as one availableNow pass through the
    streaming packer; assignments land in a parquet log inside the
    checkpoint dir (same lifetime-coupling rationale as run_counts_once),
    IDEMPOTENT on the checkpointed batch id: each batch owns
    ``_packs/batch_id=N`` and crash-redelivery overwrites it in place —
    a bare append would duplicate every redelivered row in the returned
    log (the stream_pipeline envelope-sink recipe; batch ids never reset
    within a checkpoint lifetime, and log and state store share the
    checkpoint dir's lifetime so neither can outlive the other).
    Returns the full log — re-running after adding input files CONTINUES
    the running offsets from the state store."""
    import os

    from .stream_pipeline import SEQ_SCHEMA

    stream = (
        spark.readStream.schema(SEQ_SCHEMA)
        .parquet(f"{input_dir}/sequences")
    )
    packed = streaming_pack_ids(stream.select(
        "doc_id", "source", "seq_no", "n_tok"), budget=budget)
    updates_dir = os.path.join(checkpoint_dir, "_packs")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(updates_dir, f"batch_id={batch_id}"))

    q = (
        packed.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    if not os.path.exists(updates_dir):
        return spark.createDataFrame([], PACK_OUT_SCHEMA)
    # batch_id is the partition-discovery column from the idempotent
    # per-batch dirs — sink bookkeeping, not part of the pack contract
    return spark.read.parquet(updates_dir).drop("batch_id")
