"""Node/Resource carry-forward — the "node multiplexing" analog.

Reference: on a gRPC stream, Node/Resource from an earlier message *stick*
until replaced (octrace/opencensus.go:149-175; behavior pinned by
TestExportMultiplexing, octrace/opencensus_test.go:172-304). In batch form
this is a last-non-null fill-forward window per stream.

Scale note: the window partitions by stream_id, so the shuffle is one
hash-exchange on a high-cardinality key — no global sort. At 10^12 rows the
per-stream ordering column (msg_seq) is already monotone within ingest files,
so AQE + range-partition locality keeps partitions balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def carry_forward(
    df: DataFrame,
    value_col: str = "node_host",
    stream_col: str = "stream_id",
    order_col: str = "msg_seq",
    out_col: str = "node_host_filled",
) -> DataFrame:
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def carry_forward_scalable(
    df: DataFrame,
    value_col: str = "node_host",
    stream_col: str = "stream_id",
    order_col: str = "msg_seq",
    out_col: str = "node_host_filled",
    slice_rows: int = 1 << 16,
) -> DataFrame:
    """Fill-forward whose parallelism is bounded by DATA SIZE, not by stream
    count — the 10^12-row path when streams are few and huge (the plain
    window puts one entire stream on one task).

    The stream is cut into bounded SLICES keyed by the data itself
    (``slice = order_col div slice_rows`` — deterministic; a physical
    `spark_partition_id` would differ between AQE re-executions of the
    reused subtree and corrupt the carry). Then:
      1. local fill: window over (stream, slice) — a huge stream spans
         many slices, so many tasks;
      2. per-(stream, slice) boundary value: tiny `max_by` aggregate;
      3. carry-in per slice = last boundary of any earlier slice (window
         over the tiny boundary table), broadcast-joined back and coalesced
         under the local fill.

    Identical output to carry_forward (pinned by tests across slice sizes,
    leading-null and all-null slices included).
    """
    sliced = df.withColumn(
        "_slice", (F.col(order_col) / F.lit(slice_rows)).cast("long"))
    w_local = (
        Window.partitionBy(stream_col, "_slice")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sliced.withColumn(
        "_local_fill", F.last(value_col, ignorenulls=True).over(w_local))

    # ONE aggregate yields the full slice grid AND each slice's boundary
    # value: max_by's ordering key is NULL-masked, so all-null slices
    # appear with a NULL boundary (max_by ignores NULL keys) — the
    # separate filtered-bounds aggregate + distinct-grid + join shape
    # scanned the unsliced input twice more for the same rows.
    bounds_grid = (
        sliced.groupBy(stream_col, "_slice")
        .agg(F.max_by(
            value_col,
            F.when(F.col(value_col).isNotNull(), F.col(order_col)))
            .alias("_last_val"))
    )
    w_grid = (
        Window.partitionBy(stream_col).orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bounds_grid.select(
        stream_col, "_slice",
        F.last("_last_val", ignorenulls=True).over(w_grid).alias("_carry"))

    # No broadcast HINT: the carry table is rows/slice_rows — it grows
    # linearly with the data (at 10^12 rows it's ~1.5e7 entries), so forcing
    # a driver-side broadcast build would OOM exactly at the scale this
    # function exists for. AQE broadcasts it when it measures small and
    # shuffle-joins on (stream, _slice) when it doesn't.
    return (
        local.join(carry, [stream_col, "_slice"], "left")
        .withColumn(out_col, F.coalesce("_local_fill", "_carry"))
        .drop("_slice", "_local_fill", "_carry")
    )
