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
