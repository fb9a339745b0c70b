"""Explicit shuffle/batch semantics — node-batcher + skew handling.

Reference: the node-batcher processor re-buckets spans per Node into
size-bounded batches (components.go:69). Spark analog: repartition on the
batch key so each output file/sink batch is key-local. The fixture's
``source`` key is deliberately hot (60% 'web'), so the naive repartition
skews; the salted two-phase aggregate is the scale-path fix (SURVEY.md §4
"hot-key skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _salt_expr(salt_col: str, salt_buckets: int) -> F.Column:
    """THE salt derivation (one definition — batch_by_key and
    salted_counts must stay bit-identical for their skew behavior and any
    oracle twin to agree)."""
    return F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets)).cast("int")


def batch_by_key(df: DataFrame, key: str = "source", num_partitions: int | None = None,
                 salt_buckets: int = 0, salt_col: str = "doc_id") -> DataFrame:
    """Repartition by key; with salt_buckets > 0 the hot key is spread over
    N sub-buckets (batch size cap analog: no single task owns all of 'web').
    ``salt_col`` is the row-identity column the salt hashes — parameterized
    so the operator works on any table, not just ones carrying doc_id."""
    if salt_buckets > 0:
        salted = df.withColumn(
            "_salt", _salt_expr(salt_col, salt_buckets))
        out = (salted.repartition(num_partitions, key, "_salt")
               if num_partitions else salted.repartition(key, "_salt"))
        return out.drop("_salt")
    return df.repartition(num_partitions, key) if num_partitions else df.repartition(key)


def node_batches(df: DataFrame, batch_size: int = 100,
                 key: str = "stream_id", order: str = "msg_seq") -> DataFrame:
    """The node-batcher's semantics (components.go:69): re-bucket rows per
    Node/stream into size-bounded batches. Native window form — exactly its
    own oracle SQL: (row_number() per stream ORDER BY order − 1) div size.
    All JVM-side (whole-stage codegen + window exec), no Arrow/Python.

    Caveat shared with any per-key window: one stream = one task. Fine for
    the reference's workload (streams are gRPC connections, ~thousands of
    modest streams); for a single giant stream use node_batches_scalable."""
    w = Window.partitionBy(key).orderBy(order)
    return df.select("doc_id", key, order).withColumn(
        "batch_no",
        ((F.row_number().over(w) - 1) / batch_size).cast("bigint"))


def node_batches_scalable(df: DataFrame, batch_size: int = 100,
                          key: str = "stream_id", order: str = "msg_seq",
                          slice_rows: int = 100_000) -> DataFrame:
    """node_batches for the degenerate-key case: a stream too large for one
    task. Same output, bounded parallelism:

    1. slice the order domain: _slice = order div slice_rows — derived from
       DATA, not spark_partition_id() (which is unstable under AQE re-use);
    2. rank within (key, _slice) — each window partition holds ≤ slice_rows;
    3. per-slice counts roll up through a tiny window over the slice table
       (rows ≈ n/slice_rows) into cumulative offsets;
    4. global row number = offset + in-slice rank → batch id.

    Two exchanges on (key, _slice) — both bounded — instead of one unbounded
    exchange on key (the carry_forward_scalable pattern)."""
    sliced = df.select("doc_id", key, order).withColumn(
        "_slice", (F.col(order) / F.lit(slice_rows)).cast("bigint"))
    w_in = Window.partitionBy(key, "_slice").orderBy(order)
    ranked = sliced.withColumn("_rk", F.row_number().over(w_in))

    counts = sliced.groupBy(key, "_slice").agg(F.count("*").alias("_c"))
    w_cum = (Window.partitionBy(key).orderBy("_slice")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_cum), F.lit(0))).drop("_c")

    return (
        ranked.join(offsets, [key, "_slice"])
        .withColumn("batch_no",
                    # bigint: a single stream past ~2.1e11 rows at
                    # batch_size=100 overflows int32 — ANSI raises, non-ANSI
                    # silently wraps to negative batch ids
                    ((F.col("_off") + F.col("_rk") - 1) / batch_size)
                    .cast("bigint"))
        .drop("_slice", "_rk", "_off")
    )


def node_batches_grouped(df: DataFrame, batch_size: int = 100,
                         key: str = "stream_id", order: str = "msg_seq") -> DataFrame:
    """Grouped-applyInPandas form of node_batches — kept as the engine's
    custom grouped-operator EXTENSION-SURFACE demo (Arrow batch per group;
    sort + integer-divide, vectorized numpy). Same output as node_batches;
    not the default because it pays Arrow+Python for window-expressible
    semantics and serializes each stream onto one task."""
    def assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(order)
        pdf["batch_no"] = (np.arange(len(pdf)) // batch_size).astype("int64")
        return pdf[["doc_id", key, order, "batch_no"]]

    return df.groupBy(key).applyInPandas(
        assign,
        schema=f"doc_id string, {key} int, {order} int, batch_no bigint")


def salted_counts(df: DataFrame, key: str = "source", salt_buckets: int = 32,
                  salt_col: str = "doc_id",
                  sum_col: str = "n_tok") -> DataFrame:
    """Two-phase aggregate for hot keys: partial per (key, salt) → final per
    key. Results are identical to a plain groupBy (validated by oracle); the
    point is that phase-1 spreads the hot key across `salt_buckets` tasks.
    ``salt_col``/``sum_col`` parameterize the row identity and measure so
    the operator isn't welded to the token-table schema.

    (Spark's hash aggregate already does map-side partials; explicit salting
    additionally splits the *reduce* side of a hot key, which partials can't.)
    """
    salted = df.withColumn(
        "_salt", _salt_expr(salt_col, salt_buckets))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_c"), F.sum(sum_col).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_c").alias("n_rows"), F.sum("_s").alias("sum_n_tok")
    )
