"""Explicit shuffle/batch semantics — node-batcher + skew handling.

Reference: the node-batcher processor re-buckets spans per Node into
size-bounded batches (components.go:69). Spark analog: repartition on the
batch key so each output file/sink batch is key-local. The fixture's
``source`` key is deliberately hot (60% 'web'), so the naive repartition
skews; the salted two-phase aggregate is the scale-path fix (SURVEY.md §4
"hot-key skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_by_key(df: DataFrame, key: str = "source", num_partitions: int | None = None,
                 salt_buckets: int = 0) -> DataFrame:
    """Repartition by key; with salt_buckets > 0 the hot key is spread over
    N sub-buckets (batch size cap analog: no single task owns all of 'web')."""
    if salt_buckets > 0:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)).cast("int")
        )
        out = (salted.repartition(num_partitions, key, "_salt")
               if num_partitions else salted.repartition(key, "_salt"))
        return out.drop("_salt")
    return df.repartition(num_partitions, key) if num_partitions else df.repartition(key)


def node_batches(df: DataFrame, batch_size: int = 100,
                 key: str = "stream_id", order: str = "msg_seq") -> DataFrame:
    """The node-batcher's literal semantics (components.go:69): re-bucket
    rows per Node/stream into size-bounded batches, implemented as a grouped
    applyInPandas — the engine's custom grouped-operator extension surface
    (Arrow batch per group; sort + integer-divide, all vectorized numpy).
    Equivalent SQL (the oracle): (row_number() per stream − 1) div size."""
    import numpy as np  # noqa: F401  (executors)

    def assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(order)
        pdf["batch_no"] = (np.arange(len(pdf)) // batch_size).astype("int32")
        return pdf[["doc_id", key, order, "batch_no"]]

    return df.groupBy(key).applyInPandas(
        assign,
        schema=f"doc_id string, {key} int, {order} int, batch_no int")


def salted_counts(df: DataFrame, key: str = "source", salt_buckets: int = 32) -> DataFrame:
    """Two-phase aggregate for hot keys: partial per (key, salt) → final per
    key. Results are identical to a plain groupBy (validated by oracle); the
    point is that phase-1 spreads the hot key across `salt_buckets` tasks.

    (Spark's hash aggregate already does map-side partials; explicit salting
    additionally splits the *reduce* side of a hot key, which partials can't.)
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_c"), F.sum("n_tok").alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_c").alias("n_rows"), F.sum("_s").alias("sum_n_tok")
    )
