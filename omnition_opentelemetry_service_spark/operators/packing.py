"""Sequence packing — assemble pre-tokenized sequences into fixed-token-
budget training bins.

A training-data op beyond the reference (its pipeline forwards spans; a
token pipeline at 10^12 sequences must also pack them into context-length
bins for the trainer). Deterministic, shuffle-minimal formulation:

    pack_id = floor(running_token_count_before_row / budget)
    (per source, ordered by seq_no)

i.e. cumulative-sum binning: a sequence goes to the bin its running offset
falls in. Bins can overflow by at most one sequence (the standard streaming-
packing approximation — greedy first-fit would need per-bin state and can't
parallelize); overflow is visible in the per-bin stats and bounded by
max(n_tok).

Scale shape: ONE hash-exchange on source + in-partition running sum (window
over high-cardinality key). No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_pack_id(seqs: DataFrame, budget: int = 2048,
                 key: str = "source", order: str = "seq_no") -> DataFrame:
    w = (Window.partitionBy(key).orderBy(order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offset = F.sum("n_tok").over(w) - F.col("n_tok")
    return seqs.withColumn(
        "pack_id", F.floor(offset / F.lit(budget)).cast("long"))


def pack_stats(seqs_with_pack: DataFrame, key: str = "source") -> DataFrame:
    """Per-bin fill statistics — the packing-efficiency surface."""
    return (
        seqs_with_pack.groupBy(key, "pack_id")
        .agg(F.count(F.lit(1)).alias("n_seqs"),
             F.sum("n_tok").alias("pack_tokens"))
    )
