"""Sketch aggregations — the mergeable-partial-aggregate family a 100 TB
pipeline leans on when exact answers are too expensive to shuffle.

Reference analog: the collector's counters are exact Sums/Counts
(processor/memorylimiter/metrics.go:33-59) because its unit is a batch; at
10^12 sequences the interesting aggregates (distinct tokens, frequency
ranks, latency quantiles) need sub-linear state. Every operator here is a
one-pass map-side-combinable aggregate whose state is a fixed-size sketch:

- distinct counts      — HLL++ (approx_count_distinct) and DataSketches HLL
                         (hll_sketch_agg), the latter RE-AGGREGATABLE: the
                         binary sketches union losslessly (hll_union_agg),
                         so per-source sketches roll up to a global count
                         without rescanning — the continuous-aggregate
                         pattern.
- quantiles            — percentile_approx (GK sketch), rank error ≤ 1/acc.
- frequent items       — DataFrame.freqItems (no false negatives at the
                         given support) and count_min_sketch, a binary,
                         mergeable frequency sketch queried driver-side;
                         CMS guarantees est ≥ true and, with prob ≥ conf,
                         est ≤ true + eps·N.

Error contracts are pinned against EXACT twins in tests/test_sketches.py —
the oracle pattern for operators whose outputs are intentionally
approximate (a value-hash gate would be meaningless here, so these are
in-suite-verified extras rather than driver slots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def distinct_tokens_approx(seqs: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Per-source approximate distinct-token count (HLL++). One explode +
    one partial-aggregated exchange of fixed-size HLL state per (source);
    the exact form shuffles every distinct (source, token) pair."""
    return (
        seqs.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.approx_count_distinct("tok", rsd).alias("approx_distinct"))
    )


def distinct_tokens_exact(seqs: DataFrame) -> DataFrame:
    """Exact twin (the error-bound oracle)."""
    return (
        seqs.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("exact_distinct"))
    )


def distinct_tokens_hll_rollup(seqs: DataFrame) -> DataFrame:
    """The re-aggregation pattern: build one DataSketches HLL PER SOURCE,
    then union the binary sketches into the global distinct count WITHOUT
    touching the token data again. At scale the per-source sketch table is
    the materialized rollup; any grouping coarser than `source` derives
    from it by sketch union alone."""
    per_source = (
        seqs.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.hll_sketch_agg("tok").alias("sketch"))
    )
    return per_source.agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch")))
        .cast("long").alias("global_distinct"))


def token_length_quantiles_approx(seqs: DataFrame,
                                  accuracy: int = 10_000) -> DataFrame:
    """Per-source approximate n_tok quartiles (GK sketch): rank error
    ≤ 1/accuracy of the group size, state O(accuracy) per group."""
    return seqs.groupBy("source").agg(
        F.percentile_approx("n_tok", [0.25, 0.5, 0.75], accuracy)
        .alias("quartiles_approx"))


def frequent_tokens(seqs: DataFrame, support: float = 0.01) -> list[int]:
    """Tokens appearing in MORE THAN a support fraction of token
    positions (single-pass, no shuffle of per-token counts). freqItems /
    Misra-Gries guarantee is STRICT: every token with frequency
    strictly > support is returned (no false negatives above the
    threshold); a token at exactly support*N can be evicted. False
    positives are possible and callers verify with one exact pass over
    the (tiny) candidate set."""
    toks = seqs.select(F.explode("tokens").alias("tok"))
    [row] = toks.freqItems(["tok"], support).collect()
    return sorted(row[0])


def token_count_min_sketch(seqs: DataFrame, eps: float = 0.001,
                           confidence: float = 0.99,
                           seed: int = 42) -> bytes:
    """Binary count-min sketch of the token-frequency distribution: one
    pass, fixed O(1/eps · log 1/δ) state, map-side mergeable. Guarantees:
    estimate ≥ true count always; estimate ≤ true + eps·N with probability
    ≥ confidence."""
    [row] = (seqs.select(F.explode("tokens").alias("tok"))
             .agg(F.count_min_sketch(
                 "tok", F.lit(eps), F.lit(confidence), F.lit(seed))
                 .alias("cms")).collect())
    return bytes(row.cms)


def cms_estimate(spark: SparkSession, sketch: bytes, item: int) -> int:
    """Query a serialized CMS driver-side (the sketch is the artifact a
    production pipeline ships to its serving tier; Spark's JVM sketch
    class reads the same wire format it wrote)."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(sketch)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return cms.estimateCount(item)
