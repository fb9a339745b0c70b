"""Tag-driven fan-out router — the exporter-pipeline analog.

Reference semantics: one pipeline lists multiple exporters and EVERY batch
goes to ALL of them (pipeline fan-out, e.g. exporter/kinesis/testdata/
config.yaml:35-39); the probabilistic sampler keeps a span iff
hash(traceId) scaled to [0,10000) < pct*100 (components.go:70, deterministic
per trace — no RNG).

Spark-first design: fan-out is NOT a loop of writes over collect()ed rows —
it is a single broadcast theta-join of the fact table against the (tiny)
rules table, producing one output row per (sequence, matched rule). One
shuffle-free pass; the optional per-sink writes then use
``partitionBy("sink")`` so a single job materializes every sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..fixtures import SAMPLE_MOD, sample_hash_sql


def sampler_pass(seq_col: str = "seq_no", rule_col: str = "rule_id",
                 pct_col: str = "sample_pct"):
    """Deterministic sampler predicate: keep iff LCG-hash(seq, rule) scaled
    to [0,10000) < floor(pct*100). Engine-portable (same arithmetic in
    DuckDB) — floor BEFORE the cast: Spark's double→bigint cast truncates
    while DuckDB's rounds half-up, so a non-integral pct*100 (e.g.
    0.29*100 = 28.999999999999996) would keep one more hash bucket in the
    oracle than in Spark without it."""
    return F.expr(
        f"{sample_hash_sql(seq_col, rule_col)} < "
        f"CAST(floor({pct_col} * {SAMPLE_MOD / 100.0:.0f}) AS BIGINT)")


def route(facts: DataFrame, rules: DataFrame) -> DataFrame:
    """Fan-out: one output row per (row, matching rule). Rules are broadcast;
    the join condition is a theta-join evaluated map-side (BroadcastNestedLoop
    over a 5-row build side — constant cost per row, no shuffle)."""
    cond = (
        ((rules["predicate_source"] == "*") | (rules["predicate_source"] == facts["source"]))
        & (facts["n_tok"] >= rules["min_n_tok"])
    )
    routed = facts.join(broadcast(rules), cond, "inner")
    return routed.filter(sampler_pass()).drop("predicate_source", "min_n_tok", "sample_pct")


def sink_counts(routed: DataFrame) -> DataFrame:
    """Per-sink aggregate counts — the per-node span-count assertion analog
    (TestExportMultiplexing, octrace/opencensus_test.go:256-271). Partial
    (map-side) aggregation applies automatically; at scale this is the cheap
    side-output every sink write also validates against."""
    return routed.groupBy("sink").agg(
        F.count("*").alias("n_rows"),
        F.sum("n_tok").alias("sum_n_tok"),
    )


def write_sinks(routed: DataFrame, base_path: str, fmt: str = "parquet") -> None:
    """Materialize every sink in ONE job: dynamic partition write by sink.
    (vs N filtered writes: N full scans — only acceptable with a cached DF;
    at 100 TB the partitioned single pass wins.)

    The exchange keys on (sink, doc_id), NOT sink alone: a bare
    repartition("sink") caps the whole write at #distinct-sinks tasks
    (~5 here) and serializes the hot sink's tens of TB through one task.
    Salting with doc_id spreads each sink across the full task set;
    partitionBy still segregates the output directories."""
    spark = routed.sparkSession
    (
        routed.repartition(spark.sparkContext.defaultParallelism,
                           "sink", "doc_id")
        .write.mode("overwrite")
        .partitionBy("sink")
        .format(fmt)
        .save(base_path)
    )
