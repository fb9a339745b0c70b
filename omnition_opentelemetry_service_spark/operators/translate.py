"""Per-sink format translation — the exporter-side encoding stage.

Reference: the kinesis exporter does NOT forward the internal representation;
it translates OC proto → Jaeger proto per batch before writing
(exporter/kinesis/exporter.go:33-52 — translation at :34, per-span process
fill at :42-44), while the opencensus exporter forwards pass-through. The
Spark analog: each sink gets its own projection/encoding of the routed
table, not one shared schema.

Two surfaces:

- ``translate_for_sink(routed, sink)`` — typed per-sink DataFrame (the
  oracle-checked form; e2e tests assert every sink's schema).
- ``encode_envelope(routed)`` — the 100 TB write path: every sink's payload
  encoded (to_json of its translated struct) into ONE common
  (sink, doc_id, payload) envelope so a single ``partitionBy("sink")`` job
  materializes all sinks in one pass — N typed writes would re-scan the
  routed table N times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .enrich import fill_process

# sink → translation kind (fixtures.ROUTE_RULES sinks)
SINK_FORMATS = {
    "sink_kinesis": "jaeger",      # translated: renamed/packed span schema
    "sink_oc": "passthrough",      # forward the internal representation
    "sink_archive": "passthrough",
    "sink_metrics": "metrics",     # payload-free: metrics sinks carry no tokens
    "sink_logging": "debug",       # sampled debug rows (see logging_sample)
}

PASSTHROUGH_COLS = [
    "doc_id", "seq_no", "source", "n_tok", "tokens",
    "tenant", "priority", "rule_id", "sink",
]


def operation_expr() -> F.Column:
    """THE jaeger operation-name rule, shared by translate_jaeger and
    encode_envelope: coalesce-to-'' per side makes NULL handling EXPLICIT
    and engine-identical — concat_ws skips NULLs without the separator
    (source NULL, lvl='info' → 'info') while DuckDB's concat keeps it
    ('/info'); the twin (registry sink_translated) spells the identical
    coalesce form."""
    return F.concat(F.coalesce(F.col("source"), F.lit("")), F.lit("/"),
                    F.coalesce(F.col("lvl"), F.lit("")))


def translate_jaeger(routed: DataFrame) -> DataFrame:
    """OC → Jaeger-analog projection (exporter/kinesis/exporter.go:33-44):
    ids renamed/packed, operation name composed, per-span process filled from
    the batch-level value when the span has none (fill_process)."""
    filled = fill_process(routed, "node_host_filled", "host", "process")
    return filled.select(
        "doc_id",
        F.col("trace_hex").alias("trace_id"),
        F.lpad(F.lower(F.hex(F.col("seq_no"))), 16, "0").alias("span_id"),
        operation_expr().alias("operation"),
        "process",
        F.col("ts_str").alias("start_ts"),
        "n_tok",
        "tenant",
    )


def translate_metrics(routed: DataFrame) -> DataFrame:
    """Metrics-sink projection: dimensions + measures only, never payloads
    (the prometheus exporter ships aggregates, not spans)."""
    return routed.select("doc_id", "source", "tenant", "priority", "n_tok")


def translate_for_sink(routed: DataFrame, sink: str) -> DataFrame:
    """Rows bound for ``sink``, in that sink's wire schema."""
    rows = routed.filter(F.col("sink") == sink)
    kind = SINK_FORMATS.get(sink, "passthrough")
    if kind == "jaeger":
        return translate_jaeger(rows)
    if kind == "metrics":
        return translate_metrics(rows)
    # passthrough / debug: the internal representation
    return rows.select(*PASSTHROUGH_COLS)


def logging_sample(routed: DataFrame, k: int = 100,
                   sink: str = "sink_logging") -> DataFrame:
    """Logging-exporter analog (reference components.go:58): a deterministic
    debug sample — stable total order, first k rows. ORDER BY + LIMIT is a
    TakeOrderedAndProject: per-partition top-k then a driver merge of k·P
    rows, no global sort — safe at any scale."""
    return (
        routed.filter(F.col("sink") == sink)
        .orderBy("doc_id", "rule_id")
        .limit(k)
        .select("doc_id", "rule_id", "source", "lvl", "n_tok")
    )


def encode_envelope(routed: DataFrame) -> DataFrame:
    """Single-pass all-sinks encoding: per-sink translated struct serialized
    to JSON in a common (sink, doc_id, payload) envelope. One
    partitionBy("sink") write materializes every sink without re-scanning."""
    filled = fill_process(routed, "node_host_filled", "host", "process")
    jaeger = F.to_json(F.struct(
        F.col("trace_hex").alias("trace_id"),
        F.lpad(F.lower(F.hex(F.col("seq_no"))), 16, "0").alias("span_id"),
        operation_expr().alias("operation"),
        "process",
        F.col("ts_str").alias("start_ts"),
        "n_tok",
        "tenant",  # translate_for_sink emits it; the envelope must not
    ))             # silently drop a field the typed wire schema carries
    metrics = F.to_json(F.struct("source", "tenant", "priority", "n_tok"))
    passthrough = F.to_json(F.struct(
        "seq_no", "source", "n_tok", "tokens", "tenant", "priority", "rule_id"))
    payload = (
        F.when(F.col("sink") == "sink_kinesis", jaeger)
        .when(F.col("sink") == "sink_metrics", metrics)
        .otherwise(passthrough)
    )
    return filled.select("sink", "doc_id", payload.alias("payload"))


def write_sinks_translated(routed: DataFrame, base_path: str,
                           fmt: str = "parquet") -> None:
    """Materialize every sink in its wire format in ONE job. Exchange keyed
    (sink, doc_id) — not sink alone, which would cap the write at
    #sinks tasks (see router.write_sinks)."""
    from .router import write_sinks

    # ONE write recipe (router.write_sinks): the salted (sink, doc_id)
    # exchange + partitionBy live in a single place — a fix to the write
    # shape cannot diverge between the envelope and passthrough paths
    write_sinks(encode_envelope(routed), base_path, fmt)
