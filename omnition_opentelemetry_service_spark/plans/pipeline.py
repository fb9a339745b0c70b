"""The flagship parse → enrich → route → aggregate pipeline.

Maps the reference's configured consumer chain (receivers → processors →
exporters, wired back-to-front by service startup, main.go:32-37 +
components.go:39-77) onto one declarative DataFrame DAG:

    raw payloads ──parse(grok, vectorized)──► good / quarantined   [receiver]
    good ──carry-forward node_host──► spans with node identity      [node mux]
    ⨝ sequences (tokens) on doc_id                                  [payload]
    ⨝ broadcast(source_dim)                                         [enrich]
    ⨝ broadcast(route_rules) + sampler                              [route]
    ──► per-sink writes + sink_counts + counters + lineage          [export]

Every stage optionally commits a snapshot (sinks/snapshot.py) so a killed
run resumes from the last committed stage — the queued-retry/replay analog.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..functions import parse as parse_fns
from ..metrics import StageCounters, lineage_summary, with_lineage
from ..operators.batcher import salted_counts
from ..operators.carryforward import carry_forward
from ..operators.enrich import enrich_with_dim
from ..operators.router import route, sink_counts
from ..sinks.snapshot import SnapshotTable

# Config validation sentinels (pattern: exact error strings,
# memorylimiter.go:39-49 / config golden tests SURVEY.md §5.1-5.2).
ERR_BAD_PARSE_IMPL = "parse_impl must be one of: native, pandas"
ERR_NO_INPUT = "either n_rows or sf_dir must be set"
ERR_BAD_SALT = "salt_buckets must be >= 0"


@dataclass
class PipelineConfig:
    n_rows: int | None = None
    sf_dir: str | None = None
    input_dir: str | None = None  # materialized payloads/ + sequences/ parquet
    input_db: str | None = None  # bucketed catalog tables (<db>.payloads/...)
    parse_impl: str = "native"
    salt_buckets: int = 32
    checkpoint_dir: str | None = None
    write_sinks_dir: str | None = None
    num_partitions: int | None = None
    sinks: list[str] = field(default_factory=list)

    def validate(self) -> None:
        if self.parse_impl not in ("native", "pandas"):
            raise ValueError(ERR_BAD_PARSE_IMPL)
        if (self.n_rows is None and self.sf_dir is None
                and self.input_dir is None and self.input_db is None):
            raise ValueError(ERR_NO_INPUT)
        if self.salt_buckets < 0:
            raise ValueError(ERR_BAD_SALT)

    @property
    def n(self) -> int:
        if self.n_rows is not None:
            return self.n_rows
        return fixtures.n_rows_for_sf_dir(self.sf_dir)


def build_routed(spark: SparkSession, cfg: PipelineConfig) -> dict[str, DataFrame]:
    """Compose the full DAG lazily; returns named stage DataFrames."""
    cfg.validate()

    if cfg.input_db:
        # Bucketed-by-doc_id catalog tables: the payload ⨝ sequences join
        # runs exchange-free on both sides (fixtures.materialize_input_bucketed).
        payloads = spark.table(f"{cfg.input_db}.payloads")
        seqs = spark.table(f"{cfg.input_db}.sequences")
    elif cfg.input_dir:
        # The scale path: scan the materialized token table (Iceberg/parquet
        # at 10^12 rows) — filters and column pruning push into the scan.
        payloads = spark.read.parquet(f"{cfg.input_dir}/payloads")
        seqs = spark.read.parquet(f"{cfg.input_dir}/sequences")
    else:
        n = cfg.n
        payloads = fixtures.raw_payloads(spark, n, cfg.num_partitions)
        seqs = fixtures.sequences(spark, n, cfg.num_partitions)
    dim = fixtures.source_dim(spark)
    rules = fixtures.route_rules(spark)

    parse = (parse_fns.parse_payload_native if cfg.parse_impl == "native"
             else parse_fns.parse_payload_pandas)
    parsed = parse(payloads)
    stages = build_from_parsed(spark, parsed, seqs, dim, rules)
    stages["payloads"] = payloads
    return stages


def build_from_parsed(spark: SparkSession, parsed: DataFrame,
                      seqs: DataFrame, dim: DataFrame,
                      rules: DataFrame) -> dict[str, DataFrame]:
    """Stages downstream of parse — split out so resume can rebuild from a
    committed parsed snapshot instead of re-parsing."""
    good, quarantined = parse_fns.quarantine_split(parsed)
    good = carry_forward(good)

    # payload ⨝ sequences: big-big equi-join on doc_id. At 10^12 rows both
    # sides are bucketed by doc_id in storage so this is a co-located join;
    # here it is a plain shuffle hash join under AQE.
    spans = good.select(
        "doc_id", "stream_id", "msg_seq", "node_host_filled",
        "ts_str", "host", "lvl", "trace_hex",
    ).join(seqs, "doc_id")

    enriched = enrich_with_dim(spans, dim, key="source", how="left")
    routed = route(enriched, rules)
    return {
        "parsed": parsed,
        "quarantined": quarantined,
        "spans": spans,
        "enriched": enriched,
        "routed": routed,
    }


def run_pipeline(spark: SparkSession, cfg: PipelineConfig,
                 fail_after: str | None = None) -> dict:
    """Execute with counters, lineage, optional per-stage snapshot commits.

    With ``checkpoint_dir`` set, EVERY major stage (parsed, routed) commits a
    snapshot; a re-run skips any stage whose snapshot is committed and
    rebuilds downstream from it — kill-anywhere resumability (the
    queued-retry replay analog). ``fail_after`` injects a crash right after
    the named stage's commit (test seam for the kill-mid-pipeline test;
    pattern: injected state, memorylimiter_test.go:104-157).

    Returns dict with 'routed' (DataFrame), 'sink_counts' (list of Rows),
    'counters' (list of tuples), 'lineage' (DataFrame of per-stage totals).
    """
    cfg.validate()
    counters = StageCounters()

    resumed_parse = False
    if cfg.checkpoint_dir:
        t_parsed = SnapshotTable(os.path.join(cfg.checkpoint_dir, "parsed"))
        if t_parsed.has_stage("parsed"):
            parsed = t_parsed.read(spark)  # resume: skip the parse stage
            resumed_parse = True
        else:
            stages0 = build_routed(spark, cfg)
            t_parsed.write(stages0["parsed"], stage="parsed")
            parsed = t_parsed.read(spark)
        if fail_after == "parsed":
            raise RuntimeError("injected failure after stage: parsed")
        n_parts = cfg.num_partitions
        seqs = (spark.table(f"{cfg.input_db}.sequences") if cfg.input_db
                else spark.read.parquet(f"{cfg.input_dir}/sequences")
                if cfg.input_dir
                else fixtures.sequences(spark, cfg.n, n_parts))
        stages = build_from_parsed(spark, parsed, seqs,
                                   fixtures.source_dim(spark),
                                   fixtures.route_rules(spark))
    else:
        stages = build_routed(spark, cfg)

    # Counters measured in the same pass as the aggregate action (observe).
    parsed_obs = counters.observe_stage(
        stages["parsed"], "parse", "oc_trace", drop_predicate=~F.col("valid")
    )
    good = parsed_obs.filter(F.col("valid"))

    routed = stages["routed"]
    if cfg.checkpoint_dir:
        table = SnapshotTable(os.path.join(cfg.checkpoint_dir, "routed"))
        if table.has_stage("routed"):
            routed = table.read(spark)  # resume: skip recompute
        else:
            table.write(routed, stage="routed", partition_by=["sink"])
            routed = table.read(spark)
        if fail_after == "routed":
            raise RuntimeError("injected failure after stage: routed")

    routed, lineage = with_lineage(routed, "route")

    counts = sink_counts(routed).collect()
    # Trigger the observed parse branch with a cheap count so counters fill.
    good.count()
    harvested = counters.harvest()

    if cfg.write_sinks_dir:
        (routed.repartition("sink").write.mode("overwrite")
         .partitionBy("sink").parquet(cfg.write_sinks_dir))

    return {
        "routed": routed,
        "sink_counts": counts,
        "counters": harvested,
        "lineage": lineage_summary(lineage),
        "salted_source_counts": salted_counts(
            stages["enriched"], "source", cfg.salt_buckets or 1),
    }
