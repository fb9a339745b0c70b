"""Bucketed co-located join — the 100 TB layout for payloads ⨝ sequences.

Asserts (a) results identical to the generated-input pipeline, and (b) the
physical plan has NO exchange feeding the big-big join (bucketing removed
the shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.plans import pipeline as pl

N = 400
DB = "testbuck"


@pytest.fixture(scope="module")
def bucketed_db(spark):
    fx.materialize_input_bucketed(spark, N, db=DB, buckets=4,
                                  num_partitions=4)
    yield DB
    spark.sql(f"DROP TABLE IF EXISTS {DB}.payloads")
    spark.sql(f"DROP TABLE IF EXISTS {DB}.sequences")
    spark.sql(f"DROP DATABASE IF EXISTS {DB}")


def test_bucketed_join_skips_sequences_shuffle(spark, bucketed_db):
    """With broadcast disabled (at 10^12 rows neither side broadcasts), the
    bucketed+sorted sequences table — the token-heavy side — must join with
    NO exchange and NO sort of its own; only the payload side (already
    re-shuffled by the carry-forward window on stream_id) exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        st = pl.build_routed(spark, pl.PipelineConfig(input_db=bucketed_db))
        plan = st["spans"]._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan  # sequences scan uses bucket layout
        # exactly ONE doc_id exchange (payload side); bucketing removed the
        # sequences-side one
        assert plan.count("Exchange hashpartitioning(doc_id") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_results_equal_generated(spark, bucketed_db):
    def rows(cfg):
        st = pl.build_routed(spark, cfg)
        return sorted(
            (r.doc_id, r.rule_id, r.sink, tuple(r.tokens))
            for r in st["routed"].select(
                "doc_id", "rule_id", "sink", "tokens").collect())

    assert rows(pl.PipelineConfig(input_db=bucketed_db)) == rows(
        pl.PipelineConfig(n_rows=N))
