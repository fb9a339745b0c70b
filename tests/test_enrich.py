"""Enrichment: broadcast join plan shape, attribute add/rename semantics
(add-attributes / attribute-key processors, components.go:66-67)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.operators.enrich import (
    attrs_add,
    attrs_rename,
    attrs_to_str,
    enrich_with_dim,
    fill_process,
)


def test_enrich_is_broadcast_hash_join(spark):
    """At 10^12 fact rows the dim join MUST be broadcast — assert the
    physical plan, not just the result."""
    out = enrich_with_dim(fx.sequences(spark, 100), fx.source_dim(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_enrich_values(spark):
    out = enrich_with_dim(fx.sequences(spark, 20), fx.source_dim(spark))
    for r in out.select("source", "tenant", "priority").collect():
        assert r.tenant == f"tenant-{fx.PRIORITY[r.source] % 4}"
        assert r.priority == fx.PRIORITY[r.source]


def test_enrich_left_join_keeps_unmatched(spark):
    facts = spark.createDataFrame([("unknown-src", 1)], "source string, n_tok int")
    out = enrich_with_dim(facts, fx.source_dim(spark)).collect()
    assert len(out) == 1 and out[0].tenant is None


def test_attrs_add_appends_and_overwrites(spark):
    dim = fx.source_dim(spark).filter(F.col("source") == "web")
    added = dim.select(
        attrs_to_str(attrs_add("attrs", {"env": "prod", "tier": "override"}))
        .alias("s")
    ).collect()[0].s
    assert added == "env=prod;team=team-web;tier=override"


def test_attrs_rename_keeps_values(spark):
    dim = fx.source_dim(spark).filter(F.col("source") == "code")
    out = dim.select(
        attrs_to_str(attrs_rename("attrs", {"team": "owner_team"})).alias("s")
    ).collect()[0].s
    assert out == "owner_team=team-code;tier=3"


def test_fill_process_coalesce(spark):
    df = spark.createDataFrame(
        [("span-p", "batch-p"), (None, "batch-p")],
        "span_proc string, batch_proc string",
    )
    got = [r.proc for r in
           fill_process(df, "span_proc", "batch_proc", "proc").collect()]
    assert sorted(got) == ["batch-p", "span-p"]


def test_attrs_add_on_null_array_still_adds(spark):
    """A left-enriched row with NO dim entry carries attrs = NULL; the
    add-attributes processor runs 'on every span', so the added keys must
    appear rather than the whole array going NULL."""
    from omnition_opentelemetry_service_spark.operators.enrich import (
        attrs_add, attrs_to_str,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", [("team", "core")])],
        "source string, attrs array<struct<key:string,value:string>>")
    got = {r.source: r.s for r in df.select(
        "source",
        attrs_to_str(attrs_add("attrs", {"env": "prod"})).alias("s"))
        .collect()}
    assert got["a"] == "env=prod"
    assert "env=prod" in got["b"] and "team=core" in got["b"]
