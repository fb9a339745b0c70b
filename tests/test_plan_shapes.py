"""Physical-plan contracts: at 100 TB these properties ARE the performance
model — filters reach the parquet scan, projections prune columns, dims
broadcast. Asserted on plans, not timings (timings don't transfer from
sandbox to cluster; plan shapes do)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushes_into_parquet_scan(spark):
    df = load(spark, SF, "orders").filter(F.col("o_totalprice") > 100000.0)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_projection_prunes_scan_schema(spark):
    df = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema carries ONLY the projected columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity"}


def test_partition_filter_prunes_generated_range(spark):
    """Constant folding + range pruning: a contradiction filter collapses to
    an empty scan, no job needed."""
    df = spark.range(10**6).filter(F.lit(False))
    assert df.count() == 0
    assert "LocalTableScan" in _plan(df) or "Empty" in _plan(df)


def test_no_cartesian_anywhere_in_registry_samples(spark):
    """Representative joins never degrade to CartesianProduct."""
    from omnition_opentelemetry_service_spark import registry

    q = registry.build_queries()
    for name in ["tpch_q3_top10", "region_supplier_rollup",
                 "minhash_candidates", "ann_lsh_topk", "ivf_ann_topk"]:
        plan = _plan(q[name](spark, SF))
        assert "CartesianProduct" not in plan, name
