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

    q = {**registry.build_queries(), **registry.build_extra_queries()}
    for name in ["tpch_q3_top10", "region_supplier_rollup",
                 "minhash_candidates", "ann_lsh_topk", "ivf_ann_topk",
                 "simhash_band_pairs", "embedding_near_dup_lsh",
                 "assembled_packs", "split_leakage"]:
        plan = _plan(q[name](spark, SF))
        assert "CartesianProduct" not in plan, name
    spark.catalog.clearCache()


def test_pipeline_dims_broadcast_fact_never_shuffled_for_enrich(spark):
    """The enrich join must be a BroadcastHashJoin (dim side built) and the
    route join a BroadcastNestedLoop over the 5-row rules — the 10^12-row
    fact side never shuffles for either."""
    from omnition_opentelemetry_service_spark.plans import pipeline as pl

    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=2000))
    plan = _plan(st["routed"])
    assert "BroadcastHashJoin" in plan           # enrich dim join
    assert "BroadcastNestedLoopJoin" in plan     # rules theta-join
    # exactly ONE exchange partitioned on something other than broadcast:
    # the payload⨝sequences doc_id join + carry-forward window share keys;
    # no exchange may be keyed on the enrich/route side
    assert "Exchange hashpartitioning(source" not in plan
    assert "Exchange hashpartitioning(rule_id" not in plan


def test_translated_envelope_single_pass_no_extra_shuffle(spark):
    """encode_envelope adds projection only: no join, no aggregate, no new
    exchange beyond what routed already has — one pass encodes every sink."""
    from omnition_opentelemetry_service_spark.operators.translate import (
        encode_envelope,
    )
    from omnition_opentelemetry_service_spark.plans import pipeline as pl

    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=2000))
    base = _plan(st["routed"]).count("Exchange")
    env = _plan(encode_envelope(st["routed"])).count("Exchange")
    assert env == base


def test_logging_sample_is_take_ordered_not_global_sort(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    top-k + driver merge of k·P rows) — a global Sort of 10^12 rows for a
    100-row debug sample would be a scale bug."""
    from omnition_opentelemetry_service_spark.operators.translate import (
        logging_sample,
    )
    from omnition_opentelemetry_service_spark.plans import pipeline as pl

    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=2000))
    plan = _plan(logging_sample(st["routed"], k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_corpus_filter_full_plan_shape(spark):
    """The composed cleaning pass stays equi-join-only end to end: no
    CartesianProduct from any of its five stages, and the exact-keeper
    join is the broadcast the composition promises."""
    from omnition_opentelemetry_service_spark.operators import corpus
    from omnition_opentelemetry_service_spark.sources.loader import load

    df = corpus.corpus_filter_full(load(spark, SF, "documents"))
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    spark.catalog.clearCache()


def test_multi_receiver_union_is_one_scan_not_union(spark, tmp_path):
    """Receiver fan-in compiles to ONE multi-path parquet scan: Catalyst
    sees a single source relation (pushdown/pruning/AQE apply once), not a
    Union of per-receiver subplans."""
    from omnition_opentelemetry_service_spark import fixtures as fx
    from omnition_opentelemetry_service_spark.plans import pipeline as pl

    for part in ("a", "b"):
        fx.materialize_input(spark, 100, str(tmp_path / part),
                             num_partitions=1)
    cfg = pl.PipelineConfig(
        input_dir=[str(tmp_path / "a"), str(tmp_path / "b")])
    routed = pl.build_routed(spark, cfg)["routed"]
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    # exactly one file scan per table (payloads + sequences), each carrying
    # BOTH receiver paths — not one scan per receiver
    assert plan.count("FileScan parquet") == 2


def test_pack_assembly_single_exchange(spark):
    """with_pack_id → assemble_packs → finalize_packs is ONE hash exchange
    end-to-end: hash(source) partitioning from the pack-id window already
    CLUSTERS (source, pack_id), so the within-pack window and the pack
    groupBy both reuse it (sorts only); finalize is a projection."""
    import re

    from omnition_opentelemetry_service_spark import fixtures as fx
    from omnition_opentelemetry_service_spark.operators import packing as pk

    df = pk.finalize_packs(pk.assemble_packs(
        pk.with_pack_id(fx.sequences(spark, 500), budget=512)), budget=512)
    plan = _plan(df)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
