"""Connected components (operators/graph.py): value parity against a
DuckDB recursive-CTE oracle, composition into the near-dup keep-list, and
the convergence / cache-lifecycle contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import dedup as dd
from omnition_opentelemetry_service_spark.operators import graph
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def test_components_hand_graph(spark):
    # two chains and a triangle: {1,2,3,4} {10,11} {20,21,22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long")
    got = {r.id: r.comp for r in graph.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_components_match_duckdb_on_real_near_dups(spark):
    """Edges = the registry's verified near-dup pairs at sf0.001; labels
    must match DuckDB's recursive-CTE fixed point value-for-value."""
    docs = dd.with_minhash(load(spark, SF, "documents")).persist()
    pairs = dd.jaccard_verify(dd.minhash_candidates(docs), docs,
                              threshold=0.3).persist()
    assert pairs.count() > 0  # non-vacuous: the fixture has near-dups
    comp = graph.connected_components(pairs)
    got = sorted((r.id, r.comp) for r in comp.collect())

    edge_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in edge_rows)
    oracle = con.execute(graph.components_sql_duck(
        f"SELECT * FROM (VALUES {vals}) AS t(id_a, id_b)")).fetchall()
    assert got == sorted(oracle)
    spark.catalog.clearCache()


def test_components_release_their_caches(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    out = graph.connected_components(edges)
    out.count()
    out.unpersist()
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == 0


def test_long_chain_converges_with_shortcut(spark):
    """A 200-node path is the adversarial near-dup chain: pointer doubling
    collapses it in O(log d) rounds (d_k = 2(d_{k-1}+1): 2,6,14,30,62,126,
    254 — 7 propagation rounds + 1 fixed-point confirm), where the pure
    propagation would need 200 rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long")
    got = graph.connected_components(edges, max_iter=12)
    assert got.count() == 201
    assert got.filter(F.col("comp") != 0).count() == 0
    got.unpersist()
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(edges, shortcut=False, max_iter=12)


def test_components_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(edges, max_iter=2)


def test_near_dup_keep_list_one_keeper_per_cluster(spark):
    docs = dd.with_minhash(load(spark, SF, "documents")).persist()
    pairs = dd.jaccard_verify(dd.minhash_candidates(docs), docs,
                              threshold=0.3).persist()
    keep = graph.near_dup_keep_list(load(spark, SF, "documents"), pairs)
    # every doc is scored exactly once
    assert keep.count() == load(spark, SF, "documents").count()
    # exactly one keeper per component, and it keeps itself
    per_cluster = keep.groupBy("keeper").agg(
        F.sum(F.col("keep").cast("int")).alias("n_kept"))
    assert per_cluster.filter(F.col("n_kept") != 1).count() == 0
    # chains collapse: a component's every member points at the same keeper
    multi = keep.groupBy("keeper").count().filter(F.col("count") > 1)
    assert multi.count() > 0  # fixture really has clusters
    spark.catalog.clearCache()
