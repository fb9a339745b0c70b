"""Lloyd's-iteration IVF training (operators/kmeans.py): cluster-level
invariants on planted well-separated clusters — membership homogeneity,
monotone cost, convergence, deterministic init, and drop-in compatibility
with the similarity.py IVF query path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import kmeans as km
from omnition_opentelemetry_service_spark.operators import similarity as sim

DIM = 64
N_CLUSTERS = 4
PER_CLUSTER = 50


def _planted_rows():
    """4 planted clusters on disjoint 16-dim blocks; deterministic small
    within-block variation keeps vectors distinct but well separated
    (cross-cluster cosine 0, within-cluster ≈ 1)."""
    rows = []
    for c in range(N_CLUSTERS):
        for i in range(PER_CLUSTER):
            vec = [0.0] * DIM
            for d in range(16):
                vec[c * 16 + d] = 1.0 + 0.01 * ((i * 7 + d) % 5)
            rows.append((c * PER_CLUSTER + i, c, vec))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.createDataFrame(
        _planted_rows(), "vec_id long, planted int, embedding array<double>")
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_kmeans_converges_and_cost_monotone(spark, emb):
    cents, costs = km.kmeans_train(emb, k=N_CLUSTERS, max_iter=10)
    assert len(cents) == N_CLUSTERS
    assert len(costs) >= 1
    # mean assigned cosine is non-decreasing (float fold noise budget 1e-9)
    for a, b in zip(costs, costs[1:]):
        assert b >= a - 1e-9
    # converged well before max_iter on separated clusters
    assert len(costs) < 10
    assert costs[-1] > 0.99


def test_kmeans_recovers_planted_clusters(spark, emb):
    cents, _ = km.kmeans_train(emb, k=N_CLUSTERS, max_iter=10)
    got = (km.assign_cells(emb, cents)
           .join(emb.select("vec_id", "planted"), "vec_id"))
    # homogeneity both ways: every planted cluster lands in exactly one
    # cell and every cell holds exactly one planted cluster
    per_planted = got.groupBy("planted").agg(
        F.countDistinct("cell").alias("cells")).collect()
    assert all(r.cells == 1 for r in per_planted)
    per_cell = got.groupBy("cell").agg(
        F.countDistinct("planted").alias("planted")).collect()
    assert len(per_cell) == N_CLUSTERS
    assert all(r.planted == 1 for r in per_cell)


def test_init_is_partitioning_invariant(spark, emb):
    a = km.init_centroids(emb, k=N_CLUSTERS)
    b = km.init_centroids(emb.repartition(13), k=N_CLUSTERS)
    assert a == b


def test_k_exceeding_corpus_raises(spark, emb):
    with pytest.raises(ValueError, match="exceeds corpus"):
        km.init_centroids(emb.limit(2), k=3)


def test_trained_centroids_drop_into_ivf_query_path(spark, emb):
    """The trained table must be consumable by similarity.ivf_assign
    unchanged, and agree with assign_cells on every vector."""
    cents, _ = km.kmeans_train(emb, k=N_CLUSTERS, max_iter=10)
    cdf = km.trained_centroids_df(spark, cents)
    via_sim = (sim.ivf_assign(emb, cdf, nprobe=1)
               .select("vec_id", F.col("cell").alias("cell_sim")))
    via_km = km.assign_cells(emb, cents)
    diff = via_km.join(via_sim, "vec_id") \
        .filter(F.col("cell") != F.col("cell_sim")).count()
    assert diff == 0


def test_assign_plan_has_no_corpus_shuffle(spark, emb):
    """The assignment is a broadcast attach: no Exchange keyed on the
    corpus, no CartesianProduct (the 1-row build side is BroadcastNestedLoop
    by design)."""
    cents, _ = km.kmeans_train(emb, k=N_CLUSTERS, max_iter=1)
    plan = km.assign_cells(emb, cents)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_k_below_one_raises(spark):
    import pytest

    from omnition_opentelemetry_service_spark.operators import kmeans as km

    emb = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k must be >= 1"):
        km.kmeans_train(emb, k=0, dim=2)
    with pytest.raises(ValueError, match="k must be >= 1"):
        km.init_centroids(emb, k=-1)
