"""SemDeDup (operators/similarity.py semdedup_keep — Abbas et al.,
arXiv:2303.09540): exact DuckDB twin parity on the fixture embeddings with
trained centroids shared as literals, planted-geometry semantics for the
keep-lowest-cos-to-centroid keeper rule, and the structural invariants."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import kmeans as km
from omnition_opentelemetry_service_spark.operators import similarity as sim
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_semdedup_matches_duckdb(spark):
    """Downstream of a FIXED centroid table everything is deterministic:
    train once, feed the SAME literals to both engines, compare
    row-for-row (assignment argmax, round-6 pair threshold, component
    fixed point, keeper rule)."""
    emb = load(spark, SF, "embeddings")
    cents, _ = km.kmeans_train(emb, k=4, max_iter=4)
    got = _rows(sim.semdedup_keep(emb, cents, threshold=0.4))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF}/embeddings.parquet'")
    want = sorted(tuple(r) for r in con.execute(
        sim.semdedup_sql_duck(cents, threshold=0.4)).fetchall())
    assert len(got) == emb.count()
    assert got == want
    # non-vacuous: the fixture has semantic dups at this threshold
    assert sum(1 for r in got if not r[4]) > 0
    spark.catalog.clearCache()


def test_semdedup_planted_geometry(spark):
    """Two planted cells; one 3-member dup group whose keeper must be the
    member FARTHEST from its centroid (lowest cos_cent — the paper's
    policy, the opposite of embedding_dedup_keep's min-id), one distinct
    singleton, one 2-member group."""
    dim = 64

    def v(*head):
        return [float(x) for x in head] + [0.0] * (dim - len(head))

    rows = [
        (0, v(10.0, 0.5)),   # group A (cell 0)
        (1, v(10.0, 0.6)),   # group A
        (2, v(10.0, 3.0)),   # group A — farthest from c0 => keeper
        (3, v(7.0, 7.0)),    # distinct singleton (cell 0 via tie->cid 0)
        (4, v(0.2, 9.0)),    # group B (cell 1)
        (5, v(0.3, 9.0)),    # group B — lower cos_cent => keeper
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, v(1.0)), (1, v(0.0, 1.0))]
    out = {r.vec_id: r for r in
           sim.semdedup_keep(emb, cents, threshold=0.97).collect()}
    assert {i: out[i].keeper for i in range(6)} == {
        0: 2, 1: 2, 2: 2, 3: 3, 4: 5, 5: 5}
    assert {i for i in range(6) if out[i].keep} == {2, 3, 5}
    assert {i: out[i].cell for i in range(6)} == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    spark.catalog.clearCache()


def test_semdedup_invariants(spark):
    """Every vector scored exactly once; exactly one keeper per group and
    it keeps itself; dup pairs never straddle cells (the SCOPING that makes
    the pair join an equi-join)."""
    emb = load(spark, SF, "embeddings")
    cents, _ = km.kmeans_train(emb, k=4, max_iter=4)
    out = sim.semdedup_keep(emb, cents, threshold=0.4).persist()
    assert out.count() == emb.count()
    bad = out.groupBy("keeper").agg(
        F.sum(F.col("keep").cast("int")).alias("n_kept"))
    assert bad.filter(F.col("n_kept") != 1).count() == 0
    # keeper is always in the same cell as its members (cell-scoped groups)
    cells = out.select("vec_id", "cell")
    straddle = (out.join(cells.withColumnRenamed("vec_id", "keeper")
                         .withColumnRenamed("cell", "k_cell"), "keeper")
                .filter(F.col("cell") != F.col("k_cell")))
    assert straddle.count() == 0
    spark.catalog.clearCache()


# -- cluster-balanced sampling (similarity.cluster_balanced_sample) --------

def test_cluster_balanced_sample_matches_duckdb(spark):
    import duckdb

    from omnition_opentelemetry_service_spark.operators import corpus as cp
    from omnition_opentelemetry_service_spark.registry import _ivf_pre

    emb = load(spark, SF, "embeddings")
    cap = 3
    out = sim.cluster_balanced_sample(emb, sim.ivf_centroids(emb), cap=cap)
    got = {(r.vec_id, r.cell) for r in out.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF}/embeddings.parquet'")
    con.execute(f"CREATE TEMP VIEW assigned_v AS {_ivf_pre()} "
                f"SELECT vec_id, cell FROM assigned")
    want = set(map(tuple, con.execute(cp.quota_per_stratum_sql_duck(
        "assigned_v", cap=cap, strata_col="cell", key_col="vec_id",
        salt="cbal-v1", cols="vec_id, cell")).fetchall()))
    assert got == want and got

    # the cap binds on at least one cluster and is never exceeded
    sizes = {}
    for _, cell in got:
        sizes[cell] = sizes.get(cell, 0) + 1
    assigned_sizes = {r.cell: r.n for r in
                      sim.ivf_assign(emb, sim.ivf_centroids(emb))
                      .groupBy("cell").agg(F.count("*").alias("n"))
                      .collect()}
    assert max(assigned_sizes.values()) > cap  # non-vacuous
    assert all(n <= cap for n in sizes.values())
    assert all(sizes.get(c, 0) == min(n, cap)
               for c, n in assigned_sizes.items())
