"""Product quantization (operators/pq.py): cross-engine exact parity of
encode + ADC search, recall on planted clusters, and the zero-shuffle /
broadcast plan shape."""

from __future__ import annotations

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import pq

DIM = 64
N_CLUSTERS = 4
PER_CLUSTER = 40


def _planted_rows():
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


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_train(emb, m=pq.M_SUBSPACES, k=8, max_iter=4)


def _duck_con():
    con = duckdb.connect()
    pdf = pd.DataFrame(
        [(i, v) for i, _c, v in _planted_rows()],
        columns=["vec_id", "embedding"])
    con.register("embeddings", pdf)
    return con


def test_codebook_shape(books):
    assert len(books) == pq.M_SUBSPACES
    assert all(len(b) == 8 for b in books)
    assert all(len(c) == DIM // pq.M_SUBSPACES for b in books for c in b)


def test_encode_matches_duckdb(spark, emb, books):
    got = {r.id: list(r.codes)
           for r in pq.pq_encode(emb, books).collect()}
    con = _duck_con()
    want = {int(r[0]): [int(x) for x in r[1]] for r in con.execute(
        pq.pq_encode_sql_duck(books)).fetchall()}
    assert got == want


def test_encode_partitioning_invariant(spark, emb, books):
    a = sorted((r.id, tuple(r.codes))
               for r in pq.pq_encode(emb, books).collect())
    b = sorted((r.id, tuple(r.codes))
               for r in pq.pq_encode(emb.repartition(13), books).collect())
    assert a == b


def test_adc_topk_matches_duckdb(spark, emb, books):
    queries = [(qid, vec) for qid, _c, vec in _planted_rows()[:6]]
    codes = pq.pq_encode(emb, books)
    got = sorted(map(tuple,
                     pq.pq_adc_topk(codes, queries, books, k=5).collect()))
    con = _duck_con()
    want = sorted(map(tuple, con.execute(pq.pq_adc_topk_sql_duck(
        pq.pq_encode_sql_duck(books), queries, books, k=5)).fetchall()))
    assert got == want


def test_adc_recall_on_planted_clusters(spark, emb, books):
    """A corpus point's ADC top-5 must stay inside its planted cluster —
    the quantization distortion is far below the inter-cluster distance."""
    rows = _planted_rows()
    queries = [(qid, vec) for qid, _c, vec in rows[::37]]
    cluster = {qid: c for qid, c, _v in rows}
    codes = pq.pq_encode(emb, books)
    top = pq.pq_adc_topk(codes, queries, books, k=5).collect()
    assert len(top) == len(queries) * 5
    for r in top:
        assert cluster[r.id] == cluster[r.query_id], \
            f"query {r.query_id} pulled {r.id} from another cluster"


def test_plan_shape_no_corpus_shuffle_in_encode(spark, emb, books):
    plan = pq.pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_plan_shape_adc_broadcasts_queries(spark, emb, books):
    queries = [(0, _planted_rows()[0][2])]
    codes = pq.pq_encode(emb, books)
    plan = (pq.pq_adc_topk(codes, queries, books, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.fixture(scope="module")
def centroids(emb):
    from omnition_opentelemetry_service_spark.operators import kmeans as km
    cents, _ = km.kmeans_train(emb, k=4, max_iter=6, metric="l2")
    return cents


def test_ivf_pq_matches_full_adc_on_probed_cells(spark, emb, books, centroids):
    """With nprobe = nlist (probe everything), IVF-PQ must equal the
    full-corpus ADC scan exactly — the pruning is the ONLY difference."""
    queries = [(qid, vec) for qid, _c, vec in _planted_rows()[:4]]
    codes = pq.pq_encode(emb, books)
    full = sorted(map(tuple,
                      pq.pq_adc_topk(codes, queries, books, k=5).collect()))
    pruned = sorted(map(tuple, pq.ivf_pq_topk(
        emb, queries, centroids, books, k=5, nprobe=len(centroids)).collect()))
    assert full == pruned


def test_ivf_pq_recall_on_planted_clusters(spark, emb, books, centroids):
    rows = _planted_rows()
    queries = [(qid, vec) for qid, _c, vec in rows[::41]]
    cluster = {qid: c for qid, c, _v in rows}
    top = pq.ivf_pq_topk(emb, queries, centroids, books, k=5, nprobe=1).collect()
    assert len(top) == len(queries) * 5
    for r in top:
        assert cluster[r.id] == cluster[r.query_id]


def test_ivf_pq_plan_prunes_via_equijoin(spark, emb, books, centroids):
    queries = [(0, _planted_rows()[0][2])]
    plan = (pq.ivf_pq_topk(emb, queries, centroids, books, k=3, nprobe=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan   # candidate gen = equi-join
    assert "CartesianProduct" not in plan, plan


SET = settings(max_examples=5, deadline=None, derandomize=True,
               suppress_health_check=[HealthCheck.function_scoped_fixture])
fvals = st.floats(-8, 8, allow_nan=False, allow_infinity=False, width=64)


@SET
@given(st.lists(st.lists(fvals, min_size=8, max_size=8),
                min_size=2, max_size=10),
       st.lists(st.lists(st.lists(fvals, min_size=4, max_size=4),
                         min_size=3, max_size=3),
                min_size=2, max_size=2))
def test_pq_matches_python_model_on_arbitrary_vectors(spark, vecs, books):
    """Encode + ADC equal an independent Python float model on ARBITRARY
    vectors and codebooks (dim 8, M=2, k=3): same argmin tie rule, same
    fold order, and Spark == DuckDB == model."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.id: list(r.codes)
           for r in pq.pq_encode(df, books, dim=8).collect()}
    # python model: first index of min, same arithmetic
    model = {}
    for i, v in rows:
        cs = []
        for mi in range(2):
            q = v[mi * 4:(mi + 1) * 4]
            ds = []
            for c in books[mi]:
                acc = 0.0
                for j in range(4):
                    acc += (q[j] - c[j]) * (q[j] - c[j])
                ds.append(acc)
            cs.append(ds.index(min(ds)))
        model[i] = cs
    assert got == model
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    want = {int(r[0]): [int(x) for x in r[1]] for r in con.execute(
        pq.pq_encode_sql_duck(books, dim=8)).fetchall()}
    assert got == want
    # ADC parity on one query
    queries = [(0, vecs[0])]
    codes = pq.pq_encode(df, books, dim=8)
    a = sorted(map(tuple, pq.pq_adc_topk(codes, queries, books, k=3).collect()))
    b = sorted(map(tuple, con.execute(pq.pq_adc_topk_sql_duck(
        pq.pq_encode_sql_duck(books, dim=8), queries, books, k=3)).fetchall()))
    assert a == b


def test_null_embedding_rows_never_rank(spark, books):
    import pandas as pd

    rows = _planted_rows()[:6]
    pdf = pd.DataFrame([(i, v) for i, _c, v in rows],
                       columns=["vec_id", "embedding"])
    df = spark.createDataFrame(pdf)
    null_row = spark.createDataFrame([(999,)], "vec_id long").withColumn(
        "embedding", F.lit(None).cast("array<double>"))
    with_null = df.unionByName(null_row)
    queries = [(rows[0][0], rows[0][2])]
    codes = pq.pq_encode(with_null, books)
    top = pq.pq_adc_topk(codes, queries, books, k=3).collect()
    assert all(r.id != 999 for r in top)
    assert len(top) == 3


def test_index_build_and_serve_cli(spark, tmp_path):
    """jobs/build_ann_index.py end-to-end: build on the planted corpus via
    spark-submit-shaped CLI, then serve with search_ann_index — results
    equal the in-process ivf_pq_topk and the scan is partition-pruned."""
    import json
    import os
    import subprocess
    import sys

    import pandas as pd

    emb_pq = str(tmp_path / "emb.parquet")
    idx = str(tmp_path / "idx")
    pdf = pd.DataFrame([(i, v) for i, _c, v in _planted_rows()],
                       columns=["vec_id", "embedding"])
    spark.createDataFrame(pdf).write.parquet(emb_pq)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "build_ann_index.py"),
         "--embeddings", emb_pq, "--out", idx,
         "--nlist", "4", "--m", "8", "--k-codes", "8",
         "--parallelism", "4"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] == len(pdf)

    rows = _planted_rows()
    queries = [(qid, vec) for qid, _c, vec in rows[:3]]
    served = sorted(map(tuple, pq.search_ann_index(
        spark, idx, queries, k=5, nprobe=1).collect()))
    # parity vs the in-process path using the SAME trained artifacts
    meta = json.load(open(os.path.join(idx, "meta.json")))
    cents = [(int(c), v) for c, v in meta["centroids"]]
    inproc = sorted(map(tuple, pq.ivf_pq_topk(
        spark.createDataFrame(pdf), queries, cents, meta["codebooks"],
        k=5, nprobe=1).collect()))
    assert served == inproc
    # cluster recall
    cluster = {qid: c for qid, c, _v in rows}
    for qid, vid, _d in served:
        assert cluster[vid] == cluster[qid]
    # the serve scan is partition-pruned to the probed cells
    plan = pq.search_ann_index(spark, idx, queries, k=5, nprobe=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan, plan[:2000]


def test_null_embedding_never_ranks_in_ivf_pq(spark, emb, books, centroids):
    """assign_and_encode must NULL-guard like pq_encode (ADVICE r2): a NULL
    embedding otherwise yields an array OF nulls that passes codes IS NOT
    NULL and its NULL adc_dist tops every top-k under ASC NULLS FIRST."""
    null_row = spark.createDataFrame([(999,)], "vec_id long").withColumn(
        "embedding", F.lit(None).cast("array<double>"))
    with_null = emb.select("vec_id", "embedding").unionByName(null_row)
    enc = {r.id: r.codes for r in pq.assign_and_encode(
        with_null, centroids, books).collect()}
    assert enc[999] is None
    queries = [(qid, vec) for qid, _c, vec in _planted_rows()[:3]]
    top = pq.ivf_pq_topk(with_null, queries, centroids, books,
                         k=3, nprobe=len(centroids)).collect()
    assert len(top) == 3 * len(queries)
    assert all(r.id != 999 and r.adc_dist is not None for r in top)
