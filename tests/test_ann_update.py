"""Incremental ANN index update (pq.update_ann_index — the FAISS-`add`
shape): delta encode equals a from-scratch encode with the same frozen
quantizer, serving unions base+deltas with per-scan partition pruning,
redelivery is a no-op, crash staging is invisible, NULL embeddings stay
quarantined end-to-end."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import pq

DIM = 64
N_CLUSTERS = 4
PER_CLUSTER = 30


def _rows(start_cluster=0, n_clusters=N_CLUSTERS):
    rows = []
    for c in range(start_cluster, n_clusters):
        for i in range(PER_CLUSTER):
            vec = [0.0] * DIM
            for d in range(16):
                vec[c * 16 + d] = 1.0 + 0.01 * ((i * 7 + d) % 5)
            rows.append((c * PER_CLUSTER + i, c, vec))
    return rows


def _build(spark, tmp_path, rows):
    emb_pq = str(tmp_path / "emb.parquet")
    idx = str(tmp_path / "idx")
    pdf = pd.DataFrame([(i, v) for i, _c, v in rows],
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
    return idx


def test_update_serve_and_protocol(spark, tmp_path):
    all_rows = _rows()
    base_rows = [r for r in all_rows if r[1] < 2]   # clusters 0,1
    drop_rows = [r for r in all_rows if r[1] >= 2]  # clusters 2,3
    idx = _build(spark, tmp_path, base_rows)

    drop = spark.createDataFrame(
        pd.DataFrame([(i, v) for i, _c, v in drop_rows],
                     columns=["vec_id", "embedding"]))
    rep = pq.update_ann_index(spark, idx, drop, batch_id=1)
    assert rep["committed"] is True and rep["rows"] == len(drop_rows)

    # 1) delta encode == from-scratch encode under the SAME frozen meta
    meta = json.load(open(os.path.join(idx, "meta.json")))
    cents = [(int(c), v) for c, v in meta["centroids"]]
    expect = sorted(map(tuple, pq.assign_and_encode(
        drop, cents, meta["codebooks"], dim=meta["dim"]).collect()))
    got = sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "codes_delta", "batch=1"))
        .select("id", "cell", "codes").collect()))
    assert [(i, c, tuple(cd)) for i, c, cd in got] \
        == [(i, c, tuple(cd)) for i, c, cd in expect]

    # 2) serving the updated index == in-process ivf_pq_topk over the FULL
    #    corpus with the same frozen quantizer
    full = spark.createDataFrame(
        pd.DataFrame([(i, v) for i, _c, v in all_rows],
                     columns=["vec_id", "embedding"]))
    queries = [(r[0], r[2]) for r in [base_rows[0], drop_rows[0]]]
    served = sorted(map(tuple, pq.search_ann_index(
        spark, idx, queries, k=5, nprobe=1).collect()))
    inproc = sorted(map(tuple, pq.ivf_pq_topk(
        full, queries, cents, meta["codebooks"], k=5, nprobe=1).collect()))
    assert served == inproc
    # a query from the NEW drop finds new-drop neighbors
    new_q = queries[1][0]
    assert any(q == new_q for q, _i, _d in served)

    # 3) redelivery of the same batch_id is a no-op
    before = pq.search_ann_index(spark, idx, queries, k=5, nprobe=1).count()
    rep2 = pq.update_ann_index(spark, idx, drop, batch_id=1)
    assert rep2["committed"] is False
    assert pq.search_ann_index(
        spark, idx, queries, k=5, nprobe=1).count() == before

    # 4) a crashed writer's staging dir is invisible to serving
    os.makedirs(os.path.join(idx, "codes_delta", ".staging-dead"))
    assert pq.search_ann_index(
        spark, idx, queries, k=5, nprobe=1).count() == before

    # 5) every scan in the serve plan is partition-pruned on cell
    plan = pq.search_ann_index(spark, idx, queries, k=5, nprobe=1) \
        ._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("Scan parquet")
    assert scans >= 2  # base + at least the delta
    assert plan.count("PartitionFilters: [") == scans, plan[:3000]


def test_update_null_embeddings_quarantined(spark, tmp_path):
    rows = _rows(0, 2)
    idx = _build(spark, tmp_path, rows)
    drop = spark.createDataFrame(
        pd.DataFrame([(900, [1.0] * DIM)], columns=["vec_id", "embedding"]))
    null_row = spark.createDataFrame([(901,)], "vec_id long").withColumn(
        "embedding", F.lit(None).cast("array<double>"))
    pq.update_ann_index(spark, idx, drop.unionByName(null_row), batch_id=7)
    served = pq.search_ann_index(
        spark, idx, [(0, [1.0] * DIM)], k=3, nprobe=4).collect()
    assert all(r.id != 901 for r in served) and len(served) == 3


def test_update_cli(spark, tmp_path):
    rows = _rows(0, 2)
    idx = _build(spark, tmp_path, rows)
    drop_pq = str(tmp_path / "drop.parquet")
    spark.createDataFrame(
        pd.DataFrame([(500 + i, v) for i, (_, _c, v) in
                      enumerate(_rows(2, 3))],
                     columns=["vec_id", "embedding"])).write.parquet(drop_pq)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "update_ann_index.py"),
         "--index", idx, "--embeddings", drop_pq, "--batch-id", "3",
         "--parallelism", "4"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["committed"] is True and rep["rows"] == PER_CLUSTER
    assert os.path.isdir(os.path.join(idx, "codes_delta", "batch=3"))
