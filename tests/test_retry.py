"""Fetch retry/backoff ledger + worker assignment (operators/retry.py):
hand-case verdict semantics, success-resets-backoff trail, cap binding,
cross-engine fixture parity, politeness-preserving worker invariants."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import retry as rt


def _hand_attempts(spark):
    # key 1: err, ok            -> done
    # key 2: err, err           -> retry (trail 2, backoff 0.5*2^1 = 1.0)
    # key 3: err, err, err      -> dead  (trail 3 = max_retries)
    # key 4: err, ok, err       -> retry (success RESETS: trail 1, 0.5)
    # key 5: err×5              -> dead (trail 5 >= 3), backoff irrelevant
    rows = [(1, 1, "err", 10.0), (1, 2, "ok", 11.0),
            (2, 1, "err", 20.0), (2, 2, "err", 21.0),
            (3, 1, "err", 30.0), (3, 2, "err", 31.0), (3, 3, "err", 32.0),
            (4, 1, "err", 40.0), (4, 2, "ok", 41.0), (4, 3, "err", 42.0),
            (5, 1, "err", 50.0), (5, 2, "err", 51.0), (5, 3, "err", 52.0),
            (5, 4, "err", 53.0), (5, 5, "err", 54.0)]
    return spark.createDataFrame(
        rows, "url_id long, attempt_no long, status string, "
              "attempted_at double")


def test_verdict_semantics(spark):
    out = {r["url_id"]: (r["tries"], r["last_status"], r["outcome"],
                         r["next_attempt_at"])
           for r in rt.retry_plan(_hand_attempts(spark)).collect()}
    assert out == {
        1: (2, "ok", "done", None),
        2: (2, "err", "retry", 21.0 + 1.0),   # trail 2 → 0.5·2¹
        3: (3, "err", "dead", None),
        4: (3, "err", "retry", 42.0 + 0.5),   # reset → trail 1 → 0.5·2⁰
        5: (5, "err", "dead", None),
    }


def test_backoff_cap_binds(spark):
    # one key, 4 trailing failures, max_retries high enough to stay alive:
    # uncapped 0.5·2³ = 4.0, cap 2.0 must bind.
    att = spark.createDataFrame(
        [(9, i, "err", 90.0 + i) for i in range(1, 5)],
        "url_id long, attempt_no long, status string, attempted_at double")
    row = rt.retry_plan(att, max_backoff=2.0, max_retries=10).collect()[0]
    assert row["outcome"] == "retry"
    assert row["next_attempt_at"] == 94.0 + 2.0


def test_param_contract():
    with pytest.raises(ValueError):
        rt.retry_plan_sql_duck("t", base_delay=0.0)
    with pytest.raises(ValueError):
        rt.retry_plan_sql_duck("t", factor=0.5)
    with pytest.raises(ValueError):
        rt.retry_plan_sql_duck("t", max_backoff=0.1, base_delay=0.5)
    with pytest.raises(ValueError):
        rt.retry_plan_sql_duck("t", max_retries=0)
    with pytest.raises(ValueError):
        rt.worker_expr("host", 0, "spark")


def test_fixture_parity_duck(spark):
    """Full value parity over the deterministic ledger fixture — all three
    outcomes present, DOUBLE schedule arithmetic bit-identical."""
    n = 400
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    sp = sorted(tuple(r) for r in rt.retry_plan(
        rt.attempts_fixture(ids), id_col="doc_id").collect())
    du = duckdb.connect().execute(
        rt.retry_plan_sql_duck(
            f"({rt.attempts_fixture_sql_duck(f'SELECT i AS doc_id FROM range(0, {n}) t(i)')}) a",
            id_col="doc_id") + " ORDER BY doc_id").fetchall()
    assert sp == [tuple(r) for r in du]
    outcomes = {r[3] for r in sp}
    assert outcomes == {"done", "retry", "dead"}


def test_worker_assignment_invariants(spark):
    """A host never spans workers (politeness survives the pool) and every
    worker id is in [0, num_workers)."""
    sched = spark.createDataFrame(
        [(i, f"h{i % 7}.example.com", float(i)) for i in range(100)],
        "url_id long, host string, scheduled_at double")
    assigned = rt.assign_workers(sched, num_workers=4)
    per_host = (assigned.groupBy("host")
                .agg(F.countDistinct("worker").alias("nw")).collect())
    assert all(r["nw"] == 1 for r in per_host)
    ws = {r["worker"] for r in assigned.select("worker").collect()}
    assert ws <= set(range(4)) and len(ws) > 1


def test_worker_load_parity_duck(spark):
    n, workers = 300, 4
    sched = spark.createDataFrame(
        [(i, f"h{i % 11}.example.com", float(i % 23)) for i in range(n)],
        "url_id long, host string, scheduled_at double")
    sp = sorted(tuple(r) for r in rt.worker_load(
        rt.assign_workers(sched, num_workers=workers)).collect())
    rows_sql = " UNION ALL ".join(
        f"SELECT {i} AS url_id, 'h{i % 11}.example.com' AS host, "
        f"CAST({i % 23} AS DOUBLE) AS scheduled_at" for i in range(n))
    wx = rt.worker_expr("host", workers, "duck")
    du = duckdb.connect().execute(
        rt.worker_load_sql_duck(
            f"SELECT *, {wx} AS worker FROM ({rows_sql}) s")
        + " ORDER BY worker").fetchall()
    assert sp == [tuple(r) for r in du]


def test_plan_is_single_agg(spark):
    """retry_plan is ONE hash-agg exchange: no join, no window, no sort in
    the physical plan."""
    ids = spark.range(200).select(F.col("id").alias("doc_id"))
    plan = (rt.retry_plan(rt.attempts_fixture(ids), id_col="doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in plan
    assert plan.count("Exchange") <= 1
