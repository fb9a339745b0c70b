"""As-of join + multi-grain rollup operators: semantics against a
brute-force oracle, plan shape against the one-shuffle contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators.asof import (
    asof_join, rollup_time_grains,
)


def _events(spark):
    rows = [
        ("u1", 10, "e1"), ("u1", 25, "e2"), ("u1", 40, "e3"),
        ("u2", 5, "e4"), ("u2", 30, "e5"),
        ("u3", 50, "e6"),  # key with no state updates at all
    ]
    return spark.createDataFrame(rows, "user_id string, t long, ev string")


def _states(spark):
    rows = [
        ("u1", 0, "A"), ("u1", 25, "B"), ("u1", 35, "C"),
        ("u2", 20, "X"),
    ]
    return spark.createDataFrame(rows, "user_id string, t long, cfg string")


def test_asof_backward_semantics(spark):
    out = {(r.user_id, r.t): r.cfg
           for r in asof_join(_events(spark), _states(spark),
                              key="user_id", time_col="t").collect()}
    assert out[("u1", 10)] == "A"    # latest state at t≤10
    assert out[("u1", 25)] == "B"    # tie: state at 25 visible at 25
    assert out[("u1", 40)] == "C"
    assert out[("u2", 5)] is None    # before any state
    assert out[("u2", 30)] == "X"
    assert out[("u3", 50)] is None   # key never had state


def test_asof_forward_semantics(spark):
    out = {(r.user_id, r.t): r.cfg
           for r in asof_join(_events(spark), _states(spark),
                              key="user_id", time_col="t",
                              direction="forward").collect()}
    assert out[("u1", 10)] == "B"    # earliest state at t≥10 is t=25
    assert out[("u1", 40)] is None   # nothing after 40
    assert out[("u2", 5)] == "X"


def test_asof_matches_bruteforce_on_fixture(spark):
    """Random-ish deterministic data: window form ≡ brute-force per-row max."""
    left = spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 13 % 101).alias("t"),
        F.col("id").alias("ev_id"))
    right = spark.range(80).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 29 % 97).alias("t"),
        F.col("id").alias("state_id"))
    got = {(r.k, r.t, r.ev_id): r.state_id
           for r in asof_join(left, right, key="k", time_col="t").collect()}
    lrows = left.collect()
    rrows = right.collect()
    for lr in lrows:
        cands = [rr for rr in rrows if rr.k == lr.k and rr.t <= lr.t]
        # tie-break must match the operator: max by (t, then state order of
        # the window's arbitrary equal-key order) — use max t, then the last
        # in window order; assert only on unique-max cases for robustness
        if not cands:
            assert got[(lr.k, lr.t, lr.ev_id)] is None
            continue
        tmax = max(rr.t for rr in cands)
        at_max = [rr.state_id for rr in cands if rr.t == tmax]
        if len(at_max) == 1:
            assert got[(lr.k, lr.t, lr.ev_id)] == at_max[0]


def test_asof_single_shuffle_no_cartesian(spark):
    plan = asof_join(_events(spark), _states(spark),
                     key="user_id", time_col="t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # composition is union+window, no join at all


def test_rollup_time_grains_single_pass(spark):
    ev = spark.createDataFrame(
        [("a", "2026-01-01 10:15:00", 1.0),
         ("a", "2026-01-01 10:45:00", 2.0),
         ("a", "2026-01-01 11:05:00", 4.0),
         ("b", "2026-01-02 00:00:00", 8.0)],
        "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts"))
    out = rollup_time_grains(
        ev, "ts", ["k"],
        [F.sum("v").alias("sum_v"), F.count("*").alias("n")],
        grains=("hour", "day"))
    rows = {(r.grain, str(r.bucket_start), r.k): (r.sum_v, r.n)
            for r in out.collect()}
    assert rows[("hour", "2026-01-01 10:00:00", "a")] == (3.0, 2)
    assert rows[("hour", "2026-01-01 11:00:00", "a")] == (4.0, 1)
    assert rows[("day", "2026-01-01 00:00:00", "a")] == (7.0, 3)
    assert rows[("day", "2026-01-02 00:00:00", "b")] == (8.0, 1)
    # single-pass contract: exactly one aggregate over one scan (+ explode)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # one logical input (existing RDD scan)


def test_range_join_matches_theta_join(spark):
    """Bucketized range join ≡ the naive theta-join on the same data, and
    the plan is an equi-join (SortMerge/Hash), never nested-loop/cartesian."""
    from omnition_opentelemetry_service_spark.operators.asof import range_join

    events = spark.range(300).select(
        F.col("id").alias("ev_id"),
        (F.col("id") * 17 % 1000).alias("t"),
        (F.col("id") % 3).cast("string").alias("tenant"))
    windows = spark.range(40).select(
        F.col("id").alias("win_id"),
        (F.col("id") * 23 % 900).alias("lo"),
        ((F.col("id") * 23 % 900) + (F.col("id") % 5) * 40 + 10).alias("hi"),
        (F.col("id") % 3).cast("string").alias("tenant"))

    got = {(r.ev_id, r.win_id)
           for r in range_join(events, windows, "t", "lo", "hi",
                               bucket_width=64, key="tenant").collect()}
    naive = {(r.ev_id, r.win_id)
             for r in events.alias("e").join(
                 windows.alias("w"),
                 (F.col("e.tenant") == F.col("w.tenant"))
                 & (F.col("e.t") >= F.col("w.lo"))
                 & (F.col("e.t") < F.col("w.hi"))).select(
                 "e.ev_id", "w.win_id").collect()}
    assert got == naive and len(got) > 0

    plan = range_join(events, windows, "t", "lo", "hi", bucket_width=64,
                      key="tenant")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_inverted_interval_is_inert(spark):
    """An inverted/empty interval (hi <= lo) matches nothing AND must not
    explode into a descending bucket sequence (Spark's sequence(a, b)
    counts DOWN when b < a — unguarded, one inverted row fans out into
    |lo-hi|/width bucket rows before the refine filter kills them)."""
    left = spark.createDataFrame([(1, 10), (2, 25)], "id long, t long")
    right = spark.createDataFrame(
        [(100, 0, 20, "ok"),          # valid: covers t=10
         (101, 30, 30, "empty"),      # empty interval
         (102, 50, -1000000, "bad")], # inverted: would descend 1e6/width
        "rid long, lo long, hi long, tag string")
    from omnition_opentelemetry_service_spark.operators.asof import range_join
    out = range_join(left, right, "t", "lo", "hi", bucket_width=10)
    rows = [(r.id, r.rid, r.tag) for r in out.collect()]
    assert rows == [(1, 100, "ok")]


def test_asof_right_tie_deterministic(spark):
    """Two right rows at the same (key, time): the carried row is the
    max value struct — deterministic across runs and parallelism."""
    from omnition_opentelemetry_service_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 150)], "k string, t long")
    right = spark.createDataFrame(
        [("k", 100, "a"), ("k", 100, "b")], "k string, t long, v string")
    outs = set()
    for nparts in (1, 7):
        got = asof_join(left, right.repartition(nparts), "k", "t").collect()
        assert len(got) == 1
        outs.add(got[0].v)
    assert outs == {"b"}  # max struct wins, both layouts


def test_asof_value_col_collision_raises(spark):
    import pytest

    from omnition_opentelemetry_service_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 1, "x")], "k string, t long, v string")
    right = spark.createDataFrame([("k", 0, "y")], "k string, t long, v string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "t")
