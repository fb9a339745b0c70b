"""Key-skew diagnostics (operators/skew.py): exact percentile parity,
NULL-key labeling, deterministic heavy-key order, skew_ratio semantics."""

from __future__ import annotations

import duckdb

from omnition_opentelemetry_service_spark.operators import skew

ROWS = (
    [("hot",)] * 60 + [("warm",)] * 25 + [("cool",)] * 10
    + [("rare",)] * 4 + [(None,)] * 1
)


def _spark_df(spark):
    return spark.createDataFrame(ROWS, "source string")


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", ROWS)
    return con


def test_report_parity_and_values(spark):
    s = tuple(skew.key_skew_report(_spark_df(spark)).collect()[0])
    d = tuple(_duck().execute(
        skew.key_skew_report_sql_duck("t")).fetchone())
    assert s == d
    n_rows, n_keys, max_count, p50, p90, p99, ratio = s
    assert (n_rows, n_keys, max_count) == (100, 5, 60)
    assert p50 == 10.0  # counts sorted: 1,4,10,25,60
    assert ratio == round(60 * 5 / 100, 6) == 3.0


def test_heavy_keys_parity_order_and_null_label(spark):
    s = [tuple(r) for r in skew.heavy_keys(_spark_df(spark), topk=5)
         .collect()]
    d = _duck().execute(skew.heavy_keys_sql_duck("t", topk=5)).fetchall()
    assert s == d
    assert [k for k, _n, _s in s] == ["hot", "warm", "cool", "rare",
                                      "<null>"]
    assert s[0][1:] == (60, 0.6)


def test_tie_break_is_key_asc(spark):
    df = spark.createDataFrame(
        [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 1, "source string")
    got = [r.key for r in skew.heavy_keys(df, topk=2).collect()]
    assert got == ["a", "b"]


def test_uniform_ratio_is_one(spark):
    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 5, "source string")
    r = skew.key_skew_report(df).collect()[0]
    assert r.skew_ratio == 1.0 and r.p50 == 5.0
