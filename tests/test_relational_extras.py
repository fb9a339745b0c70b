"""Temporal + multidimensional relational extras verified VALUE-level
against DuckDB on the driver's events table: as-of join (vs DuckDB's native
ASOF JOIN), CUBE / grouping-sets aggregation, and set operations. These sit
beyond the 50 driver slots; this file applies the same cross-engine value
contract in-suite."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators.asof import asof_join
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.execute(sql).fetch_df()


def _match(spark_df, duck_pdf, sort_cols):
    s = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    d = duck_pdf.sort_values(sort_cols).reset_index(drop=True)
    assert list(s.columns) == list(d.columns)
    assert len(s) == len(d)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f":
            assert (sv.fillna(-1) - dv.fillna(-1)).abs().max() < 1e-9, c
        else:
            assert (sv.astype(str) == dv.astype(str)).all(), c


def test_asof_join_matches_duckdb_asof(spark):
    """clicks as-of-joined to each user's latest purchase value — the
    one-shuffle union-window asof (operators/asof.py) against DuckDB's
    native ASOF LEFT JOIN. Right side deduped to one row per (user, ts)
    so tie resolution is engine-independent."""
    ev = load(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    states = ev.filter(F.col("event_type") == "purchase") \
        .groupBy("user_id", "ts").agg(F.max("value").alias("purchase_value"))
    out = asof_join(clicks, states, key="user_id", time_col="ts") \
        .select("event_id", F.round("purchase_value", 6).alias("purchase_value"))
    oracle = _duck("""
        WITH states AS (
          SELECT user_id, ts, max(value) AS purchase_value FROM events
          WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT l.event_id, round(r.purchase_value, 6) AS purchase_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') l
        ASOF LEFT JOIN states r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """)
    _match(out, oracle, ["event_id"])


def test_events_cube_matches_duckdb(spark):
    """CUBE(event_type, hour): all four grouping combinations in one pass —
    Spark cube() ≡ DuckDB GROUP BY CUBE. Spark's map-side partials make this
    one scan + one shuffle at any scale."""
    ev = load(spark, SF, "events")
    hour = F.hour(F.col("ts").cast("timestamp_ltz")).alias("hr")
    out = (
        ev.cube(F.col("event_type"), hour)
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                     .cast("double"), 6).alias("sum_value"))
    )
    oracle = _duck("""
        SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                 AS sum_value
        FROM events GROUP BY CUBE(event_type, hr)
    """)
    _match(out.withColumn("event_type", F.coalesce("event_type", F.lit("∅")))
              .withColumn("hr", F.coalesce("hr", F.lit(-1))),
           oracle.fillna({"event_type": "∅", "hr": -1})
                 .astype({"hr": "int32"}),
           ["event_type", "hr"])


def test_set_ops_match_duckdb(spark):
    """INTERSECT / EXCEPT on user sets between event types."""
    ev = load(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    inter = clicks.intersect(buys)
    minus = clicks.distinct().exceptAll(buys.distinct())
    o_inter = _duck("""
        SELECT user_id FROM events WHERE event_type='click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type='purchase'
    """)
    o_minus = _duck("""
        SELECT user_id FROM events WHERE event_type='click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type='purchase'
    """)
    _match(inter, o_inter, ["user_id"])
    _match(minus, o_minus, ["user_id"])


def test_asof_plan_single_exchange_no_nested_loop(spark):
    """The asof must stay a union + window — one hash exchange on the key,
    never a range nested-loop."""
    ev = load(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    states = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    plan = asof_join(clicks, states, key="user_id", time_col="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
