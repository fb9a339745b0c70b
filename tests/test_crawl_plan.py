"""jobs/crawl_plan.py: composed next-cycle scheduler — discovery excludes
known urls, budget binds per host, politeness delays survive, workers are
host-sticky, CLI subprocess e2e."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from jobs.crawl_plan import crawl_plan
from omnition_opentelemetry_service_spark.operators import linkgraph as lg
from omnition_opentelemetry_service_spark.operators import robots as rb
from omnition_opentelemetry_service_spark.operators import urls as ur

N = 300


def _pages(spark, n=N):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(ur.url_fixture_sql("id")).alias("url"),
        F.expr(lg.link_fixture_sql("CAST(id AS STRING)", "id"))
        .alias("html"))


def _robots(spark, pages):
    hosts = (pages.select(ur.url_host("url").alias("host"))
             .distinct().filter("host IS NOT NULL AND host <> ''"))
    return hosts.select(
        "host", F.expr(rb.robots_fixture_sql("host")).alias("robots_txt"))


@pytest.fixture(scope="module")
def plan(spark):
    pages = _pages(spark)
    out = crawl_plan(pages, _robots(spark, pages), budget=200,
                     num_workers=4).persist()
    yield out
    spark.catalog.clearCache()


def test_plan_shape_and_novelty(spark, plan):
    rows = plan.collect()
    assert len(rows) > 20
    assert set(plan.columns) == {"host", "url_id", "url", "fetch_seq",
                                 "scheduled_at", "worker"}
    # nothing already known is re-planned (canonical identity)
    pages = _pages(spark)
    known = {r["c"] for r in pages.select(
        ur.canonical_url("url").alias("c")).collect()}
    planned = {r["c"] for r in plan.select(
        ur.canonical_url("url").alias("c")).collect()}
    assert planned and not (planned & known)


def test_budget_binds_per_host(spark, plan):
    pages = _pages(spark)
    alloc = {r["host"]: r["n_slots"] for r in lg.allocate_budget(
        lg.host_rank(lg.host_edges(pages)), 200).collect()}
    per_host = plan.groupBy("host").count().collect()
    assert all(r["count"] <= alloc[r["host"]] for r in per_host)
    assert sum(r["count"] for r in per_host) <= 200
    spark.catalog.clearCache()


def test_politeness_and_worker_stickiness(spark, plan):
    # consecutive fetches of one host stay crawl-delay apart
    rows = sorted(((r["host"], r["fetch_seq"], r["scheduled_at"])
                   for r in plan.collect()))
    by_host: dict[str, list[tuple[int, float]]] = {}
    for h, sq, at in rows:
        by_host.setdefault(h, []).append((sq, at))
    multi = {h: v for h, v in by_host.items() if len(v) > 1}
    assert multi
    for h, v in multi.items():
        gaps = {round(b[1] - a[1], 9) for a, b in zip(v, v[1:])}
        assert len(gaps) == 1 and gaps.pop() > 0
    # one host, one worker
    per = (plan.groupBy("host")
           .agg(F.countDistinct("worker").alias("nw")).collect())
    assert all(r["nw"] == 1 for r in per)
    ws = {r["worker"] for r in plan.select("worker").collect()}
    assert ws <= set(range(4))


def test_seen_store_excludes(spark):
    pages = _pages(spark, 120)
    base = crawl_plan(pages, _robots(spark, pages), budget=500,
                      num_workers=2)
    first = base.select("url").limit(5)
    rest = crawl_plan(pages, _robots(spark, pages), budget=500,
                      num_workers=2, seen=first)
    gone = {r["url"] for r in first.collect()}
    left = {r["url"] for r in rest.select("url").collect()}
    assert gone and not (gone & left)
    spark.catalog.clearCache()


def test_cli_subprocess_e2e(spark, tmp_path):
    pg, rbp = str(tmp_path / "pages"), str(tmp_path / "robots")
    outp, rep = str(tmp_path / "plan"), str(tmp_path / "report.json")
    pages = _pages(spark, 150)
    pages.write.parquet(pg)
    _robots(spark, pages).write.parquet(rbp)
    r = subprocess.run(
        [sys.executable, "jobs/crawl_plan.py", "--pages", pg,
         "--robots", rbp, "--out", outp, "--budget", "120",
         "--workers", "4", "--report", rep, "--parallelism", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(open(rep).read())
    written = spark.read.parquet(outp)
    assert written.count() == report["planned_urls"] <= 120
    assert set(report["worker_load"]) <= {"0", "1", "2", "3"}
    # partitioned-by-worker layout on disk
    assert written.select("worker").distinct().count() == len(
        report["worker_load"])
