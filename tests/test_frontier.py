"""Crawl-frontier scheduler (operators/frontier.py): politeness semantics
by hand-case, plain==scalable output equality, broadcast plan pins, and
sitemap-discovery anti-join semantics with its DuckDB twin."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import frontier as fr
from omnition_opentelemetry_service_spark.operators import robots as rb
from omnition_opentelemetry_service_spark.operators import urls as ur

RTXT = "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"


def _hand_inputs(spark):
    cands = spark.createDataFrame(
        [(1, "http://h.example.com/a"),
         (2, "http://h.example.com/private/x"),   # robots-blocked
         (3, "http://www.h.example.com/a/"),      # canon-dup of 1
         (4, "https://h.example.com/b"),
         (5, "http://fast.example.com/z"),        # no robots → default delay
         (6, None)],                              # nothing to fetch
        "url_id long, url string")
    robots = spark.createDataFrame(
        [("h.example.com", RTXT)], "host string, robots_txt string")
    return cands, robots


def test_schedule_semantics(spark):
    cands, robots = _hand_inputs(spark)
    rows = {r["url_id"]: (r["host"], r["fetch_seq"], r["scheduled_at"])
            for r in fr.frontier_schedule(cands, robots).collect()}
    assert rows == {
        1: ("h.example.com", 0, 0.0),     # queue head
        4: ("h.example.com", 1, 2.0),     # crawl-delay 2 applied
        5: ("fast.example.com", 0, 0.0),  # default delay, own queue
    }  # 2 blocked, 3 collapsed into 1, 6 NULL-url dropped


def test_default_delay_parameter(spark):
    cands, robots = _hand_inputs(spark)
    extra = spark.createDataFrame(
        [(7, "http://fast.example.com/z2")], "url_id long, url string")
    out = fr.frontier_schedule(cands.union(extra), robots,
                               default_delay=5.0)
    got = {r["url_id"]: r["scheduled_at"]
           for r in out.filter(F.col("host") == "fast.example.com")
           .collect()}
    assert got == {5: 0.0, 7: 5.0}


def _fixture_cands_robots(spark, n=400):
    cands = spark.range(n).select(
        F.col("id").alias("url_id"),
        F.expr(ur.url_fixture_sql("id")).alias("url"))
    hosts = (cands.select(ur.url_host("url").alias("host"))
             .distinct().filter("host IS NOT NULL"))
    robots = hosts.select(
        "host", F.expr(rb.robots_fixture_sql("host")).alias("robots_txt"))
    return cands, robots


def test_scalable_equals_plain(spark):
    """The bounded two-exchange form is output-identical to the window
    form on the full fixture — multi-slice forced (slice_rows ≪ n)."""
    cands, robots = _fixture_cands_robots(spark)
    plain = sorted(tuple(r) for r in
                   fr.frontier_schedule(cands, robots).collect())
    scal = sorted(tuple(r) for r in
                  fr.frontier_schedule_scalable(
                      cands, robots, slice_rows=8).collect())
    assert plain == scal
    assert len(plain) > 100  # non-vacuous
    # both delay regimes present: specific-agent hosts (1.5) and '*' (3.0)
    at = {r[4] for r in plain}
    assert any(v % 3.0 == 1.5 for v in at) and any(
        v > 0 and v % 3.0 == 0.0 for v in at)


def test_plan_broadcasts_rules_and_delays(spark):
    """Rules and delays ride broadcast joins; no sort-merge join, no
    cartesian anywhere in the schedule plan."""
    cands, robots = _fixture_cands_robots(spark, n=60)
    plan = (fr.frontier_schedule(cands, robots)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_discover_from_sitemaps_anti_join_and_dedup(spark):
    entries = spark.createDataFrame(
        [("h", "url", "https://h/new1", None),
         ("h", "url", "https://h/new1/", None),      # canon-dup in batch
         ("h", "url", "https://h/known?utm_source=x", None),  # seen
         ("h", "sitemap", "https://h/more.xml", None),        # index: skip
         ("h", "url", "mailto:sales@h", None),                # scheme gate
         ("h", "url", "/relative/path", None)],               # scheme gate
        "host string, kind string, loc string, lastmod string")
    seen = spark.createDataFrame(
        [("https://h/known",)], "url string")
    got = sorted(tuple(r) for r in
                 fr.discover_from_sitemaps(entries, seen).collect())
    assert got == [("h", "https://h/new1", "h/new1")]
    # without a seen store: known stays, still index-filtered + deduped
    all_new = sorted(r["canon_url"] for r in
                     fr.discover_from_sitemaps(entries).collect())
    assert all_new == ["h/known", "h/new1"]


def test_discover_duck_twin_parity(spark):
    """Value parity for discovery over the sitemap fixture, seen = the
    url-fixture corpus (real anti-join pressure both ways)."""
    n = 300
    cands, robots = _fixture_cands_robots(spark, n)
    sm = robots.select(
        "host", F.expr(rb.sitemap_fixture_sql("host")).alias("xml"))
    entries = rb.parse_sitemap(sm)
    sp = sorted(tuple(r) for r in
                fr.discover_from_sitemaps(entries, cands).collect())
    assert len(sp) > 0

    url_fx = ur.url_fixture_sql("t.i")
    hosts_sql = (f"(SELECT DISTINCT {ur.url_host_sql_duck('url')} AS host "
                 f"FROM (SELECT {url_fx} AS url FROM range(0, {n}) t(i)) d "
                 f"WHERE {ur.url_host_sql_duck('url')} IS NOT NULL) h")
    entries_sql = rb.parse_sitemap_sql_duck(
        f"(SELECT host, {rb.sitemap_fixture_sql('host')} AS xml "
        f"FROM {hosts_sql}) sm")
    du = duckdb.connect().execute(
        fr.discover_from_sitemaps_sql_duck(
            f"({entries_sql}) e",
            f"(SELECT {url_fx} AS url FROM range(0, {n}) t(i)) s")
        + " ORDER BY canon_url").fetchall()
    assert sp == [tuple(r) for r in du]
