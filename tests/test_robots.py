"""Robots Exclusion Protocol gate (operators/robots.py): RFC 9309 group
and matching semantics by hand-case, the LIKE-escape path, the max_by
NULL-skip contract both twins lean on, and full cross-engine value parity
on the fixture corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import robots as rb
from omnition_opentelemetry_service_spark.operators import urls as ur

RTXT = (
    "# leading comment\r\n"
    "Disallow: /early\r\n"            # before any group: ignored
    "User-agent: OtherBot\n"
    "User-agent: trainbot\n"          # contiguous agents share the group
    "Disallow: /private*\n"
    "Allow: /private/ok$\n"
    "Sitemap: http://x.example.com/s\n"  # unknown directive: ignored
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"                   # must NOT apply: specific group wins
)


def _gate(spark, urls: list[str], txt: str = RTXT,
          agent: str = "trainbot") -> dict[str, bool]:
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    robots = spark.createDataFrame(
        [("h.example.com", txt)], "host string, robots_txt string")
    out = rb.robots_gate(docs, robots, agent=agent)
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_rfc_group_and_match_semantics(spark):
    base = "http://h.example.com"
    v = _gate(spark, [
        f"{base}/x",              # no trainbot rule matches → allowed
        f"{base}/early",          # rule outside any group is dead
        f"{base}/private/stuff",  # Disallow /private* → blocked
        f"{base}/private/ok",     # anchored Allow outscores (tie → allow)
        f"{base}/private/ok2",    # $ anchor must not match a longer path
        "http://unknown.example.com/private/x",  # no robots → allowed
        None,                     # NULL url fails open
    ])
    assert v[f"{base}/x"] is True
    assert v[f"{base}/early"] is True
    assert v[f"{base}/private/stuff"] is False
    assert v[f"{base}/private/ok"] is True
    assert v[f"{base}/private/ok2"] is False
    assert v["http://unknown.example.com/private/x"] is True
    assert v[None] is True


def test_star_group_applies_to_unlisted_agent(spark):
    v = _gate(spark, ["http://h.example.com/anything"], agent="newbot")
    assert v["http://h.example.com/anything"] is False  # '*' Disallow: /


def test_agent_match_case_insensitive_and_other_group_excluded(spark):
    v = _gate(spark, ["http://h.example.com/private/a",
                      "http://h.example.com/ok"], agent="TrainBot")
    assert v["http://h.example.com/private/a"] is False
    assert v["http://h.example.com/ok"] is True


def test_unsafe_agent_rejected():
    with pytest.raises(ValueError, match="literal-safe"):
        rb.parse_robots_sql_duck("robots", agent="x'; DROP--")


def test_like_metachars_are_literal(spark):
    txt = ("User-agent: *\n"
           "Disallow: /100%*\n"
           "Disallow: /a_b$\n")
    base = "http://h.example.com"
    v = _gate(spark, [f"{base}/100%off", f"{base}/1000off",
                      f"{base}/a_b", f"{base}/axb"], txt=txt)
    assert v[f"{base}/100%off"] is False  # % matched literally
    assert v[f"{base}/1000off"] is True   # would be blocked if % leaked
    assert v[f"{base}/a_b"] is False      # _ matched literally
    assert v[f"{base}/axb"] is True       # would be blocked if _ leaked


def test_empty_disallow_means_allow_all(spark):
    txt = "User-agent: *\nDisallow:\n"
    v = _gate(spark, ["http://h.example.com/x"], txt=txt)
    assert v["http://h.example.com/x"] is True


def test_query_matched_fragment_stripped(spark):
    txt = "User-agent: *\nDisallow: /p?*utm*\n"
    base = "http://h.example.com"
    v = _gate(spark, [f"{base}/p?utm_source=x", f"{base}/p#utm_frag"],
              txt=txt)
    assert v[f"{base}/p?utm_source=x"] is False  # query IS matched
    assert v[f"{base}/p#utm_frag"] is True       # fragment is NOT


def test_max_by_skips_null_ordering_rows(spark):
    """Both verdict aggregates hinge on max_by/arg_max ignoring rows whose
    score is NULL (non-matching rules) — pin the engine contract."""
    got = spark.sql(
        "SELECT max_by(t, s) FROM VALUES ('a', 1), ('b', NULL), ('c', 0) "
        "AS v(t, s)").collect()[0][0]
    assert got == "a"
    assert spark.sql("SELECT max_by(t, s) FROM VALUES ('b', CAST(NULL AS "
                     "INT)) AS v(t, s)").collect()[0][0] is None
    con = duckdb.connect()
    assert con.execute("SELECT arg_max(t, s) FROM (VALUES ('a', 1), "
                       "('b', NULL), ('c', 0)) v(t, s)").fetchone()[0] == "a"
    assert con.execute("SELECT arg_max(t, s) FROM (VALUES ('b', "
                       "CAST(NULL AS INT))) v(t, s)").fetchone()[0] is None


def _fixture_docs_robots(spark, n=400):
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(ur.url_fixture_sql("id")).alias("url"))
    hosts = (docs.select(ur.url_host("url").alias("host"))
             .distinct().filter("host IS NOT NULL"))
    robots = hosts.select(
        "host", F.expr(rb.robots_fixture_sql("host")).alias("robots_txt"))
    return docs, robots


def test_inline_gate_equals_aggregate_gate(spark):
    """robots_gate_inline (zero-shuffle HOF fold, the pipeline form) must
    produce the same verdict per doc as robots_gate (the oracle-matching
    aggregate form) on the full fixture — including ties, anchors,
    NULL-url fail-open and specific-vs-'*' group choice."""
    docs, robots = _fixture_docs_robots(spark)
    agg = {r["doc_id"]: r["allowed"]
           for r in rb.robots_gate(docs, robots).collect()}
    inline, drop = rb.robots_gate_inline(docs, robots)
    got = {r["doc_id"]: not r["dropped"]
           for r in inline.select("doc_id",
                                  drop.alias("dropped")).collect()}
    assert got == agg
    assert sum(1 for v in got.values() if not v) > 0


def test_inline_gate_plan_is_broadcast_no_shuffle(spark):
    """The pipeline form must not add an exchange to the doc stream: the
    rules side broadcasts, the verdict is a projection."""
    docs, robots = _fixture_docs_robots(spark, n=50)
    inline, drop = rb.robots_gate_inline(docs, robots)
    plan = (inline.filter(~drop)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    doc_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in doc_side


def test_web_ingest_robots_stage(spark):
    """Composition: the politeness stage drops exactly the disallowed
    docs before URL dedup, and its counter reconciles."""
    from jobs.web_ingest import web_ingest
    from omnition_opentelemetry_service_spark.metrics import StageCounters

    base = "http://h.example.com"
    rows = [(i, f"{base}/private/p{i}" if i % 3 == 0 else f"{base}/pub/p{i}",
             f"<p>Doc {i} is the body of the page and it is fine.</p>",
             "web") for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, html string, source string")
    robots = spark.createDataFrame(
        [("h.example.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string")
    counters = StageCounters()
    out = web_ingest(docs, robots=robots, quality_min=0.0,
                     counters=counters)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {i for i in range(30) if i % 3 != 0}
    stages = {(s, t): (rec, drop)
              for s, t, rec, drop in counters.harvest()}
    assert stages[("web_ingest", "robots")] == (30, 10)
    spark.catalog.clearCache()


def test_crawl_delay_group_scoping_and_fold(spark):
    """Crawl-delay rides the same RFC group choice as allow/disallow:
    specific-agent groups exclude '*', non-numeric values are ignored,
    several applicable values fold to max (most conservative), and a
    rule BETWEEN two agent lines must not split their shared group."""
    txt = ("User-agent: otherbot\n"
           "Crawl-delay: 99\n"            # other group: must not apply
           "User-agent: a\n"
           "Disallow: /x\n"               # non-scoped line between agents
           "User-agent: trainbot\n"       # still shares a's group block
           "Crawl-delay: fast\n"          # non-numeric → ignored
           "Crawl-delay: 2.5\n"
           "Crawl-delay: 4\n"
           "User-agent: *\n"
           "Crawl-delay: 7\n")
    robots = spark.createDataFrame(
        [("h1", txt), ("h2", "User-agent: *\nDisallow: /\n"),
         ("h3", "User-agent: *\nCrawl-delay: soon\n")],
        "host string, robots_txt string")
    got = {r["host"]: r["crawl_delay"]
           for r in rb.crawl_delays(robots).collect()}
    assert got == {"h1": 4.0}  # h2: no delay; h3: only non-numeric


def test_sitemap_urls_are_global_not_group_scoped(spark):
    txt = ("Sitemap: https://h/s1.xml\n"
           "User-agent: otherbot\n"
           "Sitemap: https://h/s2.xml\n"   # inside a foreign group: still on
           "User-agent: *\n"
           "Disallow: /\n")
    robots = spark.createDataFrame(
        [("h", txt)], "host string, robots_txt string")
    got = sorted(r["sitemap_url"]
                 for r in rb.sitemap_urls(robots).collect())
    assert got == ["https://h/s1.xml", "https://h/s2.xml"]


def test_parse_sitemap_entities_trim_and_index(spark):
    xml = ('<?xml version="1.0"?>\n<urlset>\n'
           "<url>\n  <loc>  https://h/p?a=1&amp;b=2&lt;3  </loc>\n"
           "  <lastmod>2026-02-03</lastmod>\n</url>\n"
           "<url><loc>https://h/plain</loc></url>\n"
           "<url><loc></loc></url>\n"           # empty loc → dropped
           "<sitemap><loc>https://h/more.xml</loc></sitemap>\n"
           "</urlset>")
    sm = spark.createDataFrame([("h", xml)], "host string, xml string")
    rows = sorted((r["kind"], r["loc"], r["lastmod"])
                  for r in rb.parse_sitemap(sm).collect())
    assert rows == [
        ("sitemap", "https://h/more.xml", None),
        ("url", "https://h/p?a=1&b=2<3", "2026-02-03"),
        ("url", "https://h/plain", None)]  # empty-loc entry dropped


def test_cross_engine_value_parity(spark):
    """Full twin equality over the url fixture + robots fixture — every
    column, every row, including matched rule provenance."""
    n = 400
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(ur.url_fixture_sql("id")).alias("url"))
    hosts = (docs.select(ur.url_host("url").alias("host"))
             .distinct().filter("host IS NOT NULL"))
    robots = hosts.select(
        "host", F.expr(rb.robots_fixture_sql("host")).alias("robots_txt"))
    out = rb.robots_gate(docs, robots).orderBy("doc_id")
    sp = [(r.doc_id, r.url, r.host, r.allowed, r.matched_rule,
           r.matched_pattern) for r in out.collect()]

    url_fx = ur.url_fixture_sql("t.i")
    docs_tbl = (f"(SELECT t.i AS doc_id, {url_fx} AS url "
                f"FROM range(0, {n}) t(i)) dsrc")
    robots_tbl = (
        f"(SELECT host, {rb.robots_fixture_sql('host')} AS robots_txt "
        f"FROM (SELECT DISTINCT {ur.url_host_sql_duck('url')} AS host "
        f"FROM (SELECT t.i AS doc_id, {url_fx} AS url "
        f"FROM range(0, {n}) t(i)) d0 "
        f"WHERE {ur.url_host_sql_duck('url')} IS NOT NULL) h) rsrc")
    du = duckdb.connect().execute(
        rb.robots_gate_sql_duck(docs_tbl, robots_tbl)
        + " ORDER BY doc_id").fetchall()
    assert sp == [tuple(r) for r in du]
    blocked = sum(1 for r in sp if not r[3])
    assert 0 < blocked < n  # the gate binds both ways
    # both group regimes exercised: specific-agent hosts and '*' hosts
    assert {r[4] for r in sp} >= {"allow", "disallow", None}


def test_crawl_delay_not_leaked_across_rule_separated_groups(spark):
    """'ua:a / disallow:/x / ua:b / crawl-delay:7': the disallow line
    TERMINATES a's agent-line run, so the delay scopes to b ONLY — a must
    get no delay (the naive delay-only block formation merged a and b and
    throttled a 7x; review finding)."""
    from omnition_opentelemetry_service_spark.operators import robots as rb

    txt = ("User-agent: a\nDisallow: /x\n"
           "User-agent: b\nCrawl-delay: 7\n")
    df = spark.createDataFrame([("h1", txt)], "host string, robots_txt string")
    assert rb.crawl_delays(df, agent="a").collect() == []
    got = rb.crawl_delays(df, agent="b").collect()
    assert len(got) == 1 and got[0].crawl_delay == 7.0
    # and a's DISALLOW rule still applies to a only
    ra = {(r.rule_type, r.pattern) for r in
          rb.parse_robots(df, agent="a").collect()}
    assert ra == {("disallow", "/x")}
    assert rb.parse_robots(df, agent="b").collect() == []


def test_matched_pattern_deterministic_on_score_ties(spark):
    """Two same-octet same-type patterns both matching: the reported
    matched_pattern must be the deterministic (score, pattern)-max in
    BOTH engines — not whichever row max_by saw last."""
    import duckdb

    from omnition_opentelemetry_service_spark.operators import robots as rb

    txt = "User-agent: *\nDisallow: /ab*\nDisallow: /a*b\n"
    robots = spark.createDataFrame([("h1", txt)],
                                   "host string, robots_txt string")
    docs = spark.createDataFrame([(1, "http://h1/ab")],
                                 "doc_id long, url string")
    for _ in range(3):  # stable across repeated runs
        r = rb.robots_gate(docs, robots).collect()[0]
        assert (r.allowed, r.matched_rule, r.matched_pattern) == \
            (False, "disallow", "/ab*")  # '/ab*' > '/a*b' lexicographically

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, url VARCHAR)")
    con.execute("INSERT INTO d VALUES (1, 'http://h1/ab')")
    con.execute("CREATE TABLE r (host VARCHAR, robots_txt VARCHAR)")
    con.execute("INSERT INTO r VALUES ('h1', ?)", [txt])
    row = con.execute(rb.robots_gate_sql_duck("d", "r")).fetchall()[0]
    assert row[3] is False and row[4] == "disallow" and row[5] == "/ab*"
