"""Host link graph (operators/linkgraph.py): anchor-scope hand cases,
edge-list semantics, integer-exact PageRank vs both the python model and
the DuckDB unrolled-CTE twin, degree parity, plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import linkgraph as lg
from omnition_opentelemetry_service_spark.operators import urls as ur


def _pages_sql_duck(n: int) -> str:
    return (f"SELECT i AS doc_id, {ur.url_fixture_sql('i')} AS url, "
            f"{lg.link_fixture_sql('CAST(i AS VARCHAR)', 'i')} AS html "
            f"FROM range(0, {n}) t(i)")


def _pages_spark(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(ur.url_fixture_sql("id")).alias("url"),
        F.expr(lg.link_fixture_sql("CAST(id AS STRING)", "id"))
        .alias("html"))


def test_extract_links_scope(spark):
    pages = spark.createDataFrame(
        [(1, '<a href="https://a.com/x">t</a>'
             '<A CLASS="z" HREF="https://b.com/y">u</A>'
             "<a href='https://c.com/sq'>skip</a>"   # single-quoted: out
             '<abbr href="https://d.com/n">no</abbr>'  # not an <a> tag
             '<a href="/rel">kept as href</a>'),
         (2, None)],                                  # NULL html → 0 rows
        "doc_id long, html string")
    got = sorted((r["doc_id"], r["href"])
                 for r in lg.extract_links(pages).collect())
    assert got == [(1, "/rel"), (1, "https://a.com/x"),
                   (1, "https://b.com/y")]


def test_host_edges_semantics(spark):
    pages = spark.createDataFrame(
        [(1, "https://www.src.com/p",
          '<a href="https://DST.com:443/q">x</a>'      # canon: dst.com
          '<a href="https://src.com/self">s</a>'        # self-loop: drop
          '<a href="/rel">r</a>'                        # no host: drop
          '<a href="https://dst.com/other">dup</a>'),   # same pair: dedup
         (2, None, '<a href="https://dst.com/q">x</a>')],  # NULL src: drop
        "doc_id long, url string, html string")
    got = sorted(tuple(r) for r in lg.host_edges(pages).collect())
    assert got == [("src.com", "dst.com")]


def test_rank_params():
    for kw in ({"iters": 0}, {"unit": 0}, {"num": 0}, {"num": 20},
               {"num": 21}):
        with pytest.raises(ValueError):
            lg.host_rank_sql_duck("e", **kw)


def test_rank_hand_graph_vs_model(spark):
    # a → b → c, c dangling; star into b from a,d
    edges = [("a", "b"), ("a", "d"), ("b", "c"), ("d", "b")]
    edf = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["rank_micro"]
           for r in lg.host_rank(edf, iters=3).collect()}
    assert got == lg.host_rank_model(edges, iters=3)
    # dangling c holds mass above bare teleport; b (2 in-links) tops a
    assert got["c"] > 150_000 and got["b"] > got["a"]
    spark.catalog.clearCache()


def test_fixture_parity_spark_duck(spark):
    """Full value parity over the link fixture: edges, degrees and the
    3-iteration rank all hash-identical across engines."""
    n = 300
    pages = _pages_spark(spark, n)
    pages_sql = _pages_sql_duck(n)
    con = duckdb.connect()

    sp_e = sorted(tuple(r) for r in lg.host_edges(pages).collect())
    du_e = con.execute(lg.host_edges_sql_duck(pages_sql)
                       + " ORDER BY src_host, dst_host").fetchall()
    assert sp_e == [tuple(r) for r in du_e] and len(sp_e) > 50

    edf = lg.host_edges(pages)
    e_sql = lg.host_edges_sql_duck(pages_sql)

    sp_d = sorted(tuple(r) for r in lg.host_degrees(edf).collect())
    du_d = con.execute(lg.host_degrees_sql_duck(e_sql)
                       + " ORDER BY host").fetchall()
    assert sp_d == [tuple(r) for r in du_d]
    # dangling sinks present: in-links, zero out
    assert any(o == 0 and i > 0 for _, o, i in sp_d)

    sp_r = sorted(tuple(r) for r in lg.host_rank(edf).collect())
    du_r = con.execute(lg.host_rank_sql_duck(e_sql)
                       + " ORDER BY host").fetchall()
    assert sp_r == [tuple(r) for r in du_r]
    assert all(r > 0 for _, r in sp_r)
    # model triple-check on the same edge list
    assert dict(sp_r) == lg.host_rank_model(sp_e)
    spark.catalog.clearCache()


def test_anchor_texts_semantics(spark):
    pages = spark.createDataFrame(
        [(1, "https://src.com/p",
          '<a href="https://dst.com/q">Read This</a>'
          '<a href="https://src.com/self">self nav</a>'   # same-host: drop
          '<a href="https://dst.com/r"><b>wrapped</b></a>'  # '' text: drop
          '<a href="https://dst.com/s">   </a>'             # blank: drop
          '<a href="/rel">relative</a>'                     # no host: drop
          '<a href="mailto:bob@junk.example.com">contact</a>'  # scheme gate
          '<a href="javascript:void(0)">js</a>'),              # scheme gate
         (2, None, '<a href="https://dst.com/q">no src</a>')],
        "doc_id long, url string, html string")
    got = sorted(tuple(r) for r in lg.anchor_texts(pages).collect())
    # the mailto target must NOT mint a junk.example.com dst_host — the
    # is_fetchable gate runs BEFORE host extraction (host_edges rule)
    assert got == [("dst.com", "Read This")]


def test_anchor_profile_topk(spark):
    anchors = spark.createDataFrame(
        [("h", "read the docs"), ("h", "read more"), ("h", "THE source"),
         ("g", "one")],
        "dst_host string, anchor string")
    got = sorted(tuple(r) for r in
                 lg.anchor_term_profile(anchors, topk=2).collect())
    # 'read' (2) and 'the' (2, case-folded) tie-break alphabetically
    assert got == [("g", "one", 1, 1), ("h", "read", 2, 1),
                   ("h", "the", 2, 2)]
    with pytest.raises(ValueError):
        lg.anchor_term_profile_sql_duck("a", topk=0)


def test_anchor_fixture_parity(spark):
    n = 300
    sp_a = sorted(tuple(r) for r in
                  lg.anchor_texts(_pages_spark(spark, n)).collect())
    con = duckdb.connect()
    a_sql = lg.anchor_texts_sql_duck(_pages_sql_duck(n))
    du_a = con.execute(a_sql + " ORDER BY dst_host, anchor").fetchall()
    assert sp_a == [tuple(r) for r in du_a] and len(sp_a) > 300

    sp_p = sorted(tuple(r) for r in lg.anchor_term_profile(
        lg.anchor_texts(_pages_spark(spark, n)), topk=3).collect())
    du_p = con.execute(
        lg.anchor_term_profile_sql_duck(a_sql, topk=3)).fetchall()
    assert sp_p == sorted(tuple(r) for r in du_p)
    # dangling sinks carry their 'mirror archive' profile
    assert any(h.startswith("sink") and t == "archive"
               for h, t, _, _ in sp_p)


def test_allocate_budget_hand(spark):
    # T=5, budget 7: bases 4/1/1, leftover 1 → largest remainder wins
    # (b and c tie at rem 2; host-asc gives b the slot)
    ranks = spark.createDataFrame(
        [("a", 3), ("b", 1), ("c", 1)], "host string, rank_micro long")
    got = {r["host"]: r["n_slots"]
           for r in lg.allocate_budget(ranks, 7).collect()}
    assert got == {"a": 4, "b": 2, "c": 1}
    with pytest.raises(ValueError):
        lg.allocate_budget_sql_duck("rk", -1)


def test_allocate_budget_parity_and_sum(spark):
    n = 300
    edf = lg.host_edges(_pages_spark(spark, n))
    ranks = lg.host_rank(edf)
    for budget in (0, 1, 97, 1000):
        sp = sorted(tuple(r) for r in
                    lg.allocate_budget(ranks, budget).collect())
        du = duckdb.connect().execute(
            lg.allocate_budget_sql_duck(
                lg.host_rank_sql_duck(
                    lg.host_edges_sql_duck(_pages_sql_duck(n))), budget)
            + " ORDER BY host").fetchall()
        assert sp == [tuple(r) for r in du]
        assert sum(s for _, s in sp) == budget  # exact apportionment
    spark.catalog.clearCache()


def test_budgeted_frontier_cuts_per_host(spark):
    sched = spark.createDataFrame(
        [("h1", i, f"u{i}", float(i), i) for i in range(5)]
        + [("h2", i, f"v{i}", float(i), 10 + i) for i in range(3)],
        "host string, fetch_seq long, url string, scheduled_at double, "
        "url_id long")
    alloc = spark.createDataFrame(
        [("h1", 2), ("h3", 9)], "host string, n_slots long")
    got = sorted((r["host"], r["fetch_seq"])
                 for r in lg.budgeted_frontier(sched, alloc).collect())
    # h1 capped at 2 slots; h2 unranked → nothing; h3 has no urls
    assert got == [("h1", 0), ("h1", 1)]


def test_rank_plan_no_data_cartesian(spark):
    """The only nested-loop joins are the 1-row scalar broadcasts; the
    rank⋈edges join is an equi-join; no CartesianProduct node. host_rank
    checkpoints each iteration (hiding the join tree from the final
    plan), so inspect one un-checkpointed _rank_step directly."""
    from pyspark.sql import functions as F
    n = 120
    edges = lg.host_edges(_pages_spark(spark, n))
    hosts = (edges.select(F.col("src_host").alias("host"))
             .unionByName(edges.select(F.col("dst_host").alias("host")))
             .distinct())
    outd = (edges.groupBy(F.col("src_host").alias("host"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("out_deg")))
    base = hosts.join(outd, "host", "left")
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n_hosts"))
    r0 = base.select("host", "out_deg",
                     F.lit(1_000_000).cast("bigint").alias("r"))
    step = lg._rank_step(base, edges, r0,
                         n_df, lg._new_rank_expr("spark", 17, 20, 1_000_000),
                         lg._DIV["spark"])
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # the full operator still runs green end-to-end with checkpointing
    assert lg.host_rank(edges, iters=2).count() > 0
    spark.catalog.clearCache()


def test_non_fetchable_schemes_never_become_hosts(spark):
    """mailto:/javascript:/tel:/data: hrefs must not mint graph hosts or
    frontier candidates — URL_PAT's tolerant authority group would parse
    them to junk hosts (review finding)."""
    html = ('<a href="mailto:bob@example.com">m</a>'
            '<a href="javascript:void(0)">j</a>'
            '<a href="tel:+15551234567">t</a>'
            '<a href="data:text/plain;base64,aGk=">d</a>'
            '<a href="https://real.com/page">ok</a>')
    pages = spark.createDataFrame(
        [("http://src.com/a", html)], "url string, html string")
    edges = lg.host_edges(pages).collect()
    assert {(e.src_host, e.dst_host) for e in edges} == \
        {("src.com", "real.com")}

    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE p (url VARCHAR, html VARCHAR)")
    con.execute("INSERT INTO p VALUES (?, ?)", ["http://src.com/a", html])
    got = con.execute(lg.host_edges_sql_duck("SELECT * FROM p")).fetchall()
    assert set(got) == {("src.com", "real.com")}
