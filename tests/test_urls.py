"""URL canonicalization + URL dedup (operators/urls.py): cross-engine
value parity on adversarial URLs, each canon rule pinned individually,
blocklist semantics, and the no-shuffle / single-exchange plan shapes.
The sf0.01 fixture twins (url_canon, url_dedup_groups) additionally ride
the extras oracle gate in test_consolidated_ops."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import urls as U

CASES = [
    None,
    "",
    "http://www.A.com/",
    "https://a.com:443/x/",
    "HTTP://User:pw@WWW.Ex.COM:80/Path/Sub/?utm_source=t&b=2&a=1#frag",
    "a.com/x//",                          # scheme-less, repeated slashes
    "ftp://a.com/f",                      # non-http scheme still parses
    "http://a.com?gclid=1&utm_x=2",       # tracking-only query
    "http://a.com/p?ref=nav&z=9&a=1&a=1",  # dup params survive the sort
    "site5.example.com/plain",
    "http://a.com/p?",                    # empty query
    "http://a.com/#only-frag",
    "   http://a.com/sp  ",               # crawl-dirty padding
    "http://a.com/p?x=%20&y=a+b",         # percent/plus NOT decoded
    "https://a.com/UPPER/Case?Key=Val",   # path/query case preserved
    "http://a.com:8080/p",                # non-default port preserved
    "http://a.:b.:c/p",                   # junk authority, multiple '.:'
                                          # runs — the root-dot strip must
                                          # replace ALL of them in BOTH
                                          # engines (ADVICE r3: DuckDB
                                          # needs the 'g' option)
    "http://x.example.com.:8080/q",       # root dot before a kept port
]

EXPECT = {
    2: "a.com", 3: "a.com/x",
    4: "ex.com/Path/Sub?a=1&b=2",
    5: "a.com/x", 7: "a.com",
    8: "a.com/p?a=1&a=1&z=9",
    10: "a.com/p", 11: "a.com", 12: "a.com/sp",
    15: "a.com:8080/p",
    16: "a:b:c/p",                         # every '.:' run collapsed
    17: "x.example.com:8080/q",
}


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i long, url string")


def test_canon_rules_pinned(spark, urls_df):
    got = {r.i: r.c for r in urls_df.select(
        "i", U.canonical_url("url").alias("c")).collect()}
    assert got[0] is None          # NULL url -> NULL canon, not ''
    assert got[1] == ""            # empty url -> empty canon
    for i, want in EXPECT.items():
        assert got[i] == want, (i, CASES[i], got[i])


def test_canon_and_host_match_duckdb_exactly(spark, urls_df):
    got = {r.i: (r.c, r.h) for r in urls_df.select(
        "i", U.canonical_url("url").alias("c"),
        U.url_host("url").alias("h")).collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"i": range(len(CASES)), "url": pd.Series(CASES, dtype="object")}))
    duck = {int(a): (b, c) for a, b, c in con.execute(
        f"SELECT i, {U.canonical_url_sql_duck('url')}, "
        f"{U.url_host_sql_duck('url')} FROM t").fetchall()}
    assert got == duck


def test_dedup_groups_collapse_variants(spark):
    # five spellings of ONE page + one genuinely distinct page
    rows = [(1, "http://www.a.com/p"), (2, "https://a.com/p/"),
            (3, "https://a.com:443/p?utm_source=x"),
            (4, "a.com/p#frag"), (5, "http://u@a.com/p"),
            (6, "http://a.com/q"), (7, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.canon_url: (r.keep_id, r.dup_cnt)
           for r in U.url_dedup_groups(df).collect()}
    assert got == {"a.com/p": (1, 5), "a.com/q": (6, 1)}  # NULL excluded

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "url"]))
    duck = {c: (k, n) for c, k, n in con.execute(
        U.url_dedup_groups_sql_duck("SELECT * FROM docs")).fetchall()}
    assert got == duck


def test_blocklist_filter_and_duck_twin(spark):
    rows = [(1, "http://www.bad.com/x"), (2, "https://ok.com/x"),
            (3, "BAD.com:443/y"), (4, None), (5, "http://sub.bad.com/z")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r.doc_id for r in
                  U.host_blocklist_filter(df, ["bad.com"]).collect())
    # www./port/case variants of bad.com all blocked; subdomain is a
    # DIFFERENT host (no registrable-domain walk — documented contract);
    # NULL url passes (blocklist, not allowlist)
    assert kept == [2, 4, 5]
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "url"]))
    duck = sorted(a for (a,) in con.execute(
        f"SELECT doc_id FROM docs WHERE "
        f"{U.host_blocklist_pred_duck(['bad.com'])}").fetchall())
    assert kept == duck


def test_blocklist_rejects_unsafe_literals(spark):
    df = spark.range(1).withColumn("url", F.lit("http://a.com"))
    for bad in ["a'b.com", "", "a.com; DROP", "ü.com"]:
        with pytest.raises(ValueError, match="literal-safe"):
            U.host_blocklist_filter(df, [bad])
        with pytest.raises(ValueError, match="literal-safe"):
            U.host_blocklist_pred_duck([bad])


def test_plan_shapes(spark):
    """canonical_url is projection-only (rides the scan, no exchange);
    url_dedup_groups is exactly ONE exchange — the hash partial/final agg
    pair on canon_url; nothing cartesian anywhere."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p")).alias("url"))
    proj = df.withColumn("c", U.canonical_url("url"))
    plan_p = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_p
    grp = U.url_dedup_groups(df)
    plan_g = grp._jdf.queryExecution().executedPlan().toString()
    assert plan_g.count("Exchange") == 1
    for plan in (plan_p, plan_g):
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_host_identity_port_and_dot_bypass_closed(spark):
    """A crawl source must not dodge the blocklist/politeness identity by
    appending a non-default port or a DNS root dot; relative URLs have
    NULL host (no phantom '' group)."""
    from omnition_opentelemetry_service_spark.operators import urls as ur

    df = spark.createDataFrame(
        [(1, "http://evil.com:8080/x"), (2, "http://evil.com./x"),
         (3, "http://evil.com.:8080/x"), (4, "foo/bar"), (5, "/a/b"),
         (6, "https://ok.com:8443/y")],
        "doc_id long, url string")
    got = {r.doc_id: r.h for r in
           df.select("doc_id", ur.url_host("url").alias("h")).collect()}
    assert got[1] == got[2] == got[3] == "evil.com"
    # schemeless 'foo/bar' is indistinguishable from 'example.com/page'
    # and parses authority 'foo'; a rootless path has NO host
    assert got[4] == "foo" and got[5] is None
    assert got[6] == "ok.com"
    # and the Spark/Duck twins agree on exactly these shapes
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, " + ur.url_host_sql_duck("url") + " AS h FROM "
        "(VALUES (1, 'http://evil.com:8080/x'), (2, 'http://evil.com./x'),"
        " (3, 'http://evil.com.:8080/x'), (4, 'foo/bar'), (5, '/a/b'),"
        " (6, 'https://ok.com:8443/y')) t(doc_id, url)").fetchall()
    assert {d: h for d, h in rows} == got
    # the filter actually drops the ported/dotted spellings now
    kept = {r.doc_id for r in
            ur.host_blocklist_filter(df, ["evil.com"]).collect()}
    assert kept == {4, 5, 6}
    # canon identity still distinguishes ports (different resource)
    canon = {r.doc_id: r.c for r in df.select(
        "doc_id", ur.canonical_url("url").alias("c")).collect()}
    assert canon[1] == "evil.com:8080/x" and canon[2] == "evil.com/x"
