"""Corpus-wide line-level dedup (operators/corpus.py line_dedup): exact
DuckDB parity, an independent python model, and the C4/RefinedWeb
semantics — boilerplate lines vanish everywhere, blank lines and unique
content survive, order and untrimmed forms are preserved."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from omnition_opentelemetry_service_spark.operators import corpus

BANNER = "This site uses cookies to improve your experience"
DOCS = [
    (0, f"{BANNER}\nunique first doc line\n\n  indented content A"),
    (1, f"  {BANNER} \nunique second doc line"),   # trimmed form matches
    (2, "unique third doc line\nshared twice\nmore content"),
    (3, "shared twice\nunique fourth doc line"),
    (4, "only once here\nnothing shared"),
    (5, ""),            # one blank line, kept
    (6, None),          # NULL stays NULL
    (7, "solo\nsolo\nsolo"),  # within-doc repeats count toward min_count
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_line_dedup(rows, min_count=2):
    counts: dict[str, int] = {}
    for _i, t in rows:
        for raw in (t or "").split("\n") if t is not None else []:
            k = raw.strip(" ")
            if k:
                counts[k] = counts.get(k, 0) + 1
    rm = {k for k, c in counts.items() if c >= min_count}
    out = {}
    for i, t in rows:
        if t is None:
            out[i] = (None, 0, 0)
            continue
        lines = t.split("\n")
        kept = [r for r in lines if r.strip(" ") not in rm or
                r.strip(" ") == ""]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_matches_python_model(docs):
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
           for r in corpus.line_dedup(docs).collect()}
    assert got == py_line_dedup(DOCS)


def test_matches_duckdb(docs):
    got = sorted(map(tuple, corpus.line_dedup(docs).collect()))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(
        (int(r[0]), r[1], int(r[2]), int(r[3]))
        for r in con.execute(corpus.line_dedup_sql_duck()).fetchall())
    assert got == want


def test_semantics(docs):
    got = {r.doc_id: r for r in corpus.line_dedup(docs).collect()}
    # the banner vanishes from BOTH docs (trimmed forms match), untrimmed
    # unique lines keep their original spelling, blank lines survive
    assert got[0].clean_text == "unique first doc line\n\n  indented content A"
    assert got[1].clean_text == "unique second doc line"
    assert got[2].clean_text == "unique third doc line\nmore content"
    assert got[3].clean_text == "unique fourth doc line"
    assert got[4].n_removed == 0
    assert got[5].clean_text == "" and got[5].n_lines == 1
    assert got[6].clean_text is None and got[6].n_lines == 0
    # within-doc repetition reaches min_count on its own
    assert got[7].clean_text == "" and got[7].n_removed == 3


def test_min_count_boundary(docs):
    """min_count=4: 'solo' occurs exactly 3 times -> kept; nothing removed
    anywhere (banner has 2, shared-twice has 2)."""
    got = {r.doc_id: r.n_removed
           for r in corpus.line_dedup(docs, min_count=4).collect()}
    assert all(v == 0 for v in got.values())


def test_common_lines_diagnostic(docs):
    rows = {r.line: r.n_occurrences
            for r in corpus.common_lines(docs).collect()}
    assert rows == {BANNER: 2, "shared twice": 2, "solo": 3}


# --- per-group (host/source) variant: site-local boilerplate ------------

GBANNER = "Copyright Site A - all rights reserved"
GDOCS = [
    (0, "a.com", f"{GBANNER}\npage one content"),
    (1, "a.com", f"  {GBANNER} \npage two content"),  # trimmed-form match
    (2, "b.com", f"{GBANNER}\nb's only page"),  # same line, OTHER host: kept
    (3, "b.com", "b unique\nglobal twice"),
    (4, "c.com", "global twice\nc unique"),     # cross-host pair: both kept
    (5, None, "null-host boiler\nx"),
    (6, None, "null-host boiler\ny"),           # NULL group dedups itself
    (7, "d.com", None),                          # NULL text stays NULL
]


@pytest.fixture(scope="module")
def gdocs(spark):
    return spark.createDataFrame(GDOCS, "doc_id long, source string, text string")


def py_line_dedup_grouped(rows, min_count=2):
    counts: dict[tuple, int] = {}
    for _i, g, t in rows:
        for raw in t.split("\n") if t is not None else []:
            k = raw.strip(" ")
            if k:
                counts[(g, k)] = counts.get((g, k), 0) + 1
    rm = {gk for gk, c in counts.items() if c >= min_count}
    out = {}
    for i, g, t in rows:
        if t is None:
            out[i] = (None, 0, 0)
            continue
        lines = t.split("\n")
        kept = [r for r in lines
                if (g, r.strip(" ")) not in rm or r.strip(" ") == ""]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_grouped_matches_python_model(gdocs):
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
           for r in corpus.line_dedup_grouped(gdocs, "source").collect()}
    want = py_line_dedup_grouped(GDOCS)
    assert got == want
    # the semantics the grouping exists for, stated directly:
    assert got[2][0].startswith(GBANNER)   # other host keeps the banner
    assert got[0][0] == "page one content"  # owning host strips it
    assert got[3][2] == 0 and got[4][2] == 0  # cross-host pair untouched
    assert got[5][2] == 1 and got[6][2] == 1  # NULL group dedups itself


def test_grouped_matches_duckdb(gdocs):
    got = sorted(map(tuple, corpus.line_dedup_grouped(gdocs, "source").collect()))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(
        GDOCS, columns=["doc_id", "source", "text"]))
    duck = sorted(map(tuple, con.execute(
        corpus.line_dedup_grouped_sql_duck("docs")).fetchall()))
    assert got == duck


def test_grouped_by_canonical_host(spark):
    """Composition with the URL layer: group by urls.url_host so the
    www./port spellings of one host share one boilerplate pool."""
    from omnition_opentelemetry_service_spark.operators import urls as U
    rows = [(0, "http://www.a.com/1", "nav bar\nreal content A"),
            (1, "https://a.com:443/2", "nav bar\nreal content B"),
            (2, "http://b.com/1", "nav bar\nb content")]
    df = (spark.createDataFrame(rows, "doc_id long, url string, text string")
          .withColumn("host", U.url_host("url")))
    got = {r.doc_id: r.clean_text
           for r in corpus.line_dedup_grouped(df, "host").collect()}
    assert got == {0: "real content A", 1: "real content B",
                   2: "nav bar\nb content"}
