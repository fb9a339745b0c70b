"""HTML → text extraction (functions/html.py): rule-level semantic pins +
DuckDB value parity + the projection-only plan contract."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.functions import html as hh
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _strip(spark, html: str | None) -> str | None:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(hh.strip_html("html").alias("t")).collect()[0].t


def _strip_duck(html: str | None) -> str | None:
    con = duckdb.connect()
    return con.execute(
        f"SELECT {hh.strip_html_sql_duck('h')} FROM (SELECT ? AS h)",
        [html]).fetchone()[0]


def _both(spark, html):
    s, d = _strip(spark, html), _strip_duck(html)
    assert s == d, (s, d)
    return s


def test_script_style_comment_blocks_dropped(spark):
    assert _both(
        spark,
        '<style>p{x:1}</style><SCRIPT a="b">if(a<b){}</SCRIPT>'
        "<!-- c <i>x</i> -->hello") == "hello"


def test_block_tags_become_lines_inline_tags_spaces(spark):
    assert _both(spark, "a</p><p>b") == "a\nb"
    assert _both(spark, "a<i>b</i>c") == "a b c"
    assert _both(spark, "x<br/>y<hr>z") == "x\ny\nz"
    # \b guard: '<param>' must NOT match the '<p ...>' block rule
    assert _both(spark, "a<param x=1>b") == "a b"
    assert _both(spark, '<div class="x">a</div><div>b</div>') == "a\nb"


def test_entity_decode_order_amp_last(spark):
    # '&amp;lt;' is the HTML spelling of the LITERAL text '&lt;' — amp
    # decodes last so no double decode happens.
    assert _both(spark, "&amp;lt; &lt;b&gt; &quot;q&quot; &#39;s&#39; "
                        "a&nbsp;b &copy;") == "&lt; <b> \"q\" 's' a b &copy;"


def test_unclosed_script_degrades_to_tag_strip(spark):
    # no </script>: the block rule can't match; the generic tag strip
    # removes the markup, the body text survives (disclosed semantics).
    assert _both(spark, "<script>var x = 1; keep</p>") == "var x = 1; keep"


def test_multiline_blocks_and_ws_collapse(spark):
    # script body (incl. its newlines) vanishes; source newlines in TEXT
    # survive as line structure, runs collapse, edges strip
    assert _both(spark, "<script>\nline1\nline2\n</script>a\n\n  b\tc\n") \
        == "a\nb c"
    assert _both(spark, "\n\n<p>only</p>\n\n") == "only"


def test_null_propagates(spark):
    assert _strip(spark, None) is None
    assert _strip_duck(None) is None


def test_fixture_corpus_parity(spark):
    docs = load(spark, SF, "documents")
    sdf = (docs.select("doc_id",
                       F.expr(hh.html_fixture_sql()).alias("html"))
           .select("doc_id", hh.strip_html("html").alias("clean")))
    s = {(r.doc_id, r.clean) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    d = set(map(tuple, con.execute(
        f"SELECT doc_id, {hh.strip_html_sql_duck('html')} AS clean "
        f"FROM (SELECT doc_id, {hh.html_fixture_sql()} AS html "
        f"FROM documents)").fetchall()))
    assert s == d
    assert len(s) == 500
    # the wrapper is fully removed: no '<' markup survives except decoded
    # entities, and the title/h1 text is extracted
    assert all(c.startswith("Doc ") for _, c in s)


def test_plan_is_projection_only(spark):
    docs = load(spark, SF, "documents")
    plan = (docs.select(hh.strip_html("text").alias("t"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_custom_element_named_like_script_not_swallowed(spark):
    """<script-loader> must not open a script block that deletes the page
    body up to the real </script> (the \\b tag-name guard)."""
    from omnition_opentelemetry_service_spark.functions import html as hh

    page = ('<script-loader src="x"></script-loader><p>Hello visible</p>'
            '<script>var x=1;</script><p>After</p>')
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    out = df.select(hh.strip_html("html").alias("t")).collect()[0].t
    assert "Hello visible" in out and "After" in out
    assert "var x=1" not in out
