"""Host-reputation gate (corpus.host_quality_gate): exact-integer
threshold semantics, NULL-host exemption, boundary inclusivity, DuckDB
parity on the fixture corpus."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.functions import text as tx
from omnition_opentelemetry_service_spark.operators import corpus as cp
from omnition_opentelemetry_service_spark.operators import urls as ur
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _hosted(spark):
    docs = load(spark, SF, "documents")
    return docs.select(
        "doc_id", "text",
        ur.url_host(
            f"({ur.url_fixture_sql('doc_id')})").alias("host"))


def test_matches_duckdb_on_fixture(spark):
    th = 0.77  # splits the fixture's host means (0.725..0.82)
    out = cp.host_quality_gate(_hosted(spark), min_host_quality=th)
    got = {(r.doc_id, r.host) for r in out.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"""CREATE TEMP VIEW hosted AS
      SELECT doc_id, text,
             {ur.url_host_sql_duck(f"({ur.url_fixture_sql('doc_id')})")}
               AS host
      FROM documents""")
    want = set(map(tuple, con.execute(
        f"SELECT doc_id, host FROM hosted "
        f"WHERE {cp.host_quality_gate_pred_duck('hosted', th)}"
    ).fetchall()))
    assert got == want
    # non-vacuous both ways: some hosts pass, some fail
    n_all = 500
    assert 0 < len(got) < n_all


def test_bad_host_falls_together_null_host_exempt(spark):
    rows = [
        # host A: high quality (stopword-rich, low punct, mid length)
        (1, "the cat and the dog sat in the house that it is", "a.com"),
        (2, "it is the tree and the bird of the sky that is", "a.com"),
        # host B: junk (no stopwords, punct-heavy)
        (3, "x;y;z;q;w;e;r;t;y;u;i;o;p", "b.com"),
        (4, "1;2;3;4;5;6;7;8;9;0;1;2;3", "b.com"),
        # no host: exempt regardless of quality
        (5, ";;;;;;;", None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, host string")
    kept = {r.doc_id for r in
            cp.host_quality_gate(df, min_host_quality=0.5).collect()}
    assert kept == {1, 2, 5}


def test_boundary_mean_equal_threshold_kept(spark):
    rows = [(1, "plain words here without stop terms at all", "c.com")]
    df = spark.createDataFrame(rows, "doc_id int, text string, host string")
    q = df.select(tx.quality_score("text").alias("q")).collect()[0].q
    kept = cp.host_quality_gate(df, min_host_quality=q).count()
    assert kept == 1  # >= is inclusive at the exact integer boundary
    kept2 = cp.host_quality_gate(df, min_host_quality=q + 1e-6).count()
    assert kept2 == 0


def test_no_corpus_sized_window(spark):
    plan = (cp.host_quality_gate(_hosted(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
