"""Inverted index + BM25 top-k serving (operators/postings.py): posting
construction hand-cases, EXACT cross-form equality vs the full-scan
relevance.bm25_scores, DuckDB twin parity, partition-pruned query plan
over a term-partitioned index, edge semantics."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import postings as ps
from omnition_opentelemetry_service_spark.operators import relevance as rv

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles and broadcast joins at corpus scale"),
    (2, "the fox and the dog and the fox again"),
    (3, "completely unrelated text about embeddings"),
    (4, ""),
    (5, "   "),
    (6, None),
    (7, "FOX Fox fox"),          # case folding → tf=3
    (8, "a very long document " + "filler word soup " * 40 + "fox"),
]
TERMS = ["fox", "dog", "spark"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_build_postings_hand(spark, docs):
    p = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
         for r in ps.build_postings(docs).collect()}
    assert p[("fox", 2)] == (2, 9)       # two 'fox' in a 9-word doc
    assert p[("fox", 7)] == (3, 3)       # case-folded
    assert p[("dog", 0)] == (1, 9)
    # empty / blank / NULL docs emit nothing
    assert not any(d in (4, 5, 6) for _, d in p)


def test_params():
    with pytest.raises(ValueError):
        ps.bm25_topk_sql_duck("documents", ["fox"], k=0)
    with pytest.raises(ValueError):
        ps.bm25_topk_sql_duck("documents", [])


def test_cross_form_equality(spark, docs):
    """Postings top-k == the full-scan form's top-k restricted to docs
    containing >= 1 query term — EXACT doubles, same tiebreak."""
    n, sdl = ps.index_stats(docs)
    idx = ps.build_postings(docs)
    got = [(r["doc_id"], r["bm25"])
           for r in ps.bm25_topk(idx, n, sdl, TERMS, k=4).collect()]
    scan = rv.bm25_scores(docs, TERMS)
    ws = F.expr(
        "size(filter(split(lower(trim(text)), '[ ]+'), "
        "w -> w IN ('fox', 'dog', 'spark'))) > 0")
    matching = {r["doc_id"] for r in docs.filter(ws).collect()}
    want = [(r["doc_id"], r["bm25"]) for r in scan
            .filter(F.col("doc_id").isin(list(matching)))
            .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(4).collect()]
    assert got == want and len(got) == 4


def test_duck_twin_parity(spark, docs):
    got = [(r["doc_id"], r["bm25"]) for r in ps.bm25_topk(
        ps.build_postings(docs), *ps.index_stats(docs), TERMS, k=5)
        .collect()]
    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = [(int(r[0]), float(r[1])) for r in con.execute(
        ps.bm25_topk_sql_duck("SELECT * FROM docs_t", TERMS, k=5))
        .fetchall()]
    assert got == want

    # postings themselves match too
    sp = sorted(tuple(r) for r in ps.build_postings(docs).collect())
    du = sorted(tuple(r) for r in con.execute(
        ps.build_postings_sql_duck("SELECT * FROM docs_t")).fetchall())
    assert sp == du


def test_absent_term_df0(spark, docs):
    """A term with no postings contributes nothing and breaks nothing."""
    n, sdl = ps.index_stats(docs)
    idx = ps.build_postings(docs)
    with_ghost = ps.bm25_topk(idx, n, sdl, ["fox", "zzzghost"], k=3)
    only_fox = ps.bm25_topk(idx, n, sdl, ["fox"], k=3)
    assert ([(r["doc_id"], r["bm25"]) for r in with_ghost.collect()]
            == [(r["doc_id"], r["bm25"]) for r in only_fox.collect()])


def test_query_prunes_term_partitions(spark, docs, tmp_path):
    """Stored partitioned by term, the query plan scans ONLY the query
    terms' partitions (PartitionFilters carries the IN) — the layout the
    module contract claims."""
    path = str(tmp_path / "idx")
    ps.build_postings(docs).write.partitionBy("term").parquet(path)
    idx = spark.read.parquet(path)
    plan = (ps.bm25_topk(idx, *ps.index_stats(docs), ["fox", "spark"], k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "IN (fox,spark)" in plan


def test_index_stats_all_null_text_is_contract_error(spark):
    """Non-empty corpus, every text NULL: a clear ValueError, not
    int(None) (review finding)."""
    import pytest

    from omnition_opentelemetry_service_spark.operators import postings as po

    df = spark.createDataFrame([(1, None), (2, None)],
                               "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        po.index_stats(df)
