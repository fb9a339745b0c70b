"""BM25 (operators/relevance.py): exact cross-engine parity, an
independent Python model, scale-shape plan asserts, and edge semantics
(empty / NULL / term-free docs)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from omnition_opentelemetry_service_spark.operators import relevance as rv

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles and broadcast joins at corpus scale"),
    (2, "the fox and the dog and the fox again"),
    (3, "completely unrelated text about embeddings"),
    (4, ""),
    (5, "   "),
    (6, None),
    (7, "FOX Fox fox"),  # case folding
    (8, "a very long document " + "filler word soup " * 40 + "fox"),
]
TERMS = ["fox", "dog", "spark"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_duckdb(spark, docs):
    got = sorted((r.doc_id, r.bm25)
                 for r in rv.bm25_scores(docs, TERMS).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted((int(r[0]), float(r[1]) if r[1] is not None else None)
                  for r in con.execute(
                      rv.bm25_scores_sql_duck(TERMS)).fetchall())
    assert got == want


def test_bm25_matches_python_model(spark, docs):
    got = {r.doc_id: r.bm25 for r in rv.bm25_scores(docs, TERMS).collect()}
    words = {i: (t.lower().split() if t else []) for i, t in DOCS
             if t is not None}
    n = len([1 for _i, t in DOCS])  # every row counts, incl NULL text
    # NULL text contributes size=NULL to sdl? — the stats pass counts
    # words of NULL as NULL, which sum() skips; model accordingly
    sdl = sum(len(w) for w in words.values())
    avgdl = float(sdl) / n
    for i, t in DOCS:
        if t is None:
            assert got[i] is None
            continue
        ws = words[i]
        dl = float(len(ws))
        s = 0.0
        for term in TERMS:
            df = sum(1 for w2 in words.values() if term in w2)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = float(ws.count(term))
            s += idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75
                                                 * dl / avgdl))
        assert got[i] == pytest.approx(round(s, 6), abs=2e-6), (i, t)


def test_bm25_ordering_makes_sense(spark, docs):
    got = {r.doc_id: r.bm25 for r in rv.bm25_scores(docs, ["fox"]).collect()}
    # doc 7 is all-fox (highest tf/dl), doc 2 has two foxes, doc 3 none
    assert got[7] > got[2] > got[0] > 0
    assert got[3] == 0.0 and got[1] == 0.0
    assert got[4] == 0.0 and got[5] == 0.0  # empty docs score 0, not NULL
    # length normalization: the fox buried in doc 8's soup scores lowest
    assert 0 < got[8] < got[0]


def test_bm25_score_pass_is_zero_shuffle(spark, docs):
    stats = rv.corpus_stats(docs, TERMS)
    plan = (rv.bm25_scores(docs, TERMS, stats=stats)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_bm25_rejects_unsafe_terms(spark, docs):
    for bad in (["it's"], ["two words"], ["back\\slash"], []):
        with pytest.raises(ValueError):
            rv.bm25_scores(docs, bad)


def test_empty_corpus_raises_contract_error(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        rv.corpus_stats(empty, TERMS)
    with pytest.raises(ValueError, match="empty corpus"):
        rv.bm25_scores(empty, TERMS)
