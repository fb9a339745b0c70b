"""C4 heuristic cleaning (corpus.c4_clean — Raffel et al. 2020 §2.2):
rule-level semantic pins, NULL routing, DuckDB value parity over the
deterministic fixture wrapper, and the projection-only plan contract."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import corpus as cp
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _clean_one(spark, text: str | None):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return cp.c4_clean(df).collect()[0]


def _clean_one_duck(text: str | None):
    con = duckdb.connect()
    sql = cp.c4_clean_sql_duck(
        "(SELECT 1 AS doc_id, ? AS text)")
    return con.execute(sql, [text]).fetchone()


def _both(spark, text):
    s = tuple(_clean_one(spark, text))
    d = tuple(_clean_one_duck(text))
    assert s == d, (s, d)
    return s


GOOD = "one two three four five six."  # 6 words, terminal '.'


def test_line_rules(spark):
    # terminal punct required; >= 5 words required; javascript dropped;
    # the three surviving lines clear min_kept_lines so the doc passes
    doc = "\n".join([
        GOOD,
        "no terminal punctuation here at all",
        "Too short.",
        "Enable JavaScript in your browser please.",
        "is this a question with six words?",
        '  he said "the quote ends the line"',
    ])
    (_id, keep, n_lines, n_kept, clean) = _both(spark, doc)
    assert (n_lines, n_kept) == (6, 3)
    assert keep is True
    assert clean == "\n".join([
        GOOD,
        "is this a question with six words?",
        'he said "the quote ends the line"'])


def test_doc_rules(spark):
    three = "\n".join([GOOD] * 3)
    assert _both(spark, three)[1] is True
    # fewer than 3 kept lines
    assert _both(spark, "\n".join([GOOD] * 2))[1] is False
    # lorem ipsum (case-insensitive), curly brace, bad word
    assert _both(spark, three + "\nLorem IPSUM dolor.")[1] is False
    assert _both(spark, three + "\nif (x) { y; }")[1] is False
    assert _both(spark, three + "\nwin at the CASINO tonight friend!")[1] \
        is False
    # dropped doc reports counts but NULL clean_text
    r = _both(spark, three + "\nif (x) { y; }")
    assert r[2] == 4 and r[3] >= 3 and r[4] is None


def test_null_and_empty_text(spark):
    assert _both(spark, None) == (1, False, 0, 0, None)
    assert _both(spark, "")[1] is False


def test_min_words_boundary(spark):
    four = "one two three four."
    five = "one two three four five."
    assert _both(spark, "\n".join([four] * 3))[1] is False
    assert _both(spark, "\n".join([five] * 3))[1] is True


def test_fixture_corpus_parity_and_binding(spark):
    docs = load(spark, SF, "documents")
    wrapped = docs.select(
        "doc_id", F.expr(cp.c4_fixture_sql()).alias("text"))
    s = sorted(tuple(r) for r in cp.c4_clean(wrapped).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    inner = (f"(SELECT doc_id, {cp.c4_fixture_sql('text', 'doc_id')} "
             f"AS text FROM documents)")
    d = sorted(tuple(r)
               for r in con.execute(cp.c4_clean_sql_duck(inner)).fetchall())
    assert s == d
    keeps = sum(1 for r in s if r[1])
    assert 0 < keeps < len(s)  # the gate binds both ways


def test_plan_is_projection_only(spark):
    docs = load(spark, SF, "documents")
    plan = cp.c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # doc-local: zero shuffle
