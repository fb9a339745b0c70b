"""MinHash LSH quality contract (dedup.minhash_capture_curve): measured
per-Jaccard-decile capture vs the exact all-pairs truth, DuckDB parity,
and pinned floors a banding regression would trip (the MinHash mirror of
tests/test_ann_recall.py)."""

from __future__ import annotations

import duckdb

from omnition_opentelemetry_service_spark.operators import dedup as dd
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _curve(spark):
    docs = load(spark, SF, "documents")
    rows = sorted(tuple(r) for r in dd.minhash_capture_curve(docs).collect())
    spark.catalog.clearCache()
    return rows


def test_cross_engine_parity(spark):
    s = _curve(spark)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    d = sorted(tuple(r)
               for r in con.execute(
                   dd.minhash_capture_curve_sql_duck()).fetchall())
    assert s == d


def test_pinned_floors(spark):
    """Near-dup recall floor + candidate-pollution ceiling. Theory for
    b=4, r=4: capture(s) = 1-(1-s^4)^4 — ≥0.998 at s=0.9, ≤0.016 at
    s=0.3. The pins leave sampling slack but trip a real banding bug
    (wrong slice offsets, band-key collisions, permutation regression)."""
    by_bucket = {r[0]: r for r in _curve(spark)}
    # the fixture plants near-identical pairs: they must land in bucket 9
    # and the band join must capture essentially all of them
    assert 9 in by_bucket and by_bucket[9][1] > 0
    assert by_bucket[9][3] >= 0.9
    # low-jaccard buckets: the 4x4 family captures almost none of them
    for b in (0, 1, 2):
        if b in by_bucket:
            assert by_bucket[b][3] <= 0.05, by_bucket[b]


def test_counts_are_all_pairs(spark):
    """n_pairs sums to C(n,2) of the bounded subset — the truth side is
    the full all-pairs table, not a candidate echo."""
    docs = load(spark, SF, "documents")
    n = docs.filter("doc_id < 200").filter("text IS NOT NULL").count()
    rows = _curve(spark)
    assert sum(r[1] for r in rows) == n * (n - 1) // 2
    # captured <= pairs per bucket, and capture_rate is their ratio
    for _, n_pairs, n_cap, rate in rows:
        assert 0 <= n_cap <= n_pairs
        assert abs(rate - round(n_cap / n_pairs, 6)) < 1e-9
