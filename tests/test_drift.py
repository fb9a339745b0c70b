"""Drift-monitor contracts: cross-engine value parity for the bucket
table and the exact-integer top-k ranking, scalar KL/TVD vs an
independent DuckDB recomputation, and sensitivity (planted shift ranks
first; a same-distribution split scores near zero)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import drift

SF_DIR = "/root/testdata/sf0.01"
DOCS = f"{SF_DIR}/documents.parquet"
B = 512  # small bucket space so collisions are exercised


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(DOCS).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return c


WA, WB = "source = 'src0'", "source <> 'src0'"


def test_bucket_counts_match_duckdb(docs, con):
    got = sorted(map(tuple, drift.drift_bucket_counts(
        docs.filter(WA), docs.filter(WB), B).collect()))
    want = sorted(map(tuple, con.execute(
        drift.drift_bucket_counts_sql_duck(WA, WB, B)).fetchall()))
    assert got == want
    assert 0 < len(got) <= B


def test_topk_matches_duckdb_exactly(docs, con):
    """Ranking + the DECIMAL drift numerator are exact in both engines
    (the integer common-denominator trick — no float ordering surface)."""
    got = [(r.b, r.c_a, r.c_b, int(r.drift_num))
           for r in drift.drift_topk(
               docs.filter(WA), docs.filter(WB), k=25,
               n_buckets=B).collect()]
    want = [(b, ca, cb, int(d)) for b, ca, cb, d in con.execute(
        drift.drift_topk_sql_duck(WA, WB, 25, B)).fetchall()]
    assert got == want
    assert len(got) == 25


def test_planted_shift_ranks_first(spark):
    """A gram present only in corpus A must top the drift ranking."""
    base = [(i, "alpha beta gamma delta") for i in range(40)]
    a = spark.createDataFrame(
        base + [(100 + i, "zzqx zzqx zzqx zzqx zzqx") for i in range(40)],
        "doc_id long, text string")
    b = spark.createDataFrame(base, "doc_id long, text string")
    top = drift.drift_topk(a, b, k=3, n_buckets=B).collect()
    from omnition_opentelemetry_service_spark.operators.dsir import \
        _bucket_sql_spark
    zz_lit = "'zzqx'"
    zz_bucket = spark.sql(
        f"SELECT {_bucket_sql_spark(zz_lit, B)} AS b").collect()[0].b
    assert top[0].b == zz_bucket
    assert top[0].c_a > 0 and top[0].c_b == 0


def test_kl_tvd_scalars(spark, docs, con):
    """KL/TVD: ≥ 0, near-zero on a same-distribution split, larger on the
    source split; values match an independent DuckDB ln recomputation."""
    rows = drift.drift_bucket_counts(
        docs.filter(WA), docs.filter(WB), B).collect()
    m = drift.kl_tvd(rows, B)
    assert m["kl_ab"] >= 0 and m["kl_ba"] >= 0 and 0 <= m["tvd"] <= 1

    # identical corpora -> exactly zero everywhere
    same = drift.kl_tvd(
        drift.drift_bucket_counts(docs, docs, B).collect(), B)
    assert same["kl_ab"] == pytest.approx(0.0, abs=1e-12)
    assert same["tvd"] == pytest.approx(0.0, abs=1e-12)

    # independent DuckDB recomputation of KL(a||b) incl. unseen buckets
    ta = sum(r.c_a for r in rows)
    tb = sum(r.c_b for r in rows)
    da, db = ta + B, tb + B
    seen = len(rows)
    [(kl_seen,)] = con.execute(f"""
        WITH c AS ({drift.drift_bucket_counts_sql_duck(WA, WB, B)})
        SELECT sum(((c_a + 1) / CAST({da} AS DOUBLE)) *
                   (ln((c_a + 1) / CAST({da} AS DOUBLE))
                    - ln((c_b + 1) / CAST({db} AS DOUBLE)))) FROM c
    """).fetchall()
    import math
    kl_unseen = (B - seen) * (1 / da) * (math.log(1 / da)
                                         - math.log(1 / db))
    assert m["kl_ab"] == pytest.approx(kl_seen + kl_unseen, abs=1e-9)


def test_topk_grams_matches_duckdb_exactly(docs, con):
    """The interpretable per-gram drift view: exact parity of ranking,
    counts, and the integer numerator."""
    got = [(r.gram, r.c_a, r.c_b, int(r.drift_num))
           for r in drift.drift_topk_grams(
               docs.filter(WA), docs.filter(WB), k=15).collect()]
    want = [(g, ca, cb, int(d)) for g, ca, cb, d in con.execute(
        drift.drift_topk_grams_sql_duck(WA, WB, 15)).fetchall()]
    assert got == want
    assert len(got) == 15
    assert all(ca >= 0 and cb >= 0 for _, ca, cb, _ in got)
