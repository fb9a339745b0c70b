"""DSIR importance resampling (operators/dsir.py): cross-engine exact
parity of scores and the Gumbel-top-k selection, an independent python
model, and the selection-quality contract (target-domain docs win)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
import pytest

from omnition_opentelemetry_service_spark.operators import dsir

B = 64  # small bucket space: forces collisions through the aggregation

TARGET = [
    (100 + i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "a quick brown cat jumps over a lazy fox",
        "over the lazy dog jumps the quick brown fox",
    ])]

RAW = [
    (0, "the quick brown fox runs over the lazy cat"),      # target-like
    (1, "the lazy dog and the quick brown fox"),            # target-like
    (2, "zxq vvk qqj mmz pqw xxo zzl kjq wvx"),             # off-domain
    (3, "int main void return zero exit code stack heap"),  # off-domain
    (4, "over the lazy dog the quick fox jumps again"),     # target-like
    (5, "malloc free pointer segfault kernel panic trace"),  # off-domain
    (6, "single"),                                           # 1 unigram
    (7, ""),                                                 # absent
    (8, None),                                               # absent
]


@pytest.fixture(scope="module")
def target_docs(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


@pytest.fixture(scope="module")
def raw_docs(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(target_docs, raw_docs):
    return dsir.dsir_fit(target_docs, raw_docs, n_buckets=B)


# -- independent python model --------------------------------------------------
def py_grams(t):
    ws = [w for w in (t or "").split() if w]
    if len(ws) < 2:
        return list(ws)
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def py_bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def py_counts(rows):
    c: dict[int, int] = {}
    for _i, t in rows:
        for g in py_grams(t):
            b = py_bucket(g)
            c[b] = c.get(b, 0) + 1
    return c, sum(c.values())


def test_fit_matches_python(model):
    lam, lam0 = model
    t, t_tot = py_counts(TARGET)
    r, r_tot = py_counts(RAW)
    td, rd = float(t_tot + B), float(r_tot + B)
    want = {b: round(math.log((t.get(b, 0) + 1) / td)
                     - math.log((r.get(b, 0) + 1) / rd), 9)
            for b in set(t) | set(r)}
    assert lam == want
    assert lam0 == round(math.log(1.0 / td) - math.log(1.0 / rd), 9)


def test_scores_match_python_model(raw_docs, model):
    lam, lam0 = model
    got = {r.doc_id: (r.n_grams, r.dsir_score)
           for r in dsir.dsir_scores(raw_docs, lam, lam0, B).collect()}
    for i, t in RAW:
        gs = py_grams(t)
        if not gs:
            assert i not in got
            continue
        want = round(sum(lam.get(py_bucket(g), lam0) for g in gs), 6)
        assert got[i][0] == len(gs)
        assert got[i][1] == pytest.approx(want, abs=2e-6), (i, t)


def test_scores_match_duckdb(raw_docs, model):
    lam, lam0 = model
    got = sorted(map(tuple,
                     dsir.dsir_scores(raw_docs, lam, lam0, B).collect()))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(RAW, columns=["doc_id", "text"]))
    want = sorted((int(r[0]), int(r[1]), float(r[2])) for r in con.execute(
        dsir.dsir_scores_sql_duck(lam, lam0, B)).fetchall())
    assert got == want


def test_resample_matches_duckdb(raw_docs, model):
    lam, lam0 = model
    got = [(r.doc_id, r.dsir_score, r.sel_key) for r in
           dsir.dsir_resample(raw_docs, lam, lam0, k=4, seed="s1",
                              n_buckets=B).collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(RAW, columns=["doc_id", "text"]))
    want = [(int(r[0]), float(r[1]), float(r[2])) for r in con.execute(
        dsir.dsir_resample_sql_duck(lam, lam0, k=4, seed="s1",
                                    n_buckets=B)).fetchall()]
    assert got == want


def test_resample_deterministic_and_seed_sensitive(raw_docs, model):
    lam, lam0 = model
    a = [r.doc_id for r in dsir.dsir_resample(
        raw_docs, lam, lam0, k=3, seed="s1", n_buckets=B).collect()]
    b = [r.doc_id for r in dsir.dsir_resample(
        raw_docs, lam, lam0, k=3, seed="s1", n_buckets=B).collect()]
    assert a == b
    # keys differ under a different seed (the sets may coincide)
    k1 = {r.doc_id: r.sel_key for r in dsir.dsir_resample(
        raw_docs, lam, lam0, k=9, seed="s1", n_buckets=B).collect()}
    k2 = {r.doc_id: r.sel_key for r in dsir.dsir_resample(
        raw_docs, lam, lam0, k=9, seed="s2", n_buckets=B).collect()}
    assert any(k1[d] != k2[d] for d in k1)


def test_target_like_docs_outscore_off_domain(raw_docs, model):
    """The selection-quality contract: every target-like raw doc must
    outscore every off-domain raw doc (the domains share no vocabulary,
    so the margin is large and collision noise at B=64 cannot flip it)."""
    lam, lam0 = model
    s = {r.doc_id: r.dsir_score
         for r in dsir.dsir_scores(raw_docs, lam, lam0, B).collect()}
    assert min(s[0], s[1], s[4]) > max(s[2], s[3], s[5])
    # zero-gram docs are absent and never selected
    assert 7 not in s and 8 not in s
    sel = {r.doc_id for r in dsir.dsir_resample(
        raw_docs, lam, lam0, k=9, seed="s1", n_buckets=B).collect()}
    assert 7 not in sel and 8 not in sel


def test_scores_plan_broadcasts_lam_table(spark, raw_docs, model):
    """Plan-shape contract: the B-row lam table joins the exploded n-grams
    as a broadcast hash join (it is bucket-bounded by construction); no
    cartesian product anywhere in the score pipeline."""
    lam, lam0 = model
    plan = dsir.dsir_scores(raw_docs, lam, lam0, B)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_seed_is_validated_as_sql_literal(raw_docs, model):
    """The seed is inlined as a single-quoted literal in BOTH engines'
    SQL, and escaping can't be made parity-safe (Spark honors backslash
    escapes, DuckDB doesn't) — so unsafe seeds must be REJECTED, not
    interpolated."""
    lam, lam0 = model
    for bad in ("it's-v1", "a\\b", "x'y", "s;drop", ""):
        with pytest.raises(ValueError, match="seed"):
            dsir.dsir_resample(raw_docs, lam, lam0, k=3, seed=bad,
                               n_buckets=B)
        with pytest.raises(ValueError, match="seed"):
            dsir.dsir_resample_sql_duck(lam, lam0, k=3, seed=bad,
                                        n_buckets=B)
