"""Logistic-regression quality classifier (operators/classifier.py):
convergence + separation on planted data, loss monotonicity, scoring
parity (Spark == DuckDB == python model), and the bounded-exchange shape.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import classifier as cl

# planted: good docs = long + low punct; bad = short + high punct, with a
# deterministic margin so full-batch GD separates them fast
ROWS = [(i,
         200.0 + (i % 17) * 5 if i % 2 == 0 else 20.0 + (i % 13),
         0.02 + (i % 7) * 0.005 if i % 2 == 0 else 0.3 + (i % 5) * 0.02,
         1 if i % 2 == 0 else 0)
        for i in range(400)]
FEATS = ["n_words", "punct"]


@pytest.fixture(scope="module")
def df(spark):
    d = spark.createDataFrame(
        ROWS, "doc_id long, n_words double, punct double, label int")
    d = d.persist()
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def model(df):
    return cl.train_logreg(df, FEATS, n_iter=60)


def test_loss_decreases_and_converges(model):
    w, b, losses = model
    assert len(losses) == 60
    assert losses[-1] < 0.1  # separable data: near-zero logistic loss
    for a, nxt in zip(losses, losses[1:]):
        assert nxt <= a + 1e-9  # monotone under full-batch GD w/ sane lr


def test_classifier_separates_planted_labels(spark, df, model):
    w, b, _ = model
    got = {r.doc_id: r.model_quality for r in
           cl.quality_classifier_scores(df, w, b, FEATS).collect()}
    for i, _n, _p, label in ROWS:
        if label == 1:
            assert got[i] > 0.9, (i, got[i])
        else:
            assert got[i] < 0.1, (i, got[i])


def test_scoring_matches_duckdb_and_python(spark, df, model):
    w, b, _ = model
    got = sorted((r.doc_id, r.model_quality) for r in
                 cl.quality_classifier_scores(df, w, b, FEATS).collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        ROWS, columns=["doc_id", "n_words", "punct", "label"]))
    want = sorted((int(r[0]), float(r[1])) for r in con.execute(
        f"SELECT doc_id, {cl.score_sql_duck(w, b, FEATS)} AS q FROM t"
    ).fetchall())
    assert got == want
    for (i, g), (_i2, row) in zip(got, sorted((i, r) for i, *r in ROWS)):
        z = b + w[0] * row[0] + w[1] * row[1]
        assert g == pytest.approx(round(1.0 / (1.0 + math.exp(-z)), 6),
                                  abs=1e-6)


def test_scoring_is_zero_shuffle(spark, df, model):
    w, b, _ = model
    plan = (cl.quality_classifier_scores(df, w, b, FEATS)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_training_partitioning_invariant_at_classifier_level(spark, df):
    """Weights may differ by float-fold ulps across partitionings (the
    kmeans contract) — but the DECISIONS must not flip on planted data."""
    w1, b1, _ = cl.train_logreg(df, FEATS, n_iter=40)
    w2, b2, _ = cl.train_logreg(df.repartition(13), FEATS, n_iter=40)
    s1 = {r.doc_id: r.model_quality > 0.5 for r in
          cl.quality_classifier_scores(df, w1, b1, FEATS).collect()}
    s2 = {r.doc_id: r.model_quality > 0.5 for r in
          cl.quality_classifier_scores(df, w2, b2, FEATS).collect()}
    assert s1 == s2


def test_constant_feature_is_ignored(spark, df):
    d2 = df.withColumn("const", F.lit(7.0))
    w, b, losses = cl.train_logreg(d2, FEATS + ["const"], n_iter=30)
    assert losses[-1] < 0.2
    # the constant feature's raw weight stays ~0 relative to live ones
    assert abs(w[2]) * 7.0 < 1e-6 + abs(w[0]) + abs(w[1])


def test_corpus_filter_model_on_fixture_docs(spark):
    """Weak-label self-training over the real documents fixture: the model
    gate must agree with the rule gate on clear cases and stay bounded on
    the rest; the returned weights re-apply to a NEW batch without
    retraining."""
    from omnition_opentelemetry_service_spark.functions import text as tx
    from omnition_opentelemetry_service_spark.sources.loader import load

    fixture = load(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    junk = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(
            ["", "!!!", "??!!..,,;;::!!", "x", ".. .. .. ..",
             "!?!?!?!?!?!?", ",,,,,,,,", "a!b!c!d!e!f!",
             ";;;;;;;", "?!?!?!"] * 3)],
        "doc_id long, text string")
    docs = fixture.unionByName(junk)
    kept, w, b = cl.corpus_filter_model(docs, threshold=0.5, n_iter=30)
    kept_ids = {r.doc_id for r in kept.collect()}
    rules = {r.doc_id: r.q for r in docs.select(
        "doc_id", tx.quality_score("text").alias("q")).collect()}
    n = len(rules)
    assert 0 < len(kept_ids) < n
    # clear-case agreement: every rule-excellent doc is kept, every
    # rule-terrible doc is dropped (interpolation happens in between)
    for did, q in rules.items():
        if q >= 0.9:
            assert did in kept_ids, (did, q)
        if q <= 0.1:
            assert did not in kept_ids, (did, q)

    # re-apply the trained gate to a new batch: zero-shuffle scoring only
    batch = docs.limit(20)
    scored = cl.quality_classifier_scores(
        cl.with_text_features(batch), w, b, cl.TEXT_FEATURES)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert scored.count() == 20
    spark.catalog.clearCache()
