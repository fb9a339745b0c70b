"""FIM relayout invariants: reconstruction, rate, determinism, corner cuts."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.operators import augment

PRE, MID, SUF = -101, -102, -103


def _reconstruct(tokens: list[int]) -> list[int]:
    """Undo PSM: [PRE] p [SUF] s [MID] m  →  p + m + s."""
    assert tokens[0] == PRE
    i_suf = tokens.index(SUF)
    i_mid = tokens.index(MID)
    assert 0 < i_suf < i_mid
    p, s, m = tokens[1:i_suf], tokens[i_suf + 1:i_mid], tokens[i_mid + 1:]
    return p + m + s


def test_fim_reconstruction_and_rate(spark):
    n = 3000
    src = {r.doc_id: list(r.tokens) for r in fx.sequences(spark, n).collect()}
    out = augment.fim_transform(fx.sequences(spark, n), rate=0.4).collect()
    assert len(out) == n
    applied = [r for r in out if r.fim_applied]
    # hash-selection lands near the rate (binomial, generous band)
    assert 0.3 < len(applied) / n < 0.5
    saw_empty_region = False
    for r in out:
        if not r.fim_applied:
            assert list(r.tokens) == src[r.doc_id]
            continue
        assert r.n_tok == len(src[r.doc_id]) + 3
        toks = list(r.tokens)
        # sentinels are vocab-external: exactly one of each
        assert [toks.count(x) for x in (PRE, MID, SUF)] == [1, 1, 1]
        assert _reconstruct(toks) == src[r.doc_id]
        i_suf, i_mid = toks.index(SUF), toks.index(MID)
        if i_suf == 1 or i_mid == i_suf + 1 or i_mid == len(toks) - 1:
            saw_empty_region = True  # end/coincident cuts are legal
    assert saw_empty_region


def test_fim_deterministic_across_parallelism(spark):
    seqs = fx.sequences(spark, 800)
    a = {r.doc_id: (r.fim_applied, list(r.tokens)) for r in
         augment.fim_transform(seqs.repartition(1)).collect()}
    b = {r.doc_id: (r.fim_applied, list(r.tokens)) for r in
         augment.fim_transform(seqs.repartition(16)).collect()}
    assert a == b


def test_fim_min_len_and_rate_bounds(spark):
    seqs = fx.sequences(spark, 500)
    none = augment.fim_transform(seqs, rate=0.0).filter("fim_applied")
    assert none.count() == 0
    all_ = augment.fim_transform(seqs, rate=1.0)
    # every row long enough is transformed; only shorter-than-min_len skip
    skipped = all_.filter(~F.col("fim_applied")).select("n_tok").collect()
    assert all(r.n_tok < 2 for r in skipped)
