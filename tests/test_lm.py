"""Bigram-LM perplexity filtering (operators/lm.py): cross-engine exact
parity, an independent python model, gate behavior on planted gibberish,
and partitioning invariance of the decimal-sum mean."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from omnition_opentelemetry_service_spark.operators import lm

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox runs over the lazy cat"),
    (2, "the lazy dog sleeps and the quick fox jumps"),
    (3, "over the lazy dog the quick brown fox jumps"),
    (4, "zxq vvk qqj mmz pqw xxo zzl kjq wvx"),   # gibberish: all unks
    (5, "single"),                                   # < 2 words: absent
    (6, ""),
    (7, None),
    (8, "the the the the the the"),                  # degenerate repeat
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


REFERENCE = [
    (100 + i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "a quick brown cat jumps over a lazy fox",
        "the brown dog runs over the quick lazy cat",
        "over the lazy dog jumps the quick brown fox",
        "the quick cat sleeps and the brown dog runs",
    ])]


@pytest.fixture(scope="module")
def ref_docs(spark):
    return spark.createDataFrame(REFERENCE, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(ref_docs):
    # CCNet shape: the filter LM trains on a REFERENCE corpus, never on
    # the corpus being scored (self-training memorizes hapax bigrams —
    # the caveat in train_bigram_lm's doc)
    return lm.train_bigram_lm(ref_docs, max_vocab=100)


def test_train_counts_match_python(model):
    vocab, bigrams, n = model
    words = [w for _i, t in REFERENCE if t for w in t.split()]
    ref_uni: dict[str, int] = {}
    for w in words:
        ref_uni[w] = ref_uni.get(w, 0) + 1
    assert vocab == ref_uni
    ref_bi: dict[tuple[str, str], int] = {}
    for _i, t in REFERENCE:
        ws = (t or "").split()
        for a, b in zip(ws, ws[1:]):
            ref_bi[(a, b)] = ref_bi.get((a, b), 0) + 1
    assert bigrams == ref_bi
    assert n == len(words)


def test_logprob_matches_duckdb(spark, docs, model):
    vocab, bigrams, n = model
    got = sorted(map(tuple,
                     lm.doc_logprob(docs, vocab, bigrams, n).collect()))
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted((int(r[0]), int(r[1]), float(r[2])) for r in con.execute(
        lm.doc_logprob_sql_duck(vocab, bigrams, n)).fetchall())
    assert got == want


def test_logprob_matches_python_model(spark, docs, model):
    vocab, bigrams, n = model
    v = len(vocab)
    got = {r.doc_id: (r.n_trans, r.avg_logp)
           for r in lm.doc_logprob(docs, vocab, bigrams, n).collect()}
    for i, t in DOCS:
        ws = (t or "").split()
        if len(ws) < 2:
            assert i not in got
            continue
        logs = []
        for p, w in zip(ws, ws[1:]):
            cp, cpw, cw = vocab.get(p, 0), bigrams.get((p, w), 0), \
                vocab.get(w, 0)
            bi = 0.7 * (cpw / cp) if cp > 0 and cpw > 0 else 0.0
            uni = (cw + 1.0) / float(n + v + 1)
            logs.append(math.log(bi + (1.0 - 0.7) * uni))
        want = round(sum(round(x, 9) for x in logs) / len(logs), 6)
        assert got[i][0] == len(logs)
        assert got[i][1] == pytest.approx(want, abs=2e-6), (i, t)


def test_gate_drops_gibberish_keeps_natural(spark, docs, model):
    vocab, bigrams, n = model
    lp = {r.doc_id: r.avg_logp
          for r in lm.doc_logprob(docs, vocab, bigrams, n).collect()}
    # gibberish (all-unk transitions) scores strictly worse than in-model
    assert lp[4] < lp[0] and lp[4] < lp[2]
    ppl_natural = math.exp(-lp[0])
    ppl_junk = math.exp(-lp[4])
    kept = {r.doc_id for r in lm.perplexity_gate(
        docs, vocab, bigrams, n,
        max_ppl=(ppl_natural + ppl_junk) / 2).collect()}
    assert 0 in kept and 1 in kept and 2 in kept and 3 in kept
    assert 4 not in kept
    assert 5 not in kept and 6 not in kept and 7 not in kept  # <2 words


def test_logprob_partitioning_invariant(spark, docs, model):
    vocab, bigrams, n = model
    a = sorted(map(tuple, lm.doc_logprob(docs, vocab, bigrams, n).collect()))
    b = sorted(map(tuple, lm.doc_logprob(
        docs.repartition(7), vocab, bigrams, n).collect()))
    assert a == b


def test_train_bigram_collect_is_vocab_bounded(spark, ref_docs):
    """min_count and the vocab cap are pushed BELOW the collect (ADVICE r2:
    collecting every distinct bigram type is corpus-bounded, a driver OOM
    at scale). max_vocab=3 must yield only bigrams between the top-3 words,
    and min_count=2 must drop hapax bigrams — both enforced pre-collect."""
    vocab, bigrams, _n = lm.train_bigram_lm(ref_docs, max_vocab=3)
    assert len(vocab) == 3
    assert all(p in vocab and w in vocab for p, w in bigrams)
    _v2, big2, _n2 = lm.train_bigram_lm(ref_docs, max_vocab=100,
                                        min_count=2)
    assert big2 and all(c >= 2 for c in big2.values())
    full = lm.train_bigram_lm(ref_docs, max_vocab=100)[1]
    assert big2 == {k: c for k, c in full.items() if c >= 2}
