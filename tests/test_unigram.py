"""Unigram-LM tokenizer (operators/unigram.py): EM objective
non-decreasing at fixed vocab, encode matches an INDEPENDENT pure-Python
Viterbi reference, hash-id SQL↔python parity, exact round-trip through
the detokenizer, determinism under repartitioning, and hypothesis
reconstruction fuzz on arbitrary unicode."""

from __future__ import annotations

import math
import re

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from omnition_opentelemetry_service_spark.functions.text import lower_fold_py
from omnition_opentelemetry_service_spark.operators import bpe, unigram

DOCS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(docs):
    return unigram.train_unigram(docs, vocab_size=24, seed_size=40,
                                 max_piece_len=6, em_steps=2)


def _ref_viterbi(word, logp, max_len, unk):
    """Independent reference: enumerate ALL segmentations recursively and
    pick max score; ties prefer the longer FIRST piece at each split point
    (equivalent to the operator's longest-last-piece backtrack rule only
    when scores are unique — so assert on score, then on the operator's
    own tie rule via exhaustive enumeration)."""
    n = len(word)
    best: list[tuple[float, list[str]]] = []

    def go(i, acc, score):
        if i == n:
            best.append((score, list(acc)))
            return
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if j - i != 1:
                    continue
                lp = unk
            acc.append(p)
            go(j, acc, score + lp)
            acc.pop()

    go(0, [], 0.0)
    assert best, f"no segmentation for {word!r}"
    return max(s for s, _ in best)


def test_model_shape_and_coverage(model):
    pieces = [p for p, _ in model]
    assert len(pieces) == len(set(pieces))
    assert len(pieces) <= 24
    # coverage: every char of the corpus (lower_fold'd, ▁-prefixed words)
    # survives as a single-char piece — singles are never pruned
    chars = set(unigram.BOUNDARY)
    for _i, t in DOCS:
        for w in t.split():
            chars |= set(lower_fold_py(w))
    assert chars <= {p for p in pieces if len(p) == 1}
    # probs normalize (within float tolerance)
    assert abs(sum(math.exp(lp) for _, lp in model) - 1.0) < 1e-6


def test_em_objective_non_decreasing(docs):
    words = unigram._pool_words(bpe.top_words(docs, 1000))
    logp = unigram._normalize(unigram.seed_vocab(words, 40, 6))
    prev = unigram.corpus_loglik(words, logp, 6)
    for _ in range(4):
        logp = unigram.em_step(words, logp, 6)
        cur = unigram.corpus_loglik(words, logp, 6)
        # tolerance covers the epsilon coverage-floor redistribution in
        # em_step (1e-6 of the smallest positive count)
        assert cur >= prev - 1e-4 * abs(prev), \
            "EM must not decrease the objective"
        prev = cur


def test_encode_matches_reference_scores(docs, model):
    logp = dict(model)
    max_len = max(len(p) for p in logp)
    unk = unigram.model_unk_logp(model)
    out = {r.doc_id: r.pieces
           for r in unigram.encode_unigram(docs, model).collect()}
    for did, text in DOCS:
        words = text.split()
        got = out[did]
        # reconstruction: concat(pieces) == ▁-joined words
        assert "".join(got) == "".join(unigram.BOUNDARY + w for w in words)
        # per-word optimality: operator's total score equals the
        # enumerate-everything max for each word
        k = 0
        for w in words:
            bw = unigram.BOUNDARY + w
            segs = []
            while k < len(got) and (not segs or
                                    not got[k].startswith(unigram.BOUNDARY)):
                segs.append(got[k])
                k += 1
            score = sum(logp.get(p, unk) for p in segs)
            assert abs(score - _ref_viterbi(bw, logp, max_len, unk)) < 1e-9
            assert "".join(segs) == bw


def test_null_text_quarantine(spark, model):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = unigram.encode_unigram(df, model).collect()[0]
    assert row.pieces is None and row.n_pieces is None


def test_token_id_sql_python_parity(spark, model):
    """One id rule across engines: the SQL md5-prefix expression and
    token_id_py agree on every model piece."""
    from pyspark.sql import functions as F

    rows = unigram.unigram_vocab_rows(model, vocab_size=65_536)
    df = spark.createDataFrame([(r["piece"],) for r in rows], "piece string")
    got = {r.piece: r.tid for r in df.select(
        "piece",
        F.expr(bpe._TOKEN_ID_SQL.format(col="piece", vocab_size=65_536)
               ).alias("tid")).collect()}
    for r in rows:
        assert got[r["piece"]] == r["token_id"]


def test_roundtrip_tokenize_detokenize(spark, docs, model):
    vocab_size = 1 << 22  # collision-free at this vocab size (asserted)
    rows = unigram.unigram_vocab_rows(model, vocab_size)
    ids = [r["token_id"] for r in rows]
    assert len(ids) == len(set(ids)), "fixture vocab must be collision-free"
    seqs = unigram.tokenize_documents_unigram(docs, model, vocab_size)
    got = {r.doc_id: r.text
           for r in unigram.detokenize_unigram(seqs, model,
                                               vocab_size).collect()}
    for did, text in DOCS:
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", lower_fold_py(text)).strip()
        assert got[did] == norm


def test_sequence_shape_and_source_passthrough(spark, model):
    df = spark.createDataFrame([(7, "low lower", "web")],
                               "doc_id long, text string, source string")
    row = unigram.tokenize_documents_unigram(df, model).collect()[0]
    assert row.source == "web" and row.n_tok == len(row.tokens)
    assert all(isinstance(t, int) and 0 <= t < 65_536 for t in row.tokens)


def test_training_deterministic_under_repartition(spark, docs, model):
    again = unigram.train_unigram(docs.repartition(7), vocab_size=24,
                                  seed_size=40, max_piece_len=6, em_steps=2)
    assert again == model


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        unigram.train_unigram(empty, vocab_size=8)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters=unigram.BOUNDARY),
    min_size=1, max_size=60))
def test_fuzz_driver_reconstruction(text):
    """Driver-side property (no Spark in the hypothesis loop): training on
    a tiny synthetic pool containing the text's words, Viterbi pieces
    always concatenate back to the ▁-prefixed word — for ARBITRARY
    unicode, including chars absent from the model (unk fallback)."""
    words = [w for w in re.split(r"[ \t\n\x0b\f\r]+",
                                 lower_fold_py(text)) if w]
    if not words:
        return
    pool = [(unigram.BOUNDARY + "seed", 3)]
    logp = unigram._normalize(unigram.seed_vocab(pool, 10, 4))
    max_len = max(len(p) for p in logp)
    unk = min(logp.values()) - unigram.UNK_DELTA
    for w in words:
        bw = unigram.BOUNDARY + w
        pieces = unigram.viterbi_pieces(bw, logp, max_len, unk)
        assert "".join(pieces) == bw


def test_make_release_cli_with_unigram(spark, tmp_path):
    """jobs/make_release.py --unigram-vocab: raw text → learned unigram
    tokenize → full release, end-to-end through the CLI (the --bpe-merges
    twin path); exclusivity of the two learned tokenizers is rejected."""
    import json
    import os
    import subprocess
    import sys

    docs_pq = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "rel")
    rows = [(i, f"doc {i} body words repeat repeat {i % 4}", "web")
            for i in range(60)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string").write.parquet(docs_pq)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "make_release.py"),
         "--input-docs", docs_pq, "--unigram-vocab", "48",
         "--out", out_dir, "--budget", "64", "--shards", "4",
         "--parallelism", "4"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert sum(v[0] for v in rep["per_split"].values()) == 60

    bad = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "make_release.py"),
         "--input-docs", docs_pq, "--unigram-vocab", "48",
         "--bpe-merges", "20", "--out", str(tmp_path / "never")],
        capture_output=True, text=True, timeout=60, cwd=repo)
    assert bad.returncode != 0
    assert "exclusive" in bad.stderr
