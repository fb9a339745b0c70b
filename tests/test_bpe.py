"""Learned BPE (operators/bpe.py): trained merges match the published
algorithm on a hand-checkable corpus, encode matches an independent
pure-Python reference on arbitrary text, determinism under repartitioning,
and the lossless-reconstruction property (concat of pieces == word+marker).
"""

from __future__ import annotations

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from omnition_opentelemetry_service_spark.operators import bpe

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


def _ref_counts():
    counts: dict[str, int] = {}
    for _i, t in DOCS:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    return counts


def test_word_counts_match_python(spark, docs):
    got = {r.word: r.cnt for r in bpe.word_counts(docs).collect()}
    assert got == _ref_counts()


def test_trained_merges_match_published_example(spark, docs):
    """The classic Sennrich corpus shape: 'es' (9+3=12 weighted in
    newest/widest)... derive the expected first merges from the reference
    implementation ON THE SAME POOL rather than hand-waving."""
    merges = bpe.train_bpe(docs, n_merges=10)
    ref = bpe.train_merges(sorted(_ref_counts().items(),
                                  key=lambda kv: (-kv[1], kv[0])), 10)
    assert merges == ref
    # counted by hand: (e,s)/(s,t)/(t,</w>) all carry 11 (newest 7 +
    # widest 4) — the lexicographic tie-break picks ('e','s') first
    assert merges[0] == ("e", "s")


def test_encode_reconstructs_and_respects_merges(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=10)
    out = {r.doc_id: r for r in bpe.encode_bpe(docs, merges).collect()}
    for did, text in DOCS:
        pieces = out[did].pieces
        assert out[did].n_pieces == len(pieces)
        # lossless: pieces concat back to the words (+ end markers)
        assert "".join(pieces) == "".join(
            w + bpe.END for w in text.split())
    # a fully-merged frequent word collapses to few pieces
    assert len(bpe.apply_merges("low", {p: i for i, p in enumerate(merges)})) <= 2


def test_encode_deterministic_under_repartition(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=8)
    a = sorted((r.doc_id, tuple(r.pieces))
               for r in bpe.encode_bpe(docs, merges).collect())
    b = sorted((r.doc_id, tuple(r.pieces))
               for r in bpe.encode_bpe(docs.repartition(7), merges).collect())
    assert a == b


def test_null_text_yields_null_pieces(spark):
    df = spark.createDataFrame([(1, None), (2, "ok ok")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in bpe.encode_bpe(df, [("o", "k")]).collect()}
    assert out[1].pieces is None and out[1].n_pieces is None
    assert list(out[2].pieces) == ["ok", bpe.END] * 2


SET = settings(max_examples=5, deadline=None, derandomize=True,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(st.lists(st.text(max_size=40), min_size=1, max_size=10),
       st.integers(0, 30))
def test_encode_matches_reference_on_arbitrary_text(spark, texts, n_merges):
    """Spark encode == pure-Python reference (train on the same corpus,
    apply per word) on ARBITRARY unicode text — including the whitespace
    and case-fold edges the shared normalization pins."""
    import re

    from omnition_opentelemetry_service_spark.functions.text import (
        lower_fold_py)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe(df, n_merges=n_merges, max_words=1000)
    got = {r.doc_id: list(r.pieces)
           for r in bpe.encode_bpe(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
    for i, t in rows:
        ws = [w for w in ascii_ws.split(lower_fold_py(t.strip(" "))) if w]
        want = []
        for w in ws:
            want.extend(bpe.apply_merges(w, ranks))
        assert got[i] == want, (t, merges)


def test_tokenize_documents_bpe_shape_and_no_selfjoin(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=6)
    df = docs.withColumn("source", (docs.doc_id % 2 == 0).cast("string"))
    out = bpe.tokenize_documents_bpe(df, merges)
    assert out.columns == ["doc_id", "tokens", "n_tok", "source"]
    rows = {r.doc_id: r for r in out.collect()}
    enc = {r.doc_id: r for r in bpe.encode_bpe(docs, merges).collect()}
    for did, _t in DOCS:
        assert rows[did].n_tok == enc[did].n_pieces
        assert len(rows[did].tokens) == rows[did].n_tok
        assert all(0 <= t < 65_536 for t in rows[did].tokens)
        assert rows[did].source in ("true", "false")
    # source threads through the kernel — no join, no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_make_release_cli_with_bpe(spark, tmp_path):
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
         "--input-docs", docs_pq, "--bpe-merges", "20",
         "--out", out_dir, "--budget", "64", "--shards", "4",
         "--parallelism", "4"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert sum(v[0] for v in rep["per_split"].values()) == 60


def test_vocab_table_ids_and_bounds(spark, docs):
    """bpe_vocab_table: piece ids equal tokenize_documents_bpe's ids for
    the same pieces (one hash definition), pieces are distinct, counts sum
    to the corpus piece total, and the table is vocab-bounded."""
    merges = bpe.train_bpe(docs, n_merges=30)
    vocab = bpe.bpe_vocab_table(docs, merges).collect()
    pieces_df = bpe.encode_bpe(docs, merges).collect()
    all_pieces = [p for r in pieces_df for p in r.pieces]
    assert len({r.piece for r in vocab}) == len(vocab)
    assert sum(r.cnt for r in vocab) == len(all_pieces)
    assert {r.piece for r in vocab} == set(all_pieces)
    assert len(vocab) <= len(set("".join(t for _, t in DOCS))) + 30 + 2

    toks = {r.doc_id: list(r.tokens)
            for r in bpe.tokenize_documents_bpe(docs, merges).collect()}
    id_of = {r.piece: r.token_id for r in vocab}
    for r in pieces_df:
        assert toks[r.doc_id] == [id_of[p] for p in r.pieces]


def test_detokenize_roundtrip_and_unknown_id(spark, docs):
    """detok(tok(x)) == the encoder's own normalization of x when ids are
    collision-free (vocab_size 2^30); unknown ids surface as U+FFFD."""
    import re

    from omnition_opentelemetry_service_spark.functions.text import (
        lower_fold_py)

    merges = bpe.train_bpe(docs, n_merges=30)
    big = 1 << 30  # collision-free id space for this tiny vocab
    seqs = bpe.tokenize_documents_bpe(docs, merges, vocab_size=big)
    vocab = bpe.bpe_vocab_table(docs, merges, vocab_size=big).collect()
    got = {r.doc_id: r.text
           for r in bpe.detokenize_bpe(seqs, vocab).collect()}
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    for did, t in DOCS:
        want = " ".join(w for w in ws.split(lower_fold_py(t.strip(" "))) if w)
        assert got[did] == want

    bad = spark.createDataFrame([(99, [123456789])],
                                "doc_id long, tokens array<int>")
    assert bpe.detokenize_bpe(bad, vocab).collect()[0].text == "�"


def test_detokenize_inband_marker_limitation_pinned(spark):
    """A doc literally containing '</w>' detokenizes with a space at the
    marker (the documented in-band ambiguity) — pinned so the behavior is
    a disclosed contract, not a surprise."""
    d = spark.createDataFrame([(1, "a</w>b plain")], "doc_id long, text string")
    merges = bpe.train_bpe(d, n_merges=5)
    big = 1 << 30
    seqs = bpe.tokenize_documents_bpe(d, merges, vocab_size=big)
    vocab = bpe.bpe_vocab_table(d, merges, vocab_size=big).collect()
    got = bpe.detokenize_bpe(seqs, vocab).collect()[0].text
    assert got == "a b plain"  # embedded marker became a boundary
