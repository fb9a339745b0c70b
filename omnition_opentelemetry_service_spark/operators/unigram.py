"""Unigram-LM tokenizer (Kudo, ACL'18 — the SentencePiece unigram model):
the third tier of the tokenizer family (hash vocab → learned BPE →
learned unigram). Train a piece inventory with per-piece log-probs by EM
over the segmentation lattice, prune to the target vocab, encode by
Viterbi (the max-probability segmentation).

Shape at scale — identical to operators/bpe.py: training runs over the
WORD-FREQUENCY TABLE, never the corpus:

- **word counts**: ONE corpus scan (bpe.word_counts — shared definition,
  same lower_fold + explicit-whitespace normalization as every other text
  operator here); the pool is the bounded top ``max_words`` head
  (TakeOrdered), so the driver-side EM is corpus-size-independent.
- **seed → EM → prune loop** (driver-side, deterministic): seed pieces are
  the frequent substrings of pooled words (every substring up to
  ``max_piece_len``, frequency-weighted), EM computes expected piece
  counts by forward-backward over each word's segmentation lattice, the
  prune step drops the lowest-expected-count pieces (never single
  characters — coverage is guaranteed) until ``vocab_size`` remains.
  Pruning by expected count is the standard reimplementation
  simplification of Kudo §3.2's exact likelihood-loss ranking (SentencePiece
  itself approximates the loss from lattice statistics); disclosed here
  rather than silently nonstandard.
- **encode** (one scan, mapInPandas, zero shuffle): Viterbi per word with
  a per-task memo over DISTINCT words — the same memoization pattern as
  bpe.encode_bpe / dedup.simhash_signatures_pandas.

Word boundaries use the SentencePiece convention: every word is prefixed
with U+2581 LOWER ONE EIGHTH BLOCK ("▁") before segmentation, so
detokenization is concat → replace ▁ with space. Like BPE's ``</w>``
marker, ▁ is in-band: a document literally containing ▁ detokenizes with
a space there (disclosed, pinned in tests).

No DuckDB twin: EM and Viterbi are iterative lattice programs, not
SQL-expressible — the in-suite oracle is an independent pure-Python
Viterbi reference plus hypothesis properties (tests/test_unigram.py), the
same verification tier as operators/bpe.py.

Determinism: the pool is ordered (cnt desc, word asc), seeds are ordered
(freq desc, piece asc), EM accumulates in pool order, prune ties keep the
lexicographically GREATER piece (sort (cnt, piece) desc), and Viterbi ties prefer
the LONGER last piece — so the trained model and every encoding are pure
functions of the corpus, invariant under partitioning and cluster size
(pinned in tests)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import bpe

BOUNDARY = "▁"  # SentencePiece word-begin marker
UNK_DELTA = 10.0     # unseen single char scores (min model logp - UNK_DELTA)


# ---------------------------------------------------------------------------
# driver-side training (bounded pool — corpus-size-independent)
# ---------------------------------------------------------------------------

def _pool_words(pool: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """Attach the ▁ word-begin marker to the bounded (word, cnt) pool."""
    return [(BOUNDARY + w, c) for w, c in pool]


def seed_vocab(words: list[tuple[str, int]], seed_size: int = 2_000,
               max_piece_len: int = 8) -> dict[str, float]:
    """Frequency-weighted substring seeds: every substring of every pooled
    word up to max_piece_len, counted once per occurrence per word weight.
    Returns the top ``seed_size`` multi-char pieces by (freq desc, piece
    asc) UNION all single characters (coverage floor — a vocab that cannot
    spell a pool word makes its lattice empty)."""
    freq: dict[str, float] = {}
    for w, c in words:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                freq[p] = freq.get(p, 0.0) + c
    singles = {p: f for p, f in freq.items() if len(p) == 1}
    multi = sorted(((p, f) for p, f in freq.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = dict(singles)
    out.update(multi)
    return out


def _normalize(freq: dict[str, float]) -> dict[str, float]:
    """freq → logp (one shared definition for init and the M-step)."""
    total = sum(freq.values())
    return {p: math.log(f / total) for p, f in freq.items() if f > 0.0}


def _lse(xs: list[float]) -> float:
    m = max(xs)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _forward(word: str, logp: dict[str, float], max_len: int) -> list[float]:
    """alpha[i] = log total prob of all segmentations of word[:i]."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        terms = []
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is not None and alpha[i] > -math.inf:
                terms.append(alpha[i] + lp)
        if terms:
            alpha[j] = _lse(terms)
    return alpha


def _backward(word: str, logp: dict[str, float], max_len: int) -> list[float]:
    n = len(word)
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        terms = []
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] > -math.inf:
                terms.append(lp + beta[j])
        if terms:
            beta[i] = _lse(terms)
    return beta


def corpus_loglik(words: list[tuple[str, int]], logp: dict[str, float],
                  max_len: int) -> float:
    """Σ cnt · log P(word) over the pool — the EM objective (tests pin it
    non-decreasing across EM steps at fixed vocab)."""
    total = 0.0
    for w, c in words:
        total += c * _forward(w, logp, max_len)[len(w)]
    return total


def _expected_counts(words: list[tuple[str, int]], logp: dict[str, float],
                     max_len: int) -> dict[str, float]:
    """E-step: expected piece counts by forward-backward over every pool
    word's segmentation lattice — the ONE numerically sensitive
    accumulation, shared by em_step and _prune."""
    exp_cnt: dict[str, float] = {p: 0.0 for p in logp}
    for w, c in words:
        n = len(w)
        alpha = _forward(w, logp, max_len)
        z = alpha[n]
        if z == -math.inf:
            continue
        beta = _backward(w, logp, max_len)
        for i in range(n):
            if alpha[i] == -math.inf:
                continue
            for j in range(i + 1, min(i + max_len, n) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and beta[j] > -math.inf:
                    exp_cnt[w[i:j]] += c * math.exp(
                        alpha[i] + lp + beta[j] - z)
    return exp_cnt


def em_step(words: list[tuple[str, int]], logp: dict[str, float],
            max_len: int) -> dict[str, float]:
    """One EM round: expected piece counts by forward-backward, then the
    closed-form M-step re-normalization. Pieces whose expected count hits
    exactly zero drop out UNLESS single chars (coverage floor: they keep
    an epsilon so every word stays spellable)."""
    exp_cnt = _expected_counts(words, logp, max_len)
    floor = min((v for v in exp_cnt.values() if v > 0.0), default=1.0) * 1e-6
    kept = {p: (v if v > 0.0 else (floor if len(p) == 1 else 0.0))
            for p, v in exp_cnt.items()}
    return _normalize({p: v for p, v in kept.items() if v > 0.0})


def _prune(words: list[tuple[str, int]], logp: dict[str, float],
           max_len: int, keep: int) -> dict[str, float]:
    """Drop the lowest-expected-count multi-char pieces until ``keep``
    remain (singles never drop). Deterministic tie-break: the single
    (cnt, piece) descending sort means on equal expected counts the
    lexicographically GREATER piece survives. Counts are recomputed under the
    CURRENT (post-EM) probs — ranking under stale pre-M-step counts would
    prune a different set."""
    exp_cnt = _expected_counts(words, logp, max_len)
    multi = sorted(((p, v) for p, v in exp_cnt.items() if len(p) > 1),
                   key=lambda kv: (kv[1], kv[0]), reverse=True)
    n_singles = sum(1 for p in logp if len(p) == 1)
    survivors = {p for p, _ in multi[:max(0, keep - n_singles)]}
    return {p: lp for p, lp in logp.items()
            if len(p) == 1 or p in survivors}


def train_unigram(docs: DataFrame, vocab_size: int = 512,
                  max_words: int = 50_000, seed_size: int = 2_000,
                  max_piece_len: int = 8, em_steps: int = 2,
                  shrink: float = 0.75,
                  text_col: str = "text") -> list[tuple[str, float]]:
    """One corpus scan (bpe.top_words) + driver-side EM/prune loop → the
    model artifact: (piece, logp) sorted (logp desc, piece asc). The loop
    is the published schedule: EM ``em_steps`` times, prune to
    max(vocab_size, ⌈|V|·shrink⌉), repeat until |V| ≤ vocab_size, one
    final EM pass."""
    words = _pool_words(bpe.top_words(docs, max_words, text_col))
    if not words:
        raise ValueError("unigram training needs a non-empty corpus")
    logp = _normalize(seed_vocab(words, seed_size, max_piece_len))
    while True:
        for _ in range(em_steps):
            logp = em_step(words, logp, max_piece_len)
        if len(logp) <= vocab_size:
            break
        keep = max(vocab_size, int(math.ceil(len(logp) * shrink)))
        if keep >= len(logp):  # singles alone exceed the target: done
            break
        pruned = _prune(words, logp, max_piece_len, keep)
        if len(pruned) == len(logp):
            break
        logp = _normalize({p: math.exp(lp) for p, lp in pruned.items()})
    for _ in range(em_steps):
        logp = em_step(words, logp, max_piece_len)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


# ---------------------------------------------------------------------------
# Viterbi encode (shared by the Spark kernel and the serving helpers)
# ---------------------------------------------------------------------------

def viterbi_pieces(word: str, logp: dict[str, float], max_len: int,
                   unk_logp: float) -> list[str]:
    """Max-probability segmentation of ONE ▁-prefixed word. Unseen single
    characters score ``unk_logp`` so segmentation never fails. Exact score
    ties prefer the LONGER last piece (deterministic; matches the
    independent reference in tests)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == -math.inf:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                if j - i != 1:
                    continue
                lp = unk_logp
            s = best[i] + lp
            # strict > keeps the EARLIEST i (the longest last piece)
            if s > best[j]:
                best[j], back[j] = s, i
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def model_unk_logp(model: list[tuple[str, float]]) -> float:
    return min(lp for _, lp in model) - UNK_DELTA


def encode_unigram(docs: DataFrame, model: list[tuple[str, float]],
                   id_col: str = "doc_id", text_col: str = "text",
                   passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Unigram instantiation of bpe.encode_pieces (the ONE shared
    word-level kernel — whitespace split, NULL-text quarantine, memo cap,
    passthrough, schema): Viterbi runs once per DISTINCT word per task."""
    logp = dict(model)
    max_len = max(len(p) for p in logp)
    unk = model_unk_logp(model)

    def factory():
        return lambda w: viterbi_pieces(BOUNDARY + w, logp, max_len, unk)

    return bpe.encode_pieces(docs, factory, id_col=id_col,
                             text_col=text_col, passthrough=passthrough)


# ---------------------------------------------------------------------------
# serving artifacts (vocab-bounded; same hash-vocab id rule as BPE)
# ---------------------------------------------------------------------------

def token_id_py(piece: str, vocab_size: int) -> int:
    """Pure-Python twin of bpe._TOKEN_ID_SQL (md5-prefix hash vocab) —
    parity pinned against the SQL expression in tests/test_unigram.py."""
    import hashlib

    return int(hashlib.md5(piece.encode("utf-8")).hexdigest()[:8],
               16) % vocab_size


def unigram_vocab_rows(model: list[tuple[str, float]],
                       vocab_size: int = 65_536) -> list[dict]:
    """(piece, logp, token_id) serving rows straight from the model — the
    unigram model IS its vocab, so no corpus scan is needed (contrast
    bpe_vocab_table, which must discover the distinct pieces)."""
    return [{"piece": p, "logp": lp,
             "token_id": token_id_py(p, vocab_size)} for p, lp in model]


def tokenize_documents_unigram(docs: DataFrame,
                               model: list[tuple[str, float]],
                               vocab_size: int = 65_536,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               source_col: str = "source") -> DataFrame:
    """documents → the BASELINE.json sequence shape (doc_id, tokens, n_tok,
    source) under the unigram model — drop-in alongside
    tokenize.tokenize_documents (hash vocab) and
    bpe.tokenize_documents_bpe. Piece → id is the SAME md5-prefix rule
    (bpe._TOKEN_ID_SQL — one definition, imported)."""
    has_src = source_col in docs.columns
    pieces = encode_unigram(docs, model, id_col=id_col, text_col=text_col,
                            passthrough=(source_col,) if has_src else ())
    return bpe.pieces_to_sequences(pieces, vocab_size, source_col, has_src)


def detokenize_unigram(seqs: DataFrame, model: list[tuple[str, float]],
                       vocab_size: int = 65_536,
                       id_col: str = "doc_id",
                       tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, text): invert tokenize_documents_unigram through the
    model's id→piece map. Exact round-trip detok(tok(x)) == lower_fold +
    ws-normalized x whenever the model's ids are collision-free AND the
    text contains no literal ▁ (the in-band-marker ambiguity, same
    disclosure as detokenize_bpe). Colliding ids resolve to the
    HIGHER-logp piece (logp desc, piece asc), unknown ids to U+FFFD.
    Kernel is mapInPandas: join-free, zero shuffle."""
    from collections.abc import Iterator

    best: dict[int, tuple[float, str]] = {}
    for p, lp in model:
        tid = token_id_py(p, vocab_size)
        cur = best.get(tid)
        if cur is None or (-lp, p) < (-cur[0], cur[1]):
            best[tid] = (lp, p)
    mapping = {tid: p for tid, (_, p) in best.items()}

    def detok(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, texts = [], []
            for did, toks in zip(pdf[id_col], pdf[tokens_col]):
                ids.append(did)
                if toks is None:
                    texts.append(None)
                    continue
                s = "".join(mapping.get(int(t), "�") for t in toks)
                texts.append(s.replace(BOUNDARY, " ").lstrip(" "))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "text": texts,
            })

    return seqs.select(F.col(id_col).alias(id_col), tokens_col).mapInPandas(
        detok, schema="doc_id bigint, text string")
