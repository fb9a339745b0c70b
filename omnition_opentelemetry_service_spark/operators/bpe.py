"""Learned byte-pair encoding — the real trainable tokenizer behind the
hash-vocab stand-in (operators/tokenize.py discloses that a learned vocab
"changes one lookup, not the pipeline"; this module supplies the learned
vocab). Classic BPE (Sennrich et al., ACL'16): train merge rules on the
word-frequency table, then encode by applying merges in learned order.

Shape at scale — the key structural fact of BPE training is that it runs
over the WORD-FREQUENCY TABLE, not the corpus:

- **word counts**: ONE corpus scan → groupBy(word).count() — map-side
  combinable; the result is vocabulary-sized, not corpus-sized.
- **candidate pool**: the top ``max_words`` words by (count desc, word asc)
  — a bounded TakeOrdered collect (same driver-bounded-pool pattern as
  kmeans.init_centroids). Web-scale corpora have unbounded tails of
  hapaxes; the head carries the pair statistics that matter, and the cap
  makes the driver step corpus-size-independent.
- **merge loop** (driver-side, deterministic): count adjacent symbol pairs
  weighted by word frequency, merge the (count desc, pair lex asc) winner,
  repeat ``n_merges`` times — pure Python over the bounded pool, exactly
  the published algorithm.
- **encode** (one scan, mapInPandas): apply merges per word with a
  per-task memo over DISTINCT words (the simhash-pandas memoization
  pattern — web corpora repeat words heavily, so the merge loop runs once
  per distinct word per task, not once per occurrence).

No DuckDB twin: merge application is an ordered iterative rewrite, not
SQL-expressible — the in-suite oracle is an independent pure-Python
reference implementation plus a hypothesis property on arbitrary text
(tests/test_bpe.py), the same tier as the streaming/stateful ops.

Determinism: ties in pair counts break on pair lexicographic order, word
pool selection ties break on word order, so the trained merge list is a
pure function of the corpus — invariant under partitioning and cluster
size (pinned in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS, lower_fold

END = "</w>"  # end-of-word marker, per the published algorithm


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the lower_fold + explicit-whitespace word split —
    the same normalization as every other text operator here."""
    words = F.explode(
        F.filter(F.split(lower_fold(F.trim(F.col(text_col))), WS),
                 lambda w: F.length(w) > 0)).alias("word")
    return docs.select(words).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt"))


def top_words(docs: DataFrame, max_words: int = 50_000,
              text_col: str = "text") -> list[tuple[str, int]]:
    """Bounded candidate pool: top max_words by (cnt desc, word asc) —
    TakeOrdered, no full sort materialization."""
    rows = (word_counts(docs, text_col)
            .orderBy(F.desc("cnt"), F.asc("word")).limit(max_words).collect())
    return [(r.word, int(r.cnt)) for r in rows]


def train_merges(pool: list[tuple[str, int]],
                 n_merges: int = 200) -> list[tuple[str, str]]:
    """The published merge loop over the bounded (word, count) pool.
    Stops early when no pair occurs twice — merging hapax pairs would
    just memorize the tail."""
    vocab = {tuple(w) + (END,): c for w, c in pool}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def train_bpe(docs: DataFrame, n_merges: int = 200,
              max_words: int = 50_000,
              text_col: str = "text") -> list[tuple[str, str]]:
    """One corpus scan + driver-side merge loop → the ordered merge list."""
    return train_merges(top_words(docs, max_words, text_col), n_merges)


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word: greedily merge the lowest-rank adjacent pair until
    none applies — the published inference rule (merge priority = training
    order, NOT left-to-right position)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_pieces(docs: DataFrame, word_pieces_factory,
                  id_col: str = "doc_id", text_col: str = "text",
                  passthrough: tuple[str, ...] = ()) -> DataFrame:
    """THE word-level encode kernel, shared by every learned tokenizer
    (BPE merges here, unigram Viterbi in operators/unigram.py — one
    definition of the whitespace split, NULL-text quarantine, memo cap,
    passthrough threading, and output schema, so the tokenizers can never
    desynchronize on scaffolding).

    (doc_id, pieces array<string>, n_pieces int[, passthrough...]) — one
    scan, zero shuffle. ``word_pieces_factory()`` is called ONCE PER TASK
    and returns the word → pieces callable; the shared memo wrapper makes
    it run once per DISTINCT word per task (the
    dedup.simhash_signatures_pandas memoization pattern — web corpora
    repeat words heavily). ``passthrough`` string columns ride the kernel
    unchanged — threading them through is free, while reattaching them
    afterwards would be a corpus-sized self-join."""
    from collections.abc import Iterator

    def enc(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import re

        import pandas as pd

        from ..functions.text import lower_fold_py

        ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
        word_fn = word_pieces_factory()
        memo: dict[str, list[str]] = {}

        def word_pieces(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                if len(memo) > 1_000_000:
                    memo.clear()
                got = word_fn(w)
                memo[w] = got
            return got

        for pdf in it:
            ids, pieces = [], []
            # the input select aliases id_col to "doc_id" — read that name,
            # not id_col (KeyError for any non-default id_col otherwise)
            for did, t in zip(pdf["doc_id"], pdf[text_col]):
                if t is None:
                    ids.append(did)
                    pieces.append(None)  # NULL text → NULL pieces (the
                    continue              # quarantine convention)
                ws = [w for w in ascii_ws.split(
                    lower_fold_py(t.strip(" "))) if w]
                out: list[str] = []
                for w in ws:
                    out.extend(word_pieces(w))
                ids.append(did)
                pieces.append(out)
            cols = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "pieces": pieces,
                "n_pieces": pd.Series(
                    [len(p) if p is not None else None for p in pieces],
                    dtype="Int32"),
            }
            for c in passthrough:
                cols[c] = pdf[c]
            yield pd.DataFrame(cols)

    from .widen import widen_if_narrow

    extra = "".join(f", {c} string" for c in passthrough)
    return widen_if_narrow(docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col),
        *[F.col(c) for c in passthrough])).mapInPandas(
        enc, schema=f"doc_id bigint, pieces array<string>, n_pieces int{extra}")


def pieces_to_sequences(pieces: DataFrame, vocab_size: int,
                        source_col: str, has_src: bool) -> DataFrame:
    """pieces → the BASELINE.json sequence shape under the md5-prefix
    hash-vocab id rule (_TOKEN_ID_SQL — one definition, shared by every
    tokenizer's tokenize_documents_*)."""
    toks = F.expr(
        "transform(pieces, p -> "
        + _TOKEN_ID_SQL.format(col="p", vocab_size=vocab_size) + ")")
    return pieces.select(
        "doc_id", toks.alias("tokens"),
        F.col("n_pieces").alias("n_tok"),
        (F.col(source_col) if has_src else F.lit("docs")).alias("source"))


def encode_bpe(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text",
               passthrough: tuple[str, ...] = ()) -> DataFrame:
    """BPE instantiation of encode_pieces: the merge loop runs once per
    DISTINCT word per task (shared memo)."""
    ranks = {p: i for i, p in enumerate(merges)}

    def factory():
        return lambda w: apply_merges(w, ranks)

    return encode_pieces(docs, factory, id_col=id_col, text_col=text_col,
                         passthrough=passthrough)


def tokenize_documents_bpe(docs: DataFrame, merges: list[tuple[str, str]],
                           vocab_size: int = 65_536,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           source_col: str = "source") -> DataFrame:
    """documents → the BASELINE.json sequence shape (doc_id, tokens,
    n_tok, source) with LEARNED-BPE pieces instead of the regex hash vocab
    — a drop-in alternative to tokenize.tokenize_documents. Piece → id is
    the same md5-prefix hash-vocab rule (no OOV table to ship: any piece,
    including characters never seen at train time, maps deterministically).
    """
    has_src = source_col in docs.columns
    pieces = encode_bpe(docs, merges, id_col=id_col, text_col=text_col,
                        passthrough=(source_col,) if has_src else ())
    return pieces_to_sequences(pieces, vocab_size, source_col, has_src)


_TOKEN_ID_SQL = ("CAST(CAST(conv(substring(md5({col}), 1, 8), 16, 10) "
                 "AS BIGINT) % {vocab_size} AS INT)")


def bpe_vocab_table(docs: DataFrame, merges: list[tuple[str, str]],
                    vocab_size: int = 65_536) -> DataFrame:
    """(piece, token_id, cnt): every DISTINCT piece the corpus encodes to,
    with its hash-vocab id (the SAME md5-prefix rule as
    tokenize_documents_bpe — one definition, reused) and its corpus count.
    This is the serving-side id→piece artifact the hash vocab otherwise
    lacks, plus the coverage/collision surface (two pieces sharing a
    token_id = a measurable hash collision).

    Scale shape: explode + ONE hash-agg with map-side partials; output is
    VOCAB-bounded (distinct pieces ≤ chars + merges learned), never
    corpus-bounded."""
    pieces = encode_bpe(docs, merges)
    return (pieces.filter(F.col("pieces").isNotNull())
            .select(F.explode("pieces").alias("piece"))
            .groupBy("piece").agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("token_id", F.expr(_TOKEN_ID_SQL.format(
                col="piece", vocab_size=vocab_size))))


def detokenize_bpe(seqs: DataFrame, vocab_rows: list,
                   id_col: str = "doc_id",
                   tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, text): invert tokenize_documents_bpe through an id→piece
    table. Exact round-trip detok(tok(x)) == lower_fold + ws-normalized x
    whenever (a) the doc's ids are collision-free in the vocab (pinned in
    tests with a collision-free vocab_size) AND (b) the normalized text
    contains no literal end-of-word marker ``</w>`` — the marker is
    in-band, so a document LITERALLY containing it is indistinguishable
    from a word boundary and detokenizes with a space there (the standard
    BPE end-of-word ambiguity; disclosed and pinned in tests rather than
    silently wrong). Colliding ids resolve to the HIGHEST-count piece
    (cnt desc, piece asc — deterministic), unknown ids to U+FFFD.

    ``vocab_rows`` is the COLLECTED bpe_vocab_table (vocab-bounded driver
    artifact — same class as the merge list itself, NOT corpus data).
    Kernel is mapInPandas over Arrow batches: join-free, zero shuffle —
    a broadcast-join + per-token explode/regroup would pay a corpus-sized
    exchange at token grain for the same answer."""
    from collections.abc import Iterator

    best: dict[int, tuple[int, str]] = {}
    for r in vocab_rows:
        tid, piece, cnt = int(r["token_id"]), r["piece"], int(r["cnt"])
        cur = best.get(tid)
        # max cnt wins; ties break on piece ASC
        if cur is None or (-cnt, piece) < (-cur[0], cur[1]):
            best[tid] = (cnt, piece)
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
                texts.append(s.replace(END, " ").rstrip(" "))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "text": texts,
            })

    return seqs.select(F.col(id_col).alias(id_col), tokens_col).mapInPandas(
        detok, schema="doc_id bigint, text string")
