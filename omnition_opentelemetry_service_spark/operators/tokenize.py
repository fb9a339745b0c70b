"""Text → token-id ingest: turn the raw documents table into the
north-star pre-tokenized sequence shape (doc_id, tokens array<int>,
n_tok int, source) — the step that FEEDS the parse→enrich→route pipeline
and the release job (BASELINE.json input_hint names exactly this table).

Tokenization = the SAME GPT-2-style pre-tokenizer segmentation the quality
metrics already use (functions/text.bpe_token_estimate — one regex
definition per engine, per the repo's identical-character-classes rule),
followed by a hash vocabulary: token id = md5-prefix of the piece mod
``vocab_size``. A hash vocab is the deterministic, training-free stand-in
for a learned BPE merge table (feature hashing); the segmentation, the id
arithmetic, and the output schema are the production shape — swapping in a
learned vocab changes one lookup, not the pipeline. Both engines compute
identical ids (md5 prefix < 2^32 fits int64 exactly; mod then casts to
int32 losslessly since vocab_size < 2^31).

Shape at scale: pure per-row expressions — one scan, zero shuffle, whole-
stage codegen; the regex segmentation is the dominant cost and it is one
pass per document. NULL text → NULL tokens (a parse-quarantine row, not a
silent empty sequence); empty/whitespace text → empty array (a real,
zero-length document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# THE segmentation pattern — imported from functions/text.py so the token
# counts the quality gates compute and the token ids this ingest emits can
# never desynchronize (one definition; explicit whitespace class because
# Java's \s includes \x0B and RE2's does not). RE2-safe (no lookaround).
from ..functions.text import PIECE_RX  # noqa: E402  (shared definition)

VOCAB_SIZE = 65_536


def tokens_expr(text_col: str = "text",
                vocab_size: int = VOCAB_SIZE) -> F.Column:
    """array<int> of hash-vocab token ids (see module docstring)."""
    # Spark's SQL parser consumes one level of backslash escaping inside a
    # quoted literal ('\s' → 's', silently turning the char class into
    # [^A-Za-z0-9s] — spaces become pieces); DuckDB's quoted strings do
    # not. ONE shared pattern, engine-specific quoting.
    spark_rx = PIECE_RX.replace("\\", "\\\\")
    return F.expr(
        f"transform(regexp_extract_all({text_col}, '{spark_rx}', 0), "
        f"p -> CAST(CAST(conv(substring(md5(p), 1, 8), 16, 10) AS BIGINT) "
        f"% {vocab_size} AS INT))"
    )


def tokens_sql_duck(text_col: str = "text",
                    vocab_size: int = VOCAB_SIZE) -> str:
    return (
        f"list_transform(regexp_extract_all({text_col}, '{PIECE_RX}'), "
        f"p -> CAST(CAST(concat('0x', substr(md5(p), 1, 8)) AS BIGINT) "
        f"% {vocab_size} AS INT))"
    )


def tokenize_documents(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", source_col: str = "source",
                       vocab_size: int = VOCAB_SIZE) -> DataFrame:
    """documents → (doc_id, tokens, n_tok, source): the BASELINE.json
    input-table shape, ready for packing/release/pipeline consumption."""
    toks = tokens_expr(text_col, vocab_size)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        (F.col(source_col) if source_col in docs.columns
         else F.lit("docs")).alias("source"),
    )


def tokenize_documents_sql_duck(rel: str = "documents",
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                source_col: str | None = "source",
                                vocab_size: int = VOCAB_SIZE) -> str:
    toks = tokens_sql_duck(text_col, vocab_size)
    src = source_col if source_col else "'docs'"
    return (
        f"SELECT {id_col} AS doc_id, {toks} AS tokens, "
        f"CAST(len({toks}) AS INT) AS n_tok, {src} AS source FROM {rel}"
    )

def tokenizer_fertility(docs: DataFrame, source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Per-source tokenizer evaluation — the fertility/compression report
    every tokenizer change ships with: (source, n_docs, n_words, n_pieces,
    n_chars, fertility, chars_per_piece). ``fertility`` = pieces per
    whitespace word (≈1 for English with a good vocab, rises on
    out-of-domain text); ``chars_per_piece`` = compression (bytes-per-token
    proxy). Pieces are the PIECE_RX segmentation — the identical character
    classes the hash vocab, the BPE estimate, and the quality gates use
    (one definition per engine, functions/text.PIECE_RX).

    Shape at scale: one scan, map-side-combinable sums, one source-bounded
    exchange — the same shape as every stats pass here. NULL-text rows are
    quarantine rows and are excluded in both engines."""
    from ..functions.text import bpe_token_estimate, token_count

    agg = (docs.filter(F.col(text_col).isNotNull())
           .groupBy(source_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(token_count(text_col)).cast("bigint").alias("n_words"),
                F.sum(bpe_token_estimate(text_col)).cast("bigint")
                .alias("n_pieces"),
                F.sum(F.length(text_col)).cast("bigint").alias("n_chars")))
    return agg.select(
        source_col, "n_docs", "n_words", "n_pieces", "n_chars",
        F.when(F.col("n_words") > 0,
               F.round(F.col("n_pieces") / F.col("n_words"), 6))
        .alias("fertility"),
        F.when(F.col("n_pieces") > 0,
               F.round(F.col("n_chars") / F.col("n_pieces"), 6))
        .alias("chars_per_piece"))


def tokenizer_fertility_sql_duck(rel: str = "documents",
                                 source_col: str = "source",
                                 text_col: str = "text") -> str:
    from ..functions.text import (bpe_token_estimate_sql_duck,
                                  token_count_sql_duck)

    w = token_count_sql_duck(text_col)
    p = bpe_token_estimate_sql_duck(text_col)
    return f"""
    WITH agg AS (
      SELECT {source_col},
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({w}) AS BIGINT) AS n_words,
             CAST(sum({p}) AS BIGINT) AS n_pieces,
             CAST(sum(length({text_col})) AS BIGINT) AS n_chars
      FROM {rel} WHERE {text_col} IS NOT NULL
      GROUP BY {source_col})
    SELECT {source_col}, n_docs, n_words, n_pieces, n_chars,
           CASE WHEN n_words > 0
                THEN round(n_pieces * 1.0 / n_words, 6) END AS fertility,
           CASE WHEN n_pieces > 0
                THEN round(n_chars * 1.0 / n_pieces, 6) END
             AS chars_per_piece
    FROM agg
    """
