"""BM25 relevance scoring over the documents table — the query-driven
corpus-curation primitive (rank/filter a web-scale corpus by relevance to a
topic term set; Robertson/Spärck Jones BM25 with Lucene's non-negative
idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

Not in the reference (no retrieval surface there); rounds out the text-
analysis family (quality, lang-id, fingerprints) with topical relevance.

Shape at scale (corpus huge, term set tiny — the asymmetry does the work):

- **stats pass**: ONE full scan → a single aggregate row (N, Σdl, df per
  term as conditional sums) — map-side-combinable, driver-bounded by
  |terms|. At 10^12 docs this is the only shuffle, and it carries one row
  per partition.
- **score pass**: ONE scan, ZERO shuffle — idf/avgdl ride the plan as
  literals; per doc, per term, tf is an array filter over the word array
  (bound once through a transform-wrapper lambda — |terms| filters, no
  explode, no per-term join).

Cross-engine parity is exact: integer stats (N, Σdl, df) are exact in both
engines, every derived double (avgdl, idf, the per-term score sum) is
computed by the same operations in the same order, and the word split is
the repo's shared explicit-whitespace + lower_fold normalization."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    WS_SQL_DUCK,
    WS_SQL_SPARK,
    lower_fold_sql_duck,
    lower_fold_sql_spark,
    trim_sql_duck,
)

K1 = 1.2
B = 0.75


def _check_terms(terms: list[str]) -> None:
    if not terms:
        raise ValueError("BM25 needs at least one query term")
    for t in terms:
        if "'" in t or "\\" in t or any(ch.isspace() for ch in t):
            raise ValueError(f"term {t!r}: single words without quotes or "
                             f"backslashes (terms inline into both engines' "
                             f"SQL as literals)")


def _words_spark(text_col: str) -> str:
    inner = lower_fold_sql_spark(f"trim({text_col})")
    return f"filter(split({inner}, '{WS_SQL_SPARK}'), w -> length(w) > 0)"


def _words_duck(text_col: str) -> str:
    inner = lower_fold_sql_duck(trim_sql_duck(text_col))
    return f"list_filter(string_split_regex({inner}, '{WS_SQL_DUCK}'), w -> len(w) > 0)"


def corpus_stats(docs: DataFrame, terms: list[str],
                 text_col: str = "text") -> tuple[int, int, dict[str, int]]:
    """(N, total_dl, df per term) — one scan, one aggregate row."""
    _check_terms(terms)
    ws = _words_spark(text_col)
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(f"size({ws})")).alias("sdl")]
    for i, t in enumerate(terms):
        aggs.append(F.sum(
            F.expr(f"CASE WHEN array_contains({ws}, '{t.lower()}') "
                   f"THEN 1 ELSE 0 END")).alias(f"df{i}"))
    row = docs.agg(*aggs).collect()[0]
    if int(row["n"]) == 0:
        # n=0 makes sdl aggregate to NULL and avgdl a zero-division —
        # surface the contract violation, not an opaque TypeError.
        raise ValueError("empty corpus has no BM25 statistics "
                         "(corpus_stats needs at least one document)")
    return int(row["n"]), int(row["sdl"]), {
        t: int(row[f"df{i}"]) for i, t in enumerate(terms)}


def _idf(n: int, df: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def bm25_scores(docs: DataFrame, terms: list[str], k1: float = K1,
                b: float = B, id_col: str = "doc_id",
                text_col: str = "text",
                stats: tuple[int, int, dict[str, int]] | None = None,
                ) -> DataFrame:
    """(doc_id, bm25) for every doc — see module doc for the two-pass
    shape. ``stats`` lets callers reuse a stats pass across term subsets."""
    _check_terms(terms)
    n, sdl, dfs = stats if stats is not None else corpus_stats(
        docs, terms, text_col)
    # float(sdl)/n mirrors the duck twin's CAST(sum AS DOUBLE)/count
    # exactly (above 2^53, int/int true division rounds differently)
    avgdl = float(sdl) / n
    parts = []
    for t in terms:
        tl = t.lower()
        idf = _idf(n, dfs[t])
        tf = f"CAST(size(filter(ws, w -> w = '{tl}')) AS DOUBLE)"
        # every float literal CAST to DOUBLE: a bare 2.2 parses as
        # DECIMAL in BOTH engines and decimal intermediates break parity
        d = "CAST({!r} AS DOUBLE)".format
        parts.append(
            f"{d(idf)} * ({tf} * {d(k1 + 1)}) / "
            f"({tf} + {d(k1)} * ({d(1.0)} - {d(b)} + {d(b)} * "
            f"CAST(size(ws) AS DOUBLE) / {d(avgdl)}))")
    score = (f"transform(array({_words_spark(text_col)}), "
             f"ws -> round({' + '.join(parts)}, 6))[0]")
    return docs.select(F.col(id_col), F.expr(score).alias("bm25"))


def bm25_scores_sql_duck(terms: list[str], k1: float = K1, b: float = B,
                         rel: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Self-contained DuckDB twin: the stats CTE recomputes (N, Σdl, df)
    with exact integer aggregation, then derives avgdl/idf with the SAME
    double operations as the driver-side Python, so the inlined-literal
    Spark form and this all-SQL form emit identical doubles."""
    _check_terms(terms)
    ws = _words_duck(text_col)
    df_aggs = ", ".join(
        f"sum(CASE WHEN list_contains(ws, '{t.lower()}') THEN 1 ELSE 0 END) "
        f"AS df{i}" for i, t in enumerate(terms))
    parts = []
    dd = "CAST({!r} AS DOUBLE)".format
    for i, t in enumerate(terms):
        tl = t.lower()
        idf = (f"ln({dd(1.0)} + (CAST(s.n - s.df{i} AS DOUBLE) + {dd(0.5)}) "
               f"/ (CAST(s.df{i} AS DOUBLE) + {dd(0.5)}))")
        tf = f"CAST(len(list_filter(d.ws, w -> w = '{tl}')) AS DOUBLE)"
        parts.append(
            f"{idf} * ({tf} * {dd(k1 + 1)}) / "
            f"({tf} + {dd(k1)} * ({dd(1.0)} - {dd(b)} + {dd(b)} * "
            f"CAST(len(d.ws) AS DOUBLE) / s.avgdl))")
    return f"""
    WITH w AS (SELECT {id_col}, {ws} AS ws FROM {rel}),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl,
                 {df_aggs}
          FROM w)
    SELECT d.{id_col} AS {id_col}, round({' + '.join(parts)}, 6) AS bm25
    FROM w d CROSS JOIN s"""
