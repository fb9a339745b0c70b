"""Inverted index (posting lists) + BM25 top-k serving — the SCALE path
for operators/relevance.py.

relevance.bm25_scores rescans the whole corpus per query (right for
curation sweeps where every doc gets a score). Serving repeated topical
queries at 10^12 docs wants the classic IR shape instead: build
(term, doc_id, tf, dl) postings ONCE, then answer a query by touching
only the query terms' posting lists. dl is denormalized into the posting
row so the query path never joins back to the corpus.

Score parity with the full-scan form is EXACT, by construction:

- tf/dl are the same integers the scan form derives (same ``_words``
  tokenization, one definition per engine via relevance.py's builders);
- idf/avgdl literals come from the same stats (N, Σdl, df — df per term
  = posting-list length, identical to the scan form's array_contains
  count because postings only exist for tf ≥ 1);
- the per-doc score is NOT a row-order float sum (PARITY.md float-
  reduction class): terms pivot to fixed columns (``max(CASE WHEN term=tᵢ
  THEN tf END)`` — at most ONE posting per (doc, term), so max picks it
  exactly) and the partials add in the FIXED t₀+t₁+…+tₙ expression order
  of the scan form; an absent term contributes coalesce(·, 0.0), and
  x + 0.0 is exact. Same round(·, 6) tail.

So ``bm25_topk(build_postings(docs), …)`` equals the top-k of
``relevance.bm25_scores(docs, …)`` restricted to docs containing ≥ 1
query term — pinned cross-form by test, cross-engine by the extras gate.

Shape at scale: build = one explode + ONE (term, doc_id) hash-agg
exchange with map-side partials (the corpus' only full pass); stats =
one 1-row aggregate. Query = a LITERAL ``term IN (…)`` filter that
pushes to the postings scan (partition/row-group pruning when the index
is stored partitioned by term — the point of the layout), one bounded
|terms|-row df aggregate, ONE doc-keyed hash-agg over the selected
postings, and a TakeOrdered top-k. No join against the corpus anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import relevance as rv
from .relevance import _check_terms, _idf, _words_duck, _words_spark

K1 = rv.K1
B = rv.B


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, dl): one posting per (term, doc). NULL/empty
    text yields no postings (no identity to serve)."""
    ws = _words_spark(text_col)
    return (docs
            .select(id_col, F.expr(ws).alias("ws_arr"))
            .select(id_col,
                    F.expr("size(ws_arr)").cast("int").alias("dl"),
                    F.explode("ws_arr").alias("term"))
            .groupBy("term", id_col, "dl")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
            .select("term", id_col, "tf", "dl"))


def build_postings_sql_duck(docs_sql: str, id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    ws = _words_duck(text_col)
    return f"""
    SELECT term, {id_col}, CAST(count(*) AS INTEGER) AS tf,
           CAST(dl AS INTEGER) AS dl
    FROM (SELECT {id_col}, len(ws) AS dl, unnest(ws) AS term
          FROM (SELECT {id_col}, {ws} AS ws FROM ({docs_sql}) d0) w) x
    GROUP BY term, {id_col}, dl"""


def index_stats(docs: DataFrame, text_col: str = "text") -> tuple[int, int]:
    """(N, Σdl) — the build-time 1-row stats artifact (df per term is the
    posting-list length, read at query time)."""
    ws = _words_spark(text_col)
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(f"size({ws})")).alias("sdl")).collect()[0]
    if int(row["n"]) == 0:
        raise ValueError("empty corpus has no BM25 statistics "
                         "(index_stats needs at least one document)")
    if row["sdl"] is None or int(row["sdl"]) == 0:
        # non-empty corpus whose every text is NULL sums size() to NULL
        # (ANSI): int(None) crashed opaquely, and a 0 avgdl would divide
        # downstream — same contract style as the empty-corpus guard
        raise ValueError("corpus has no tokens (all texts NULL/empty) — "
                         "no BM25 statistics")
    return int(row["n"]), int(row["sdl"])


def _partials(terms: list[str], n: int, avgdl: float, dfs: dict[str, int],
              k1: float, b: float, idf_sql: dict[str, str] | None = None,
              ) -> str:
    """The FIXED-order t₀+t₁+… score expression over pivoted columns
    tf0..tfN and dl — engine-neutral; idf is a python literal unless
    ``idf_sql`` supplies per-term SQL (the self-contained duck twin).
    Mirrors relevance.bm25_scores' expression shape exactly."""
    d = "CAST({!r} AS DOUBLE)".format
    parts = []
    for i, t in enumerate(terms):
        idf = idf_sql[t] if idf_sql else d(_idf(n, dfs[t]))
        tf = f"CAST(tf{i} AS DOUBLE)"
        part = (f"{idf} * ({tf} * {d(k1 + 1)}) / "
                f"({tf} + {d(k1)} * ({d(1.0)} - {d(b)} + {d(b)} * "
                f"CAST(dl AS DOUBLE) / "
                f"{'s.avgdl' if idf_sql else d(avgdl)}))")
        parts.append(f"coalesce({part}, CAST(0.0 AS DOUBLE))")
    return f"round({' + '.join(parts)}, 6)"


def _pivot_aggs(terms: list[str]) -> list[str]:
    """tfᵢ pivot columns — at most one posting per (doc, term), so max
    IS the value; dl is constant per doc."""
    aggs = [f"max(CASE WHEN term = '{t.lower()}' THEN tf END) AS tf{i}"
            for i, t in enumerate(terms)]
    return aggs + ["max(dl) AS dl"]


def bm25_topk(postings: DataFrame, n: int, sdl: int, terms: list[str],
              k: int = 25, k1: float = K1, b: float = B,
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bm25) — top-k by (bm25 DESC, doc_id) over the postings of
    the query terms only. df per term is a bounded |terms|-row collect
    (the corpus_stats pattern).

    ``sel`` — the query terms' postings, |terms|·df-bounded, never
    corpus-bounded — is persisted because it is consumed TWICE: the df
    collect here and the returned score plan. Without it, a postings
    argument that is an unpersisted in-memory BUILD re-executes its whole
    tokenize/explode/agg lineage once per action (the allocate_budget /
    frontier_schedule_scalable review-finding pattern). Caller releases
    (registry.release_caches / clearCache), per the cache rule; over a
    term-partitioned STORE both consumers are pruned scans and the
    persist is merely small."""
    _check_terms(terms)
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    tl = [t.lower() for t in terms]
    sel = postings.filter(F.col("term").isin(tl)).persist()  # literal pushdown
    dfs = {r["term"]: int(r["df"]) for r in
           sel.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
           .collect()}
    dfs = {t: dfs.get(t, 0) for t in tl}
    avgdl = float(sdl) / n  # the relevance.py double recipe
    score = _partials(tl, n, avgdl, dfs, k1, b)
    return (sel.groupBy(id_col)
            .agg(*(F.expr(a.split(" AS ")[0]).alias(a.split(" AS ")[1])
                   for a in _pivot_aggs(tl)))
            .select(id_col, F.expr(score).alias("bm25"))
            .orderBy(F.desc("bm25"), F.asc(id_col))
            .limit(k))


def bm25_topk_sql_duck(docs_sql: str, terms: list[str], k: int = 25,
                       k1: float = K1, b: float = B,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Self-contained twin: DuckDB re-derives postings, stats, df AND idf
    in SQL (independent recomputation, not an echo of the python
    literals — the bm25_scores_sql_duck discipline)."""
    _check_terms(terms)
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    tl = [t.lower() for t in terms]
    ws = _words_duck(text_col)
    in_list = ", ".join(f"'{t}'" for t in tl)
    df_aggs = ", ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS dfx{i}"
        for i, t in enumerate(tl))
    dd = "CAST({!r} AS DOUBLE)".format
    idf_sql = {
        t: (f"ln({dd(1.0)} + (CAST(s.n - f.dfx{i} AS DOUBLE) + {dd(0.5)}) "
            f"/ (CAST(f.dfx{i} AS DOUBLE) + {dd(0.5)}))")
        for i, t in enumerate(tl)}
    score = _partials(tl, 0, 0.0, {}, k1, b, idf_sql=idf_sql)
    pivots = ",\n           ".join(_pivot_aggs(tl))
    postings = build_postings_sql_duck(docs_sql, id_col, text_col)
    return f"""
    WITH w AS (SELECT {id_col}, {ws} AS ws FROM ({docs_sql}) d1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl
          FROM w),
    p AS ({postings}),
    sel AS (SELECT * FROM p WHERE term IN ({in_list})),
    f AS (SELECT {df_aggs} FROM sel),
    pv AS (SELECT {id_col},
           {pivots}
           FROM sel GROUP BY {id_col})
    SELECT pv.{id_col} AS {id_col}, {score} AS bm25
    FROM pv CROSS JOIN s CROSS JOIN f
    ORDER BY bm25 DESC, pv.{id_col}
    LIMIT {k}"""
