"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
distribution matches a TARGET corpus. Completes the selection family:
rule gates (functions/text.py) → trained classifier (classifier.py) → LM
perplexity (lm.py) → distribution matching (here). Unlike the classifier
(which needs labels) and perplexity (which only measures naturalness),
DSIR steers the selected SLICE toward a target domain while keeping
diversity via Gumbel-noised resampling instead of a hard top-k cutoff.

Model: both corpora are reduced to bag-of-hashed-n-gram counts (unigrams
+ bigrams hashed into ``n_buckets`` — the paper's feature space). Each
bucket gets a Laplace-smoothed log importance ratio

    lam_b = ln((t_b + 1) / (T + B))  -  ln((r_b + 1) / (R + B))

and a document's importance log-weight is the sum of lam over its n-gram
OCCURRENCES (the log importance weight of its hashed multinomial draw).
Resampling draws without replacement via the Gumbel-top-k trick: rank by
``score + Gumbel(md5(doc_id | seed))`` — equivalent to sampling k docs
with probability ∝ exp(score), deterministic under a fixed seed.

Shape at scale:

- **fit** (one scan per corpus): explode n-grams → groupBy bucket count,
  map-side combinable; the result is B-bounded (default 8192), collected
  once and turned into literals — model tables are bucket-bounded, never
  corpus-bounded.
- **score** (one scan): explode n-grams → bucket → broadcast equi-join
  against the B-row lam table → per-doc aggregate keyed on the
  high-cardinality doc id. No corpus-sized shuffle beyond that final agg.
- **resample**: rank key = score + gumbel, orderBy+limit(k) — Spark
  executes TakeOrdered (per-partition top-k, k-bounded merge at the
  driver); no global sort materializes.

Cross-engine parity: bucket ids come from the md5-prefix hash family
(dedup._XH_* — PARITY.md's cross-engine stable hash); lam values are
computed ONCE in driver python and inlined as literals in BOTH engines
(no engine ln in the hot path); per-doc sums follow the decimal-sum
parity rule (round each lam to 9, sum exactly as DECIMAL, cast DOUBLE
last — lm.py's rule, PARITY.md traps 8/9/11). The Gumbel key does use
engine ``ln`` — its operands are exact dyadic doubles from the md5 hash,
and the rank key is rounded to 9 decimals with a doc-id tiebreak before
ranking — a last-ulp ln divergence reorders the top-k only if a key
lands within an ulp of a 0.5e-9 rounding boundary AND that doc sits
exactly at the k cut (vanishingly improbable on the pinned seed, not
impossible; the oracle gate would catch such a fixture collision).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .corpus import _words_expr, _words_sql_duck
from .dedup import _XH_DUCK, _XH_SPARK

DSIR_BUCKETS = 8192


def _grams_sql_spark(text_col: str) -> str:
    """array<string> of unigrams + space-joined bigrams — ONE definition
    per engine (corpus.py convention). The transform(array(ws), ...) wrap
    binds the words array once (PARITY.md trap 17); the size<2 CASE guards
    Spark's DESCENDING sequence(1, 0) (DuckDB's range is empty there)."""
    ws = _words_expr(text_col)
    return (
        f"transform(array({ws}), ws -> CASE WHEN size(ws) < 2 THEN ws "
        f"ELSE concat(ws, transform(sequence(1, size(ws) - 1), "
        f"j -> concat(ws[j - 1], ' ', ws[j]))) END)[0]"
    )


def _unibigrams_case_duck(ws: str = "ws") -> str:
    """DuckDB: the unigram+bigram list over an already-bound word-list
    column (corpus.py's bound-ws CTE pattern — NEVER inline the words
    expression here; it would re-evaluate per reference)."""
    return (
        f"CASE WHEN len({ws}) < 2 THEN {ws} "
        f"ELSE list_concat({ws}, list_transform(range(1, len({ws})), "
        f"j -> {ws}[j] || ' ' || {ws}[j + 1])) END"
    )


def _bucket_sql_spark(gram: str, n_buckets: int) -> str:
    return f"{_XH_SPARK.format(s=gram)} % {int(n_buckets)}"


def _bucket_sql_duck(gram: str, n_buckets: int) -> str:
    return f"{_XH_DUCK.format(s=gram)} % {int(n_buckets)}"


def _bucket_counts(docs: DataFrame, n_buckets: int,
                   text_col: str) -> tuple[dict[int, int], int]:
    """(bucket -> n-gram occurrence count, total occurrences). One scan,
    map-side combinable; result ≤ n_buckets rows."""
    rows = (docs.select(
        F.explode(F.expr(_grams_sql_spark(text_col))).alias("g"))
        .select(F.expr(_bucket_sql_spark("g", n_buckets)).alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
        .collect())
    counts = {int(r.b): int(r.c) for r in rows}
    return counts, sum(counts.values())


def dsir_fit(target_docs: DataFrame, raw_docs: DataFrame,
             n_buckets: int = DSIR_BUCKETS,
             text_col: str = "text") -> tuple[dict[int, float], float]:
    """Fit the bucket log-ratio table: (lam for observed buckets, default
    lam for never-observed buckets). Values are rounded to 9 decimals HERE
    — both engines consume them as exact literals."""
    t, t_tot = _bucket_counts(target_docs, n_buckets, text_col)
    r, r_tot = _bucket_counts(raw_docs, n_buckets, text_col)
    td = float(t_tot + n_buckets)
    rd = float(r_tot + n_buckets)
    lam = {
        b: round(math.log((t.get(b, 0) + 1) / td)
                 - math.log((r.get(b, 0) + 1) / rd), 9)
        for b in set(t) | set(r)
    }
    lam0 = round(math.log(1.0 / td) - math.log(1.0 / rd), 9)
    return lam, lam0


def dsir_scores(docs: DataFrame, lam: dict[int, float], lam0: float,
                n_buckets: int = DSIR_BUCKETS, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_grams, dsir_score): per-doc importance log-weight. Docs
    with zero n-grams (empty/NULL text) are absent — they carry no
    evidence either way, matching lm.doc_logprob's absence rule."""
    spark = docs.sparkSession
    lam_df = spark.createDataFrame(
        [(b, v) for b, v in sorted(lam.items())] or [(-1, 0.0)],
        "b bigint, lam double")
    grams = (docs.select(
        F.col(id_col),
        F.explode(F.expr(_grams_sql_spark(text_col))).alias("g"))
        .select(id_col, F.expr(_bucket_sql_spark("g", n_buckets)).alias("b")))
    return (grams
            .join(F.broadcast(lam_df), "b", "left")
            .withColumn("lam_d",
                        F.coalesce("lam", F.lit(float(lam0)))
                        .cast("decimal(28,9)"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 # exact decimal sum, cast double LAST (PARITY.md trap 9)
                 F.round(F.sum("lam_d").cast("double"), 6)
                 .alias("dsir_score")))


def dsir_scores_sql_duck(lam: dict[int, float], lam0: float,
                         n_buckets: int = DSIR_BUCKETS,
                         rel: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB twin — lam inlined as VALUES (bucket-bounded), same decimal
    sum. VALUES elements CAST per PARITY.md trap 18."""
    lam_rows = ", ".join(
        f"({b}, CAST({v!r} AS DOUBLE))" for b, v in sorted(lam.items())
    ) or "(-1, CAST(0.0 AS DOUBLE))"
    bucket = _bucket_sql_duck("g", n_buckets)
    return f"""
    WITH lam(b, lam) AS (VALUES {lam_rows}),
    words AS (SELECT {id_col}, {_words_sql_duck(text_col)} AS ws
              FROM {rel}),
    grams AS (
      SELECT {id_col}, {bucket} AS b
      FROM (SELECT {id_col}, unnest({_unibigrams_case_duck()}) AS g
            FROM words)),
    joined AS (
      SELECT g.{id_col},
             CAST(coalesce(l.lam, CAST({float(lam0)!r} AS DOUBLE))
                  AS DECIMAL(28,9)) AS lam_d
      FROM grams g LEFT JOIN lam l ON g.b = l.b)
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_grams,
           round(CAST(sum(lam_d) AS DOUBLE), 6) AS dsir_score
    FROM joined GROUP BY 1"""


# Gumbel key: u = (h + 0.5) / 2^32 with h the md5-prefix hash of
# (doc_id | seed) — u in (0,1) exclusive, exact dyadic double, so
# -ln(-ln(u)) has identical operands in both engines. Rounded to 9 and
# doc-id-tiebroken before ranking (see module doc).
_GUMBEL_SPARK = (
    "round({score} + -ln(-ln((CAST({h} AS DOUBLE) + CAST(0.5 AS DOUBLE)) "
    "/ CAST(4294967296.0 AS DOUBLE))), 9)"
)


def _check_seed(seed: str) -> str:
    """The seed is interpolated as a single-quoted literal into BOTH
    engines' SQL; restrict it to characters that are literal-safe AND
    escape-free in both (Spark treats backslash as an escape, DuckDB does
    not — so escaping can't be made parity-safe, only validation can)."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]+", seed):
        raise ValueError(
            f"dsir seed must match [A-Za-z0-9._-]+ (it is inlined as a "
            f"SQL literal in two engines): {seed!r}")
    return seed


def _gumbel_key_spark(score_col: str, id_col: str, seed: str) -> str:
    seed = _check_seed(seed)
    h = _XH_SPARK.format(s=f"concat(CAST({id_col} AS STRING), '|', '{seed}')")
    return _GUMBEL_SPARK.format(score=score_col, h=h)


def _gumbel_key_duck(score_col: str, id_col: str, seed: str) -> str:
    seed = _check_seed(seed)
    h = _XH_DUCK.format(s=f"concat(CAST({id_col} AS VARCHAR), '|', '{seed}')")
    return _GUMBEL_SPARK.format(score=score_col, h=h)


def dsir_resample(docs: DataFrame, lam: dict[int, float], lam0: float,
                  k: int, seed: str = "dsir-v1",
                  n_buckets: int = DSIR_BUCKETS, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Gumbel-top-k importance resampling: (doc_id, dsir_score, sel_key),
    the k selected docs. orderBy+limit executes as TakeOrdered — k-bounded
    at the driver, no global sort. Zero-gram docs are absent from the
    score table and therefore never selected (they carry no evidence)."""
    scored = dsir_scores(docs, lam, lam0, n_buckets, id_col, text_col)
    keyed = scored.withColumn(
        "sel_key", F.expr(_gumbel_key_spark("dsir_score", id_col, seed)))
    return (keyed
            .orderBy(F.desc("sel_key"), F.asc(id_col))
            .limit(int(k))
            .select(id_col, "dsir_score", "sel_key"))


def dsir_scores_e2e_sql_duck(target_where: str,
                             n_buckets: int = DSIR_BUCKETS,
                             rel: str = "documents", id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """End-to-end DuckDB twin: recomputes the FIT in SQL (bucket counts +
    Laplace log ratio) instead of inlining driver-side lam literals — an
    independent re-derivation of the whole pipeline, not an echo of the
    Spark model. ``target_where`` is a predicate over ``rel`` columns
    selecting the target corpus; raw = all of ``rel``, so every scored
    bucket is in rcnt and no lam0 fallback row is needed (kept anyway for
    the general raw ⊉ target case). ln-at-round-9 parity is the lm.py
    precedent (PARITY.md traps 8/9/11 applied the same way)."""
    bucket = _bucket_sql_duck("g", n_buckets)
    b = int(n_buckets)
    lam0 = (f"round(ln(CAST(1 AS DOUBLE) / CAST(tt + {b} AS DOUBLE)) "
            f"- ln(CAST(1 AS DOUBLE) / CAST(rt + {b} AS DOUBLE)), 9)")
    return f"""
    WITH words AS (SELECT {id_col}, ({target_where}) AS is_tgt,
                          {_words_sql_duck(text_col)} AS ws FROM {rel}),
    grams AS (
      SELECT {id_col}, is_tgt, {bucket} AS b
      FROM (SELECT {id_col}, is_tgt, unnest({_unibigrams_case_duck()}) AS g
            FROM words)),
    tcnt AS (SELECT b, count(*) AS c FROM grams WHERE is_tgt GROUP BY b),
    rcnt AS (SELECT b, count(*) AS c FROM grams GROUP BY b),
    tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tcnt) AS tt,
                   (SELECT coalesce(sum(c), 0) FROM rcnt) AS rt),
    lam AS (
      SELECT r.b,
             round(ln(CAST(coalesce(t.c, 0) + 1 AS DOUBLE)
                      / CAST(tt + {b} AS DOUBLE))
                   - ln(CAST(r.c + 1 AS DOUBLE)
                        / CAST(rt + {b} AS DOUBLE)), 9) AS lam
      FROM rcnt r LEFT JOIN tcnt t ON r.b = t.b CROSS JOIN tot),
    joined AS (
      SELECT g.{id_col},
             CAST(coalesce(l.lam, (SELECT {lam0} FROM tot))
                  AS DECIMAL(28,9)) AS lam_d
      FROM grams g LEFT JOIN lam l ON g.b = l.b)
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_grams,
           round(CAST(sum(lam_d) AS DOUBLE), 6) AS dsir_score
    FROM joined GROUP BY 1"""


def dsir_resample_e2e_sql_duck(target_where: str, k: int,
                               seed: str = "dsir-v1",
                               n_buckets: int = DSIR_BUCKETS,
                               rel: str = "documents",
                               id_col: str = "doc_id",
                               text_col: str = "text") -> str:
    inner = dsir_scores_e2e_sql_duck(target_where, n_buckets, rel,
                                     id_col, text_col)
    key = _gumbel_key_duck("dsir_score", id_col, seed)
    return f"""
    SELECT {id_col}, dsir_score, {key} AS sel_key
    FROM ({inner})
    ORDER BY sel_key DESC, {id_col} ASC LIMIT {int(k)}"""


def dsir_resample_sql_duck(lam: dict[int, float], lam0: float, k: int,
                           seed: str = "dsir-v1",
                           n_buckets: int = DSIR_BUCKETS,
                           rel: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    inner = dsir_scores_sql_duck(lam, lam0, n_buckets, rel, id_col, text_col)
    key = _gumbel_key_duck("dsir_score", id_col, seed)
    return f"""
    SELECT {id_col}, dsir_score, {key} AS sel_key
    FROM ({inner})
    ORDER BY sel_key DESC, {id_col} ASC LIMIT {int(k)}"""
