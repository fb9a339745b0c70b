"""Perplexity filtering — the CCNet/LLaMA-style quality gate: score each
document by an n-gram language model trained on a REFERENCE corpus (see
train_bigram_lm's self-training caveat) and drop the high-perplexity tail. Completes the quality
family: rule gates (functions/text.py) → trained classifier
(operators/classifier.py) → LM perplexity (here).

Model: interpolated bigram LM with add-one-smoothed unigram back-off,

    P(w | prev) = λ · c(prev,w)/c(prev)  +  (1−λ) · (c(w)+1)/(N+V+1)

where V counts the KNOWN vocabulary and every unknown word maps to one
shared <unk> type (the +1 in both numerator and denominator is <unk>'s
add-one slot, so probabilities stay proper and no log(0) exists).
doc score = mean log P over its bigram transitions (docs with < 2 words
are ABSENT from the score table — no transitions to judge — and the
gate drops them).

Shape at scale — everything is counts and equi-joins:

- **train** (two scans): unigram + bigram groupBy counts, map-side
  combinable; vocabulary is CAPPED at the top ``max_vocab`` words
  (TakeOrdered — driver-bounded like kmeans' seed pool and BPE's word
  pool) and bigrams are kept only between in-vocab words, so the model
  tables are vocab-bounded, never corpus-bounded.
- **score** (one scan + two broadcast equi-joins): docs explode to
  (prev, w) transitions, join the broadcast unigram/bigram tables, and a
  per-doc aggregate averages the log-probs. The model tables broadcast by
  construction (≤ max_vocab + observed in-vocab bigrams); the only
  data-sized exchange is the final per-doc aggregation, keyed on the
  high-cardinality doc id.

Cross-engine parity is exact: counts are integers; the probability and
log arithmetic uses the same double-op order in both engines (every
float literal CAST to DOUBLE — bare decimals parse as DECIMAL in both);
and the per-doc mean of logs follows the repo's decimal-sum parity rule
(round each log to a fixed scale, sum exactly as DECIMAL, divide last)
so the average is fold-order-free — identical across engines AND
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import _words_expr, _words_sql_duck

LAMBDA = 0.7


def train_bigram_lm(docs: DataFrame, max_vocab: int = 50_000,
                    min_count: int = 1, text_col: str = "text",
                    ) -> tuple[dict[str, int], dict[tuple[str, str], int], int]:
    """(unigram counts over the capped vocab, bigram counts between
    in-vocab words, total token count N). Two scans, both map-side
    combinable; results are vocab-bounded.

    Train on a REFERENCE corpus, not the corpus being scored: a
    self-trained model memorizes its own hapax bigrams (each scores the
    full λ·1/1 interpolation weight), so gibberish unique to one document
    looks 'perfect' — CCNet trains its filter LM on Wikipedia for exactly
    this reason. ``min_count`` (> 1) is the self-training mitigation:
    bigrams seen fewer times are dropped from the table, falling back to
    the unigram term."""
    ws = _words_expr(text_col)
    uni = (docs.select(F.explode(F.expr(ws)).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    top = uni.orderBy(F.desc("c"), F.asc("w")).limit(max_vocab).collect()
    vocab = {r.w: int(r.c) for r in top}
    n_total = int(docs.select(
        F.sum(F.expr(f"size({ws})")).alias("n")).collect()[0]["n"] or 0)

    pairs = (docs.select(F.expr(
        f"transform(array({ws}), ws -> CASE WHEN size(ws) < 2 "
        f"THEN CAST(array() AS array<struct<p:string,w:string>>) "
        f"ELSE transform(sequence(1, size(ws) - 1), "
        f"j -> named_struct('p', ws[j - 1], 'w', ws[j])) END)[0]"
    ).alias("bg")).select(F.explode("bg").alias("b"))
        .select(F.col("b.p").alias("p"), F.col("b.w").alias("w")))
    # Bound the collect by the CAPPED vocab, not the corpus: distinct
    # bigram TYPES grow with the corpus, so collecting them all and
    # filtering driver-side is a driver OOM at the scale the module
    # contract claims. Broadcast-semi-join both endpoints against the
    # vocab and push min_count into a post-aggregate filter, so at most
    # |vocab|² (observed, far fewer) rows ever reach the driver.
    vdf = F.broadcast(docs.sparkSession.createDataFrame(
        [(w,) for w in vocab], "w string"))
    big = (pairs
           .join(vdf.select(F.col("w").alias("p")), "p", "leftsemi")
           .join(vdf, "w", "leftsemi")
           .groupBy("p", "w").agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") >= int(min_count))
           .collect())
    bigrams = {(r.p, r.w): int(r.c) for r in big}
    return vocab, bigrams, n_total


def _logp_sql(lam: float, n_total: int, v: int) -> str:
    """The shared log-P formula over columns (cw, cp, cpw) — unigram count
    of w (0 if unk), count of prev, count of (prev,w); identical double-op
    order in both engines."""
    d = "CAST({!r} AS DOUBLE)".format
    uni = f"(CAST(cw AS DOUBLE) + {d(1.0)}) / {d(float(n_total + v + 1))}"
    bi = (f"CASE WHEN cp > 0 AND cpw > 0 "
          f"THEN {d(lam)} * (CAST(cpw AS DOUBLE) / CAST(cp AS DOUBLE)) "
          f"ELSE {d(0.0)} END")
    return f"ln({bi} + {d(1.0 - lam)} * ({uni}))"


def doc_logprob(docs: DataFrame, vocab: dict[str, int],
                bigrams: dict[tuple[str, str], int], n_total: int,
                lam: float = LAMBDA, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_trans, avg_logp) — higher avg_logp = more natural text;
    perplexity = exp(-avg_logp). Docs with < 2 words have no transitions
    and are absent from the output."""
    spark = docs.sparkSession
    v = len(vocab)
    uni_df = spark.createDataFrame(
        [(w, c) for w, c in vocab.items()], "w string, cw bigint")
    bi_df = spark.createDataFrame(
        [(p, w, c) for (p, w), c in bigrams.items()],
        "p string, w string, cpw bigint")
    ws = _words_expr(text_col)
    trans = (docs.select(
        F.col(id_col),
        F.expr(
            f"transform(array({ws}), ws -> CASE WHEN size(ws) < 2 "
            f"THEN CAST(array() AS array<struct<p:string,w:string>>) "
            f"ELSE transform(sequence(1, size(ws) - 1), "
            f"j -> named_struct('p', ws[j - 1], 'w', ws[j])) END)[0]"
        ).alias("bg"))
        .select(id_col, F.explode("bg").alias("b"))
        .select(id_col, F.col("b.p").alias("p"), F.col("b.w").alias("w")))
    scored = (trans
              .join(F.broadcast(uni_df), "w", "left")
              .join(F.broadcast(uni_df.select(F.col("w").alias("p"),
                                              F.col("cw").alias("cp"))),
                    "p", "left")
              .join(F.broadcast(bi_df), ["p", "w"], "left")
              .withColumn("cw", F.coalesce("cw", F.lit(0)))
              .withColumn("cp", F.coalesce("cp", F.lit(0)))
              .withColumn("cpw", F.coalesce("cpw", F.lit(0)))
              .withColumn("logp", F.expr(_logp_sql(lam, n_total, v))))
    # decimal-exact per-doc mean (parity rule: round each term, sum as
    # DECIMAL, divide last — fold-order-free)
    return (scored
            .withColumn("logp_d",
                        F.round("logp", 9).cast("decimal(28,9)"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_trans"),
                 # cast the EXACT decimal sum to double BEFORE dividing:
                 # decimal division rounds to an engine-specific result
                 # scale (Spark and DuckDB disagree), flipping the 6th
                 # digit on exact boundaries; double/long division is
                 # bit-identical in both engines
                 F.round(F.sum("logp_d").cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_logp")))


def doc_logprob_sql_duck(vocab: dict[str, int],
                         bigrams: dict[tuple[str, str], int], n_total: int,
                         lam: float = LAMBDA, rel: str = "documents",
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB twin — the model tables inline as VALUES (vocab-bounded by
    construction), same formula, same decimal-sum mean."""
    def esc(s: str) -> str:
        return s.replace("'", "''")

    v = len(vocab)
    uni_rows = ", ".join(f"('{esc(w)}', {c})" for w, c in
                         sorted(vocab.items())) or "('', 0)"
    bi_rows = ", ".join(
        f"('{esc(p)}', '{esc(w)}', {c})"
        for (p, w), c in sorted(bigrams.items())) or "('', '', 0)"
    ws = _words_sql_duck(text_col)
    logp = _logp_sql(lam, n_total, v)
    return f"""
    WITH uni(w, cw) AS (VALUES {uni_rows}),
    bi(p, w, cpw) AS (VALUES {bi_rows}),
    words AS (SELECT {id_col}, {ws} AS ws FROM {rel}),
    trans AS (
      SELECT {id_col}, ws[j] AS p, ws[j + 1] AS w
      FROM words, unnest(range(1, len(ws))) t(j)
      WHERE len(ws) >= 2),
    scored AS (
      SELECT t.{id_col},
             coalesce(u.cw, 0) AS cw,
             coalesce(up.cw, 0) AS cp,
             coalesce(b.cpw, 0) AS cpw
      FROM trans t
      LEFT JOIN uni u ON t.w = u.w
      LEFT JOIN uni up ON t.p = up.w
      LEFT JOIN bi b ON t.p = b.p AND t.w = b.w)
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_trans,
           round(CAST(sum(CAST(round({logp}, 9) AS DECIMAL(28,9)))
                      AS DOUBLE) / count(*), 6) AS avg_logp
    FROM scored GROUP BY 1"""


def perplexity_gate(docs: DataFrame, vocab: dict[str, int],
                    bigrams: dict[tuple[str, str], int], n_total: int,
                    max_ppl: float = 1000.0, lam: float = LAMBDA,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Keep docs with perplexity ≤ max_ppl (and ≥ 2 words): the CCNet
    gate. perplexity = exp(-avg_logp)."""
    lp = doc_logprob(docs, vocab, bigrams, n_total, lam, id_col, text_col)
    kept = lp.filter(
        F.exp(-F.col("avg_logp")) <= F.lit(float(max_ppl)))
    return docs.join(kept.select(id_col), id_col, "leftsemi")
