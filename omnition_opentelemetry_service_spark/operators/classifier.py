"""Trained quality classifier — full-batch logistic regression as Spark
aggregates (the fastText-style "model-based quality filter" every modern
training-data pipeline runs after the heuristic gates; e.g. the GPT-3 /
CCNet-style quality classifiers, here as the distributed-trainer shape).

Third member of the iterative-trainer family (kmeans, BPE): the per-
iteration work is ONE corpus scan collapsing to a (dim+1)-wide gradient
row — every sum is map-side combinable, the exchange carries
partitions × (dim+1) doubles, and the weight vector lives driver-side
(bounded by the FEATURE count, not the data).

- **features**: any numeric columns — the existing heuristic signals
  (token_count, punct_ratio, quality_score, dup fractions…) are the
  intended inputs; a standardization pass (mean/std, one aggregate row)
  keeps fixed-learning-rate GD well-conditioned and is folded into the
  returned weights so scoring needs no separate scaler.
- **training** (driver loop): full-batch gradient descent on logistic
  loss. Deterministic init (w = 0) and step rule; like kmeans, the
  gradient sums fold in partition order so weights can differ by ~1 ulp
  across partitionings — tests assert CLASSIFIER-level invariants
  (separable data converges, AUC, loss monotonicity) not bitwise weights.
- **scoring** (zero shuffle): sigmoid(w·x + b) as a literal-inlined JVM
  expression; the DuckDB twin shares the literal weights and the exact
  double-op order, so SCORES are bit-identical cross-engine even though
  training is approximate-by-nature.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def standardize_stats(df: DataFrame,
                      feature_cols: list[str]) -> list[tuple[float, float]]:
    """[(mean, std)] per feature — one scan, one aggregate row. std floors
    at 1e-12 so constant features become zero-information, not NaN."""
    aggs = []
    for c in feature_cols:
        x = F.col(c).cast("double")
        aggs += [F.avg(x).alias(f"m_{c}"),
                 F.stddev_pop(x).alias(f"s_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [(float(row[f"m_{c}"]),
             max(float(row[f"s_{c}"] or 0.0), 1e-12))
            for c in feature_cols]


def train_logreg(df: DataFrame, feature_cols: list[str],
                 label_col: str = "label", lr: float = 0.5,
                 n_iter: int = 50,
                 ) -> tuple[list[float], float, list[float]]:
    """(weights, bias, per-iteration mean loss) — weights are in RAW
    feature units (standardization folded in), so ``score_expr(weights,
    bias, feature_cols)`` applies directly to the original columns.

    Per iteration: one scan → (dim+1) gradient sums + the loss sum, all
    map-side combinable; driver applies the step. Labels must be 0/1."""
    stats = standardize_stats(df, feature_cols)
    dim = len(feature_cols)
    xs = [((F.col(c).cast("double") - F.lit(m)) / F.lit(s))
          for c, (m, s) in zip(feature_cols, stats)]
    y = F.col(label_col).cast("double")
    w = [0.0] * dim
    b = 0.0
    losses: list[float] = []
    for _ in range(n_iter):
        z: Column = F.lit(b)
        for wi, xi in zip(w, xs):
            z = z + F.lit(wi) * xi
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        aggs = [F.avg(err * xi).alias(f"g{i}") for i, xi in enumerate(xs)]
        aggs.append(F.avg(err).alias("gb"))
        # numerically-stable logistic loss: softplus(z) - y*z
        aggs.append(F.avg(
            F.when(z > 0, z + F.log1p(F.exp(-z)))
            .otherwise(F.log1p(F.exp(z))) - y * z).alias("loss"))
        row = df.agg(*aggs).collect()[0]
        losses.append(float(row["loss"]))
        w = [wi - lr * float(row[f"g{i}"]) for i, wi in enumerate(w)]
        b = b - lr * float(row["gb"])
    # fold the standardization into raw-unit weights:
    # w_std·(x-m)/s + b  ==  Σ (w_i/s_i)·x + (b - Σ w_i·m_i/s_i)
    raw_w = [wi / s for wi, (_m, s) in zip(w, stats)]
    raw_b = b - sum(wi * m / s for wi, (m, s) in zip(w, stats))
    return raw_w, raw_b, losses


def score_expr(weights: list[float], bias: float,
               feature_cols: list[str]) -> Column:
    """sigmoid(w·x + b) as a literal-inlined expression — zero shuffle,
    whole-stage codegen; the term order is the feature_cols order (the
    DuckDB twin sums in the same order for bit parity)."""
    z = " + ".join(
        [f"CAST({bias!r} AS DOUBLE)"]
        + [f"CAST({w!r} AS DOUBLE) * CAST({c} AS DOUBLE)"
           for w, c in zip(weights, feature_cols)])
    return F.expr(f"round(1.0D / (1.0D + exp(-({z}))), 6)")


def score_sql_duck(weights: list[float], bias: float,
                   feature_cols: list[str]) -> str:
    z = " + ".join(
        [f"CAST({bias!r} AS DOUBLE)"]
        + [f"CAST({w!r} AS DOUBLE) * CAST({c} AS DOUBLE)"
           for w, c in zip(weights, feature_cols)])
    return (f"round(CAST(1.0 AS DOUBLE) / "
            f"(CAST(1.0 AS DOUBLE) + exp(-({z}))), 6)")


def quality_classifier_scores(docs: DataFrame, weights: list[float],
                              bias: float, feature_cols: list[str],
                              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, model_quality) over precomputed feature columns."""
    return docs.select(
        F.col(id_col),
        score_expr(weights, bias, feature_cols).alias("model_quality"))


TEXT_FEATURES = ["f_tok", "f_punct", "f_sw_ratio", "f_len"]


def with_text_features(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Attach the heuristic text signals as model features — one scan, all
    expression-level (the same building blocks the rule gates use)."""
    from ..functions import text as tx

    n = tx.token_count(text_col)
    return docs.withColumns({
        "f_tok": n.cast("double"),
        "f_punct": tx.punct_ratio(text_col).cast("double"),
        "f_sw_ratio": F.when(n == 0, F.lit(0.0)).otherwise(
            tx.stopword_count(text_col) / n).cast("double"),
        "f_len": F.length(F.col(text_col)).cast("double"),
    })


def corpus_filter_model(docs: DataFrame, threshold: float = 0.5,
                        n_iter: int = 40, id_col: str = "doc_id",
                        text_col: str = "text",
                        ) -> tuple[DataFrame, list[float], float]:
    """The MODEL-gated cleaning pass (the CCNet self-training shape): use
    the rule-based quality gate as WEAK LABELS, train the logistic model on
    the heuristic features, gate by model score. Returns (kept_docs,
    weights, bias) so the trained gate can be re-applied to new drops
    WITHOUT retraining (the production pattern: train once per corpus
    snapshot, score every subsequent batch with the literal weights —
    scoring is one zero-shuffle scan).

    Why bother when the labels come from rules: the model interpolates —
    documents the hard-threshold rules barely fail but that sit in the
    feature region of good documents score high (and vice versa), which is
    the practical value of quality classifiers trained on weak labels."""
    from ..functions import text as tx

    feat = with_text_features(docs, text_col).withColumn(
        "_weak", (tx.quality_score(text_col) >= 0.7).cast("int"))
    feat = feat.persist()  # training scans it n_iter+2 times; caller
    feat.count()           # releases (registry.release_caches / clearCache)
    w, b, _losses = train_logreg(feat, TEXT_FEATURES, label_col="_weak",
                                 n_iter=n_iter)
    kept = (feat.withColumn(
        "model_quality", score_expr(w, b, TEXT_FEATURES))
        .filter(F.col("model_quality") >= threshold)
        .select(id_col, text_col, "model_quality"))
    return kept, w, b
