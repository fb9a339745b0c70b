"""Sketch aggregations: error-bound contracts against exact twins — the
oracle pattern for intentionally-approximate operators (a value-hash gate
would be meaningless, so the CONTRACT is the bound, not the value)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.operators import sketches as sk

N = 4000


def _seqs(spark):
    return fx.sequences(spark, N)


def test_approx_distinct_within_rsd(spark):
    seqs = _seqs(spark)
    approx = {r.source: r.approx_distinct
              for r in sk.distinct_tokens_approx(seqs, rsd=0.05).collect()}
    exact = {r.source: r.exact_distinct
             for r in sk.distinct_tokens_exact(seqs).collect()}
    assert approx.keys() == exact.keys()
    for src, ex in exact.items():
        assert abs(approx[src] - ex) <= max(0.15 * ex, 2), (src, approx[src], ex)


def test_hll_rollup_matches_direct_global_estimate(spark):
    """Re-aggregation contract: unioning per-source HLL sketches gives the
    SAME estimate as sketching the global token stream directly — the
    sketch rollup loses nothing vs a full rescan."""
    seqs = _seqs(spark)
    [rollup] = sk.distinct_tokens_hll_rollup(seqs).collect()
    [direct] = (seqs.select(F.explode("tokens").alias("tok"))
                .agg(F.round(F.hll_sketch_estimate(F.hll_sketch_agg("tok")))
                     .cast("long").alias("g")).collect())
    assert rollup.global_distinct == direct.g
    [exact] = (seqs.select(F.explode("tokens").alias("tok"))
               .agg(F.countDistinct("tok").alias("d")).collect())
    assert abs(rollup.global_distinct - exact.d) <= 0.05 * exact.d


def test_percentile_approx_rank_error_bounded(spark):
    """GK-sketch quartiles: each approximate quartile must sit within the
    exact value's neighborhood — checked by rank, the sketch's actual
    guarantee (rank error ≤ group_size/accuracy)."""
    seqs = _seqs(spark)
    approx = {r.source: r.quartiles_approx for r in
              sk.token_length_quantiles_approx(seqs, accuracy=10_000).collect()}
    rows = seqs.select("source", "n_tok").collect()
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_tok)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        for p, got in zip((0.25, 0.5, 0.75), approx[src]):
            # value must correspond to a rank within ±(n/accuracy + 1)
            lo = vals[max(0, int(p * n) - n // 10_000 - 1)]
            hi = vals[min(n - 1, int(p * n) + n // 10_000 + 1)]
            assert lo <= got <= hi, (src, p, got, lo, hi)


def test_freq_items_no_false_negatives(spark):
    """Every token whose true positional frequency ≥ support must appear in
    the candidate set (the freqItems guarantee); candidates then verify
    exactly in one pass over the tiny set. The fixture vocab is too flat to
    produce 2%-frequent tokens (checked), so heavy hitters are PLANTED: a
    skewed stream where tokens 7 and 13 dominate."""
    rows = []
    for i in range(2000):
        toks = [7, 13, i % 997 + 100] if i % 3 else [7, i % 997 + 100]
        rows.append((i, toks))
    seqs = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    support = 0.02
    cands = set(sk.frequent_tokens(seqs, support))
    counts = (seqs.select(F.explode("tokens").alias("tok"))
              .groupBy("tok").count().collect())
    total = sum(r["count"] for r in counts)
    truly_frequent = {r.tok for r in counts if r["count"] >= support * total}
    assert {7, 13} <= truly_frequent  # non-vacuous by construction
    assert truly_frequent <= cands, truly_frequent - cands


def test_count_min_sketch_bounds(spark):
    """CMS: estimate ≥ true always; ≤ true + eps·N for the probed tokens
    (confidence 0.99 at eps=0.001 — deterministic seed, so this is a stable
    property of the fixture, not a flake)."""
    seqs = _seqs(spark)
    sketch = sk.token_count_min_sketch(seqs, eps=0.001, confidence=0.99)
    counts = {r.tok: r["count"] for r in
              (seqs.select(F.explode("tokens").alias("tok"))
               .groupBy("tok").count().collect())}
    total = sum(counts.values())
    probe = sorted(counts)[:50] + sorted(counts)[-5:]
    for tok in probe:
        est = sk.cms_estimate(spark, sketch, int(tok))
        assert est >= counts[tok], (tok, est, counts[tok])
        assert est <= counts[tok] + 0.001 * total, (tok, est, counts[tok])


def test_sketch_aggregates_are_partial(spark):
    """Plan contract: the sketch aggregations partial-aggregate map-side
    (HashAggregate appears in partial + final modes around one exchange) —
    the property that makes sketch state, not data, the shuffle payload."""
    plan = sk.distinct_tokens_approx(_seqs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan
