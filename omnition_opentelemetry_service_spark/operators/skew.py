"""Key-skew diagnostics — the measurement that justifies (or retires) every
salting/broadcast decision in the pipeline. The north-star input has hot
`source` keys handled by explicit salted two-phase aggregation
(batcher.salted_counts); this module is the tool an operator runs BEFORE
choosing that plan: exact per-key count distribution + the heavy keys.

Two operators:

- ``key_skew_report``  — ONE summary row: n_rows, n_keys, max key count,
  p50/p90/p99 of per-key counts (exact interpolated percentile — the
  Spark percentile ≡ DuckDB quantile_cont pair, PARITY trap 22), and
  skew_ratio = max/mean (1.0 = perfectly uniform; ≥ #tasks means the hot
  key serializes a stage without salting).
- ``heavy_keys``       — the top-k keys by count with their corpus share
  (deterministic order: count desc, key asc; NULL keys are counted under
  the '<null>' label so trap-13 NULL ordering has no surface).

Shape at scale: one map-side-combinable (key → count) exchange bounded by
key cardinality, then a 1-row aggregate (report) or a TakeOrdered top-k +
one broadcast of the 1-row total (heavy_keys' share column). Nothing is
corpus-bounded on the driver; no window over the corpus.

Reference: the collector's per-tag receiver counters
(observability/observability.go:79-105) inventory traffic by tag; this
extends that inventory to the distribution statistics Spark plans need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_KEY_LABEL = "<null>"


def _key_counts(df: DataFrame, key: str) -> DataFrame:
    k = F.coalesce(F.col(key).cast("string"), F.lit(NULL_KEY_LABEL))
    return (df.select(k.alias("key"))
            .groupBy("key").agg(F.count(F.lit(1)).alias("c")))


def key_skew_report(df: DataFrame, key: str = "source") -> DataFrame:
    """One row: (n_rows, n_keys, max_count, p50, p90, p99, skew_ratio)."""
    counts = _key_counts(df, key)
    pct = F.expr("percentile(c, array(0.5, 0.9, 0.99))")
    return (counts.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_count"),
        pct.alias("_p"))
        .select(
            "n_rows", "n_keys", "max_count",
            F.round(F.col("_p")[0], 6).alias("p50"),
            F.round(F.col("_p")[1], 6).alias("p90"),
            F.round(F.col("_p")[2], 6).alias("p99"),
            # max/mean with the double cast FIRST (max*n_keys as int64
            # could overflow at 10^12 rows x 10^6 keys)
            F.round(F.col("max_count").cast("double") * F.col("n_keys")
                    / F.col("n_rows"), 6).alias("skew_ratio")))


def key_skew_report_sql_duck(table: str, key: str = "source",
                             prelude: str = "") -> str:
    """``prelude``: an already-open WITH clause (e.g. the registry's
    fixture CTEs) — the twin then continues it with a comma instead of
    opening its own."""
    head = f"{prelude},\n" if prelude else "WITH "
    return f"""
    {head} counts AS (
      SELECT coalesce(CAST({key} AS VARCHAR), '{NULL_KEY_LABEL}') AS key,
             count(*) AS c
      FROM {table} GROUP BY 1)
    SELECT CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_count,
           round(quantile_cont(c, 0.5), 6) AS p50,
           round(quantile_cont(c, 0.9), 6) AS p90,
           round(quantile_cont(c, 0.99), 6) AS p99,
           round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6)
             AS skew_ratio
    FROM counts"""


def heavy_keys(df: DataFrame, key: str = "source",
               topk: int = 5) -> DataFrame:
    """(key, n_rows, share) for the top-k keys — count desc, key asc."""
    counts = _key_counts(df, key)
    total = counts.agg(F.sum("c").cast("bigint").alias("_tot"))
    return (counts.crossJoin(F.broadcast(total))
            .select("key", F.col("c").cast("bigint").alias("n_rows"),
                    F.round(F.col("c").cast("double") / F.col("_tot"), 6)
                    .alias("share"))
            .orderBy(F.desc("n_rows"), F.asc("key"))
            .limit(int(topk)))


def heavy_keys_sql_duck(table: str, key: str = "source",
                        topk: int = 5, prelude: str = "") -> str:
    head = f"{prelude},\n" if prelude else "WITH "
    return f"""
    {head} counts AS (
      SELECT coalesce(CAST({key} AS VARCHAR), '{NULL_KEY_LABEL}') AS key,
             count(*) AS c
      FROM {table} GROUP BY 1)
    SELECT key, CAST(c AS BIGINT) AS n_rows,
           round(CAST(c AS DOUBLE) / (SELECT sum(c) FROM counts), 6)
             AS share
    FROM counts
    ORDER BY n_rows DESC, key ASC
    LIMIT {int(topk)}"""
