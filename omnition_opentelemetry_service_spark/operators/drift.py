"""Corpus distribution drift — compare two corpus snapshots (or two
sources / two pipeline stages) on their hashed n-gram distributions:
the monitoring twin of DSIR's importance model (dsir.py), answering
"did this week's crawl shift away from last week's?" before a bad batch
is mixed into a release.

Reference analog: the collector's obsreport counters detect VOLUME
change per receiver/exporter (reference internal/obsreport usage in
components.go pipelines); a training-data collector also needs CONTENT
change. Same feature space as DSIR (unigrams+bigrams hashed into
``n_buckets`` — ONE grams/bucket definition per engine, imported from
dsir.py), so a drift alarm and a DSIR refit read the same table.

Shape at scale: ONE scan over each corpus (union with a side tag) →
explode n-grams → bucket → groupBy(bucket) with conditional counts —
map-side combinable, exchange carries ≤ n_buckets rows per map task,
result is B-bounded (default 8192 rows). Everything downstream (top-k
drifted buckets, KL/TVD scalars) runs over that bounded table: the
top-k is a TakeOrdered, the scalars are driver math over ≤ B rows.

Cross-engine parity: the per-bucket DRIFT ORDERING uses exact integer
arithmetic only — with Laplace smoothing, p_a - p_b has the common
denominator (T_a+B)(T_b+B), so ranking by the numerator
``(c_a+1)(T_b+B) - (c_b+1)(T_a+B)`` (DECIMAL(38,0), exact in both
engines) is EXACTLY ranking by p_a - p_b with zero float divergence
surface. ln only appears in the driver-side KL helper, which is
verified against an independent DuckDB recomputation (1e-9 tolerance),
not hash parity — the honest contract for a float scalar.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import (DSIR_BUCKETS, _bucket_sql_duck, _bucket_sql_spark,
                   _unibigrams_case_duck, _grams_sql_spark)
from .corpus import _words_sql_duck


def drift_bucket_counts(docs_a: DataFrame, docs_b: DataFrame,
                        n_buckets: int = DSIR_BUCKETS,
                        text_col: str = "text") -> DataFrame:
    """(b, c_a, c_b): n-gram occurrence counts per hashed bucket for the
    two corpora — one scan each, B-bounded result. Buckets unseen in
    BOTH corpora are absent (their smoothed contribution is closed-form,
    see :func:`kl_tvd`)."""
    tagged = (docs_a.select(F.expr(_grams_sql_spark(text_col)).alias("gs"),
                            F.lit(1).alias("is_a"))
              .unionByName(
                  docs_b.select(
                      F.expr(_grams_sql_spark(text_col)).alias("gs"),
                      F.lit(0).alias("is_a"))))
    return (tagged.select(F.explode("gs").alias("g"), "is_a")
            .select(F.expr(_bucket_sql_spark("g", n_buckets)).alias("b"),
                    "is_a")
            .groupBy("b")
            .agg(F.sum("is_a").alias("c_a"),
                 F.sum(1 - F.col("is_a")).alias("c_b")))


def drift_topk(docs_a: DataFrame, docs_b: DataFrame, k: int = 20,
               n_buckets: int = DSIR_BUCKETS,
               text_col: str = "text") -> DataFrame:
    """Top-k drifted buckets: (b, c_a, c_b, drift_num) ranked by
    |smoothed p_a - p_b| via the exact integer numerator (module doc).
    orderBy+limit executes as TakeOrdered over the B-bounded table."""
    counts = drift_bucket_counts(docs_a, docs_b, n_buckets, text_col)
    tot = counts.agg(F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"))
    bb = int(n_buckets)
    d = (f"CAST(c_a + 1 AS DECIMAL(38,0)) * CAST(tb + {bb} AS DECIMAL(38,0))"
         f" - CAST(c_b + 1 AS DECIMAL(38,0)) * CAST(ta + {bb} AS DECIMAL(38,0))")
    return (counts.crossJoin(F.broadcast(tot))  # tot is ONE row
            .withColumn("drift_num", F.expr(d))
            .orderBy(F.desc(F.abs(F.col("drift_num"))), F.asc("b"))
            .limit(int(k))
            .select("b", "c_a", "c_b", "drift_num"))


def _counts_cte_duck(where_a: str, where_b: str, n_buckets: int,
                     rel: str, text_col: str) -> str:
    bucket = _bucket_sql_duck("g", n_buckets)
    return f"""
    words AS (SELECT CASE WHEN ({where_a}) THEN 1 ELSE 0 END AS is_a,
                     {_words_sql_duck(text_col)} AS ws
              FROM {rel} WHERE ({where_a}) OR ({where_b})),
    grams AS (SELECT is_a, {bucket} AS b
              FROM (SELECT is_a, unnest({_unibigrams_case_duck()}) AS g
                    FROM words)),
    counts AS (SELECT b, sum(is_a) AS c_a, sum(1 - is_a) AS c_b
               FROM grams GROUP BY b)"""


def drift_bucket_counts_sql_duck(where_a: str, where_b: str,
                                 n_buckets: int = DSIR_BUCKETS,
                                 rel: str = "documents",
                                 text_col: str = "text") -> str:
    """DuckDB twin over one relation split by two predicates (the
    fixture's two-snapshot stand-in; disjointness is the caller's
    contract, mirrored by passing disjoint DataFrames to the Spark op)."""
    cte = _counts_cte_duck(where_a, where_b, n_buckets, rel, text_col)
    return f"WITH {cte} SELECT b, CAST(c_a AS BIGINT) AS c_a, " \
           f"CAST(c_b AS BIGINT) AS c_b FROM counts"


def drift_topk_sql_duck(where_a: str, where_b: str, k: int = 20,
                        n_buckets: int = DSIR_BUCKETS,
                        rel: str = "documents",
                        text_col: str = "text") -> str:
    cte = _counts_cte_duck(where_a, where_b, n_buckets, rel, text_col)
    bb = int(n_buckets)
    d = (f"CAST(c_a + 1 AS DECIMAL(38,0)) * CAST(tb + {bb} AS DECIMAL(38,0))"
         f" - CAST(c_b + 1 AS DECIMAL(38,0)) * CAST(ta + {bb} AS DECIMAL(38,0))")
    return f"""
    WITH {cte},
    tot AS (SELECT sum(c_a) AS ta, sum(c_b) AS tb FROM counts)
    SELECT b, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           {d} AS drift_num
    FROM counts CROSS JOIN tot
    ORDER BY abs({d}) DESC, b ASC LIMIT {int(k)}"""


def drift_topk_grams(docs_a: DataFrame, docs_b: DataFrame, k: int = 20,
                     text_col: str = "text") -> DataFrame:
    """Interpretable drift: top-k drifted GRAMS (the unigram/bigram
    strings themselves, not hashed buckets) — what an operator actually
    reads in an alarm. Same exact-integer ranking as :func:`drift_topk`
    but grouped on the gram string: the exchange carries distinct grams
    (word-count shape, map-side combinable — large but linear at 100 TB),
    and the top-k is a TakeOrdered, so nothing corpus-sized reaches the
    driver."""
    tagged = (docs_a.select(F.expr(_grams_sql_spark(text_col)).alias("gs"),
                            F.lit(1).alias("is_a"))
              .unionByName(
                  docs_b.select(
                      F.expr(_grams_sql_spark(text_col)).alias("gs"),
                      F.lit(0).alias("is_a"))))
    counts = (tagged.select(F.explode("gs").alias("gram"), "is_a")
              .groupBy("gram")
              .agg(F.sum("is_a").alias("c_a"),
                   F.sum(1 - F.col("is_a")).alias("c_b")))
    tot = counts.agg(F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"))
    # no Laplace here: every output gram was seen, and the ranking only
    # compares rates — d = c_a*tb - c_b*ta over the common denom ta*tb
    d = ("CAST(c_a AS DECIMAL(38,0)) * CAST(tb AS DECIMAL(38,0))"
         " - CAST(c_b AS DECIMAL(38,0)) * CAST(ta AS DECIMAL(38,0))")
    return (counts.crossJoin(F.broadcast(tot))
            .withColumn("drift_num", F.expr(d))
            .orderBy(F.desc(F.abs(F.col("drift_num"))), F.asc("gram"))
            .limit(int(k))
            .select("gram", "c_a", "c_b", "drift_num"))


def drift_topk_grams_sql_duck(where_a: str, where_b: str, k: int = 20,
                              rel: str = "documents",
                              text_col: str = "text") -> str:
    d = ("CAST(c_a AS DECIMAL(38,0)) * CAST(tb AS DECIMAL(38,0))"
         " - CAST(c_b AS DECIMAL(38,0)) * CAST(ta AS DECIMAL(38,0))")
    return f"""
    WITH words AS (SELECT CASE WHEN ({where_a}) THEN 1 ELSE 0 END AS is_a,
                          {_words_sql_duck(text_col)} AS ws
                   FROM {rel} WHERE ({where_a}) OR ({where_b})),
    grams AS (SELECT is_a, g AS gram
              FROM (SELECT is_a, unnest({_unibigrams_case_duck()}) AS g
                    FROM words)),
    counts AS (SELECT gram, sum(is_a) AS c_a, sum(1 - is_a) AS c_b
               FROM grams GROUP BY gram),
    tot AS (SELECT sum(c_a) AS ta, sum(c_b) AS tb FROM counts)
    SELECT gram, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           {d} AS drift_num
    FROM counts CROSS JOIN tot
    ORDER BY abs({d}) DESC, gram ASC LIMIT {int(k)}"""


def kl_tvd(counts_rows, n_buckets: int = DSIR_BUCKETS) -> dict[str, float]:
    """Driver-side scalars over the B-bounded counts table (list of rows
    with .b/.c_a/.c_b or (b, c_a, c_b) tuples): Laplace-smoothed
    KL(a||b), KL(b||a) and total-variation distance, INCLUDING the
    closed-form mass of the (n_buckets - seen) buckets observed in
    neither corpus. Driver cost is O(n_buckets) — model-table math, the
    kmeans/bpe trainer precedent, never corpus-bounded.

    Rows with named fields (Spark Row / dict) are read BY NAME so a
    reprojected column order cannot silently swap bucket ids and counts;
    plain tuples are read positionally as (b, c_a, c_b)."""
    def _cnt(r):
        if hasattr(r, "__fields__") or isinstance(r, dict):
            return int(r["b"]), int(r["c_a"]), int(r["c_b"])
        return int(r[0]), int(r[1]), int(r[2])

    rows = [_cnt(r) for r in counts_rows]
    ta = sum(c for _, c, _ in rows)
    tb = sum(c for _, _, c in rows)
    da, db = float(ta + n_buckets), float(tb + n_buckets)
    kl_ab = kl_ba = tvd = 0.0
    for _, c_a, c_b in rows:
        pa, pb = (c_a + 1) / da, (c_b + 1) / db
        kl_ab += pa * (math.log(pa) - math.log(pb))
        kl_ba += pb * (math.log(pb) - math.log(pa))
        tvd += abs(pa - pb)
    unseen = n_buckets - len(rows)
    if unseen:
        pa0, pb0 = 1 / da, 1 / db
        kl_ab += unseen * pa0 * (math.log(pa0) - math.log(pb0))
        kl_ba += unseen * pb0 * (math.log(pb0) - math.log(pa0))
        tvd += unseen * abs(pa0 - pb0)
    return {"kl_ab": kl_ab, "kl_ba": kl_ba, "tvd": 0.5 * tvd}
