"""Incremental (batch-vs-history) deduplication — the op a continuously
ingesting training-data pipeline runs on every new crawl drop: dedup the NEW
batch against the ALREADY-RETAINED corpus without recomputing the corpus.

Not present in the reference (its pipeline is lossless forwarding); this is
the production form of dedup at 10^12-sequence scale, where "re-shingle and
re-LSH the whole corpus per drop" is not an option. The history is a
persisted **signature store** — one row per retained doc with its exact
fingerprint and MinHash signature (the same md5/affine family as
operators/dedup.py, so store rows built today join against batches built
next year):

    (id bigint, fp string, minhash array<bigint>, fpb int)

Shape at scale (history ~10^12 rows, batch ~10^6..10^9):

- **Exact path**: the store is laid out partitioned by ``fpb`` (a 256-way
  bucket of the fingerprint's first hex byte). The batch's distinct bucket
  set (≤256 values, driver-bounded by construction — NOT data-sized) prunes
  the history scan to only the partitions that could match, then a fp
  equi-join flags exact dups. No full history scan per drop.
- **Near path**: both sides explode to LSH band keys; the join is a plain
  equi-join on band_key with the BATCH side broadcast (it is the small
  side by design). History signatures stream through map-side; no shuffle
  of the 10^12-row store, no cross product. Jaccard is estimated from the
  signatures themselves (fraction of agreeing MinHash positions — the
  standard unbiased estimator), so the store never needs to retain raw
  shingle sets.
- **Append**: survivors' store rows union into the store (at scale: an
  Iceberg append of the same partitioning; here parquet-dir append).
- **Bloom sibling** (operators/bloom.py): a fixed-size membership filter
  built once per store epoch answers "definitely new" WITHOUT touching
  the store at all; only the maybe-present fraction reaches the pruned
  anti-join above. Complementary, not competing: the fpb pruning bounds
  what the join scans, the Bloom bounds how often the join runs.

Cross-engine parity: every derivation (fingerprint, shingles, minhash,
band keys, position-agreement estimate) reuses the ONE-definition-per-engine
building blocks in functions/text.py and operators/dedup.py; DuckDB twins
below are verified value-level in tests/test_incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    _norm_grams_sql,
    char_shingles_sql_duck,
    fingerprint,
    fingerprint_sql_duck,
)
from .dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MH_HASHES,
    lsh_band_keys_expr,
    minhash_signature_expr,
    minhash_signature_sql_duck,
)

FP_BUCKETS = 256  # first hex byte of the md5 fingerprint


def hex_bucket_sql(hex_col: str) -> str:
    """THE 256-way bucket derivation (first hex byte → INT) — one
    definition shared by the fpb signature store here and the streaming
    URL store (streaming/web_ingest.URL_UB_SQL) so the partition-pruning
    contract cannot silently diverge. ``hex_col`` must be a hex string
    expression (md5 output)."""
    return f"CAST(conv(substring({hex_col}, 1, 2), 16, 10) AS INT)"


def signature_store(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5) -> DataFrame:
    """(id, fp, minhash, fpb) — one scan over the docs, all JVM-side.

    NULL text gets a per-row sentinel fingerprint (``null:<id>``) so null
    docs never collapse into one dedup group (SQL NULL never equals NULL,
    but a groupBy/window would still pool them into a single partition).
    Its minhash is NULL — null docs take no part in near-dup banding."""
    fp = F.coalesce(fingerprint(text_col),
                    F.concat(F.lit("null:"), F.col(id_col).cast("string")))
    return docs.select(
        F.col(id_col).alias("id"),
        fp.alias("fp"),
        F.when(F.col(text_col).isNotNull(),
               minhash_signature_expr_over(text_col, k)).alias("minhash"),
    ).withColumn("fpb", F.coalesce(
        F.expr(hex_bucket_sql("fp")), F.lit(0)))


def minhash_signature_expr_over(text_col: str, k: int = 5) -> F.Column:
    """Minhash signature straight from a text column: minhash_signature_expr
    takes a SQL fragment for its shingle input, so the shingling inlines ONCE
    into the aggregate (the fold evaluates its input a single time)."""
    return minhash_signature_expr(
        f"array_distinct({_norm_grams_sql(text_col, k)})")


def signature_store_sql_duck(rel: str = "documents", id_col: str = "doc_id",
                             text_col: str = "text", k: int = 5) -> str:
    """DuckDB twin of signature_store (same column names/derivations)."""
    fp = (f"coalesce({fingerprint_sql_duck(text_col)}, "
          f"concat('null:', CAST({id_col} AS VARCHAR)))")
    mh = minhash_signature_sql_duck(char_shingles_sql_duck(text_col, k))
    return (
        f"SELECT {id_col} AS id, {fp} AS fp, "
        f"CASE WHEN {text_col} IS NOT NULL THEN {mh} END AS minhash, "
        f"coalesce(try_cast(concat('0x', substr({fp}, 1, 2)) AS INT), 0) AS fpb "
        f"FROM {rel}"
    )


def write_signature_store(store: DataFrame, path: str) -> None:
    """Persist the store partitioned by fpb so incremental exact lookups
    prune to the batch's buckets. At 10^12 rows this is the Iceberg table
    (partition spec: bucket-by-fp); the parquet-dir layout here exercises
    the identical pruning contract (partition column in the path)."""
    store.write.mode("overwrite").partitionBy("fpb").parquet(path)


def append_signature_store(new_rows: DataFrame, path: str) -> None:
    """Append survivors after a drop is processed (Iceberg append analog)."""
    new_rows.write.mode("append").partitionBy("fpb").parquet(path)


def read_signature_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def batch_exact_survivors(batch_store: DataFrame,
                          history: DataFrame,
                          prune_buckets: list[int] | None = None) -> DataFrame:
    """Batch rows that are FIRST (min id) of their fingerprint within the
    batch AND whose fingerprint is absent from history.

    The within-batch collapse is ``groupBy(fp).agg(min_by(row, id))`` —
    NOT a window: partial aggregation collapses a hot fingerprint (think a
    crawl drop that is 40% one boilerplate page) map-side before the
    exchange, where ``row_number() over (partition by fp)`` would serialize
    the whole hot group onto one task.

    ``prune_buckets``: the batch's distinct fpb set (bounded ≤256 — collect
    it driver-side via ``batch_bucket_list``); when given, the history scan
    filters ``fpb IN (...)`` — a partition-pruning predicate on the store's
    layout, so only matching history partitions are read. The anti-join
    itself is a fp equi-join (shuffle sized by the PRUNED history, not the
    full store)."""
    firsts = (
        batch_store
        .groupBy("fp")
        .agg(F.min_by(F.struct("id", "minhash", "fpb"), F.col("id")).alias("r"))
        .select("fp", "r.id", "r.minhash", "r.fpb")
    )
    hist = history
    if prune_buckets is not None:
        hist = hist.filter(F.col("fpb").isin([int(b) for b in prune_buckets]))
    return firsts.join(hist.select("fp"), on="fp", how="left_anti")


def batch_bucket_list(batch_store: DataFrame) -> list[int]:
    """Distinct fpb values of the batch — ≤ FP_BUCKETS rows by construction
    (a bounded pruning set, not data-sized; safe to bring to the driver)."""
    rows = batch_store.select("fpb").distinct().collect()
    return sorted(int(r["fpb"]) for r in rows)


def sig_agreement_expr(a: str = "mh_b", b: str = "mh_h") -> F.Column:
    """Estimated jaccard: fraction of agreeing minhash positions."""
    return F.round(
        F.expr(
            f"size(filter(zip_with({a}, {b}, (x, y) -> x = y), v -> v)) "
            f"/ CAST({MH_HASHES} AS DOUBLE)"), 6)


def sig_agreement_sql_duck(a: str = "mh_b", b: str = "mh_h") -> str:
    return (
        f"round(len(list_filter(range({MH_HASHES}), "
        f"j -> {a}[j + 1] = {b}[j + 1])) / {MH_HASHES}.0, 6)"
    )


def incremental_near_dups(batch_store: DataFrame, history: DataFrame,
                          est_threshold: float = 0.5) -> DataFrame:
    """(id_b, id_h, est_jaccard) — batch docs with a near-dup in history.

    Both sides explode their LSH band keys; the equi-join broadcasts the
    BATCH side (small by design: one crawl drop vs the whole corpus), so
    the 10^12-row history band table streams map-side — no history shuffle,
    no cross product. Signatures ride along the banded rows (16 longs), so
    the jaccard estimate needs no second join back to the store."""
    bb = (batch_store.filter(F.col("minhash").isNotNull())
          .select(F.col("id").alias("id_b"),
                  F.col("minhash").alias("mh_b"),
                  F.explode(lsh_band_keys_expr("minhash")).alias("band_key")))
    hb = (history.filter(F.col("minhash").isNotNull())
          .select(F.col("id").alias("id_h"),
                  F.col("minhash").alias("mh_h"),
                  F.explode(lsh_band_keys_expr("minhash")).alias("band_key")))
    cand = (hb.join(F.broadcast(bb), "band_key")
            .select("id_b", "id_h", "mh_b", "mh_h")
            .distinct())
    return (cand.withColumn("est_jaccard", sig_agreement_expr())
            .filter(F.col("est_jaccard") >= est_threshold)
            .select("id_b", "id_h", "est_jaccard"))


def incremental_near_dups_sql_duck(batch_sql: str, history_sql: str,
                                   est_threshold: float = 0.5) -> str:
    """DuckDB twin: band keys via the same slice/join derivation."""
    def banded(src: str, side: str) -> str:
        return (
            f"SELECT id AS id_{side}, minhash AS mh_{side}, "
            f"concat(CAST(b AS VARCHAR), ':', "
            f"array_to_string(minhash[b * {LSH_ROWS} + 1 : "
            f"b * {LSH_ROWS} + {LSH_ROWS}], ',')) AS band_key "
            f"FROM ({src}), range({LSH_BANDS}) t(b) "
            f"WHERE minhash IS NOT NULL"
        )
    est = sig_agreement_sql_duck()
    return (
        f"WITH bb AS ({banded(batch_sql, 'b')}), "
        f"hb AS ({banded(history_sql, 'h')}), "
        f"cand AS (SELECT DISTINCT id_b, id_h, mh_b, mh_h "
        f"FROM hb JOIN bb USING (band_key)) "
        f"SELECT id_b, id_h, {est} AS est_jaccard FROM cand "
        f"WHERE {est} >= {est_threshold}"
    )


def incremental_dedup(batch_docs: DataFrame, history: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      est_threshold: float = 0.5,
                      prune_buckets: list[int] | None = None,
                      batch_store: DataFrame | None = None,
                      ) -> tuple[DataFrame, DataFrame]:
    """Full drop-processing step: (survivor_store_rows, near_dup_flags).

    Survivors = batch docs that are (a) first of their fingerprint within
    the batch, (b) exact-absent from history, and (c) not near-dup (by
    signature-estimated jaccard) of any history doc. The first return value
    is store-shaped — append it via append_signature_store to advance the
    history; the second is the audit trail (id_b, id_h, est_jaccard).

    The batch store is persisted: it feeds three consumers (exact path,
    near path, survivor projection) and recomputing md5 shingles three
    times would triple the dominant cost. Caller owns release
    (registry.release_caches / catalog.clearCache), per repo convention.
    ``batch_store``: pass a prebuilt (already persisted) signature store to
    skip the signature pass — callers that derived prune_buckets already
    have one (jobs/process_drop.py)."""
    bstore = (batch_store if batch_store is not None
              else signature_store(batch_docs, id_col, text_col).persist())
    exact_new = batch_exact_survivors(bstore, history, prune_buckets)
    near = incremental_near_dups(exact_new, history, est_threshold)
    survivors = exact_new.join(
        near.select(F.col("id_b").alias("id")).distinct(),
        on="id", how="left_anti")
    return survivors.select("id", "fp", "minhash", "fpb"), near
