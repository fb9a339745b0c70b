"""Continuous CRAWL ingestion: the web-ingest front half replayed per
micro-batch against a persisted URL-identity store — the streaming twin
of jobs/web_ingest.py exactly as streaming/incremental.py is the
streaming twin of the batch signature-store dedup (same commit
discipline, same self-exclusion rule, same partition-pruned history
reads; reference analog: the receiver's continuous gRPC stream vs the
unary batch export, SURVEY §3 EP1/EP2).

Per micro-batch (foreachBatch):

1. canon/host annotate + blocklist (operators/web.annotate_urls);
2. in-batch canonical-URL collapse (web.url_collapse — ONE min_by
   aggregate);
3. batch-vs-history URL dedup: anti-join the batch's canon urls against
   the store, PRUNED to the batch's ub buckets (ub = first md5 hex byte
   of canon_url, 0..255 — the fpb discipline from
   operators/incremental.py: the 10^12-row store is read ≤256
   partitions at a time, PartitionFilters in-plan). NULL-canon rows
   pass the anti-join by construction (NULL never equals);
4. HTML→text + BATCH-local per-host line dedup (the CCNet shard-local
   reading of boilerplate — a batch is the shard) + per-doc gates +
   in-batch exact content collapse (cross-batch CONTENT dedup is
   streaming/incremental.run_dedup_stream's job downstream, one store
   per identity);
5. idempotent commits: survivors → out_dir/batch_id=N (overwrite), the
   batch's NEW canon urls → store/batch_id=N (overwrite). URL identities
   are recorded for every post-blocklist new URL — including docs later
   gated out: a fetched-and-rejected page is still a CONSUMED identity,
   so a re-crawl of the same URL doesn't re-enter the pipeline.

Crash semantics (the streaming/incremental contract, pinned there and
re-tested here): history reads EXCLUDE the batch's own committed dir
(a commit-then-crash re-delivery would otherwise dedup the batch against
its own output to zero and overwrite the commit with an empty dir), and
re-delivered batches overwrite — never append — their own dirs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import web as wb
from ..operators.incremental import hex_bucket_sql
from ..operators.widen import materialize

# ub = first md5 hex byte of canon_url — the SAME 256-way derivation as
# the signature store's fpb (one definition: incremental.hex_bucket_sql)
URL_UB_SQL = hex_bucket_sql("md5(canon_url)")


def url_store_rows(collapsed: DataFrame) -> DataFrame:
    """(canon_url, ub) for rows that HAVE a URL identity — NULL-canon
    docs are never stored (nothing to dedup against; they always pass)."""
    return (collapsed.filter(F.col("canon_url").isNotNull())
            .select("canon_url", F.expr(URL_UB_SQL).alias("ub")))


def read_url_history(spark: SparkSession, store_path: str,
                     before_batch_id: int | None = None) -> DataFrame:
    """Union of committed batch url dirs, batch_id-pruned (partition
    column in the path — the read_full_history shape)."""
    if os.path.isdir(store_path) and any(
            n.startswith("batch_id=") for n in os.listdir(store_path)):
        hist = spark.read.option("basePath", store_path).parquet(
            os.path.join(store_path, "batch_id=*"))
        if before_batch_id is not None:
            hist = hist.filter(F.col("batch_id") < int(before_batch_id))
        return hist.select("canon_url", "ub")
    return spark.createDataFrame([], "canon_url string, ub int")


def process_web_batch(batch_df: DataFrame, batch_id: int, store_path: str,
                      out_dir: str, blocked_hosts: list[str] | None = None,
                      line_min_count: int = 2, quality_min: float = 0.5,
                      id_col: str = "doc_id") -> None:
    """One micro-batch of the stream — importable so tests can replay a
    batch id directly (the redelivery-idempotence probe)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession

    annotated, drop_pred = wb.annotate_urls(batch_df, blocked_hosts, id_col)
    collapsed = wb.url_collapse(annotated.filter(~drop_pred), id_col)
    # two consumers below (bucket list + anti-join + store append) and
    # everything upstream is the regex-heavy canon pass — materialize once
    collapsed = materialize(collapsed)

    keys = url_store_rows(collapsed)
    buckets = [r.ub for r in keys.select("ub").distinct().collect()]
    hist = read_url_history(spark, store_path, before_batch_id=batch_id)
    if buckets:
        hist = hist.filter(F.col("ub").isin(buckets))  # ≤256, pruned scan
    # `new` has THREE consumers (the strip stage below, new_keys.isEmpty,
    # new_keys.write) and its lineage holds the pruned history scan + the
    # anti-join — materialize once so the dominant per-batch I/O runs once
    new = materialize(collapsed.join(hist.select("canon_url"),
                                     "canon_url", "left_anti"))

    stripped, empty_pred = wb.strip_stage(new, id_col)
    stripped = materialize(stripped.filter(~empty_pred))
    cleaned = wb.line_dedup_stage(stripped, line_min_count, id_col)
    gated = cleaned.filter(~wb.doc_gate_pred(quality_min))
    out = wb.exact_collapse(gated, id_col)

    # same zero-part-file glob-poisoning guard as the store commit below:
    # a batch whose docs are all gated/deduped away records nothing, which
    # is already the correct idempotent state
    if not out.isEmpty():
        (out.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch_id={batch_id}")))
    new_keys = url_store_rows(new)
    # skip the store commit when the batch carries NO new url identities
    # (all NULL-url or all seen): a parquet dir with zero part files
    # poisons the basePath-glob history read (schema inference fails when
    # every batch dir is empty), and recording nothing is already the
    # correct idempotent state for such a batch
    if not new_keys.isEmpty():
        (new_keys.write.mode("overwrite").partitionBy("ub")
         .parquet(os.path.join(store_path, f"batch_id={batch_id}")))
    collapsed.unpersist()
    new.unpersist()
    stripped.unpersist()


def recover_fold(root: str) -> None:
    """Finish or roll back a crashed _fold_batch_dirs: if the trash
    sibling exists, either promote the fully-written staging dir to
    batch_id=-1 (crash after the old dirs moved to trash) or restore the
    trash (staging missing — cannot happen in-order, but restoring is the
    safe default), then clear the siblings."""
    import shutil

    trash = root.rstrip("/") + ".fold.trash"
    staging = root.rstrip("/") + ".fold.staging"
    if not os.path.isdir(trash):
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)  # pre-swap leftover
        return
    merged = os.path.join(root, "batch_id=-1")
    if not os.path.isdir(merged):
        if os.path.isdir(staging):
            os.rename(staging, merged)
        else:
            for n in os.listdir(trash):
                os.rename(os.path.join(trash, n), os.path.join(root, n))
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)


def _fold_batch_dirs(spark: SparkSession, root: str,
                     partition_by: tuple[str, ...] = (),
                     dedup_cols: tuple[str, ...] = ()) -> int:
    """Fold every root/batch_id=* dir into ONE ``batch_id=-1`` dir — the
    fresh-checkpoint generation guard: a new checkpoint restarts batch ids
    at 0 and would OVERWRITE prior-generation committed dirs (losing
    consumed identities / outputs forever). -1 sorts below every real id,
    so the `batch_id < N` self-exclusion keeps the folded history visible
    to every new batch. Crash contract mirrors compact_store: staging is
    fully written before any rename; old dirs move to a trash sibling;
    recover_fold (called first) finishes or rolls back a crashed run."""
    import shutil

    recover_fold(root)
    if not os.path.isdir(root):
        return 0
    names = [n for n in os.listdir(root) if n.startswith("batch_id=")]
    if not names or names == ["batch_id=-1"]:
        return 0
    df = (spark.read.option("basePath", root)
          .parquet(os.path.join(root, "batch_id=*")).drop("batch_id"))
    if dedup_cols:
        df = df.dropDuplicates(list(dedup_cols))
    staging = root.rstrip("/") + ".fold.staging"
    trash = root.rstrip("/") + ".fold.trash"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    os.makedirs(trash, exist_ok=True)
    for n in names:
        os.rename(os.path.join(root, n), os.path.join(trash, n))
    os.rename(staging, os.path.join(root, "batch_id=-1"))
    shutil.rmtree(trash, ignore_errors=True)
    spark.catalog.refreshByPath(root)
    return len(names)


def run_web_ingest_stream(stream_docs: DataFrame, store_path: str,
                          checkpoint_dir: str, out_dir: str,
                          blocked_hosts: list[str] | None = None,
                          line_min_count: int = 2,
                          quality_min: float = 0.5,
                          id_col: str = "doc_id"):
    """Start the continuous web-ingest query; returns the StreamingQuery.
    availableNow so a drop-style replay drains and stops (the
    run_dedup_stream trigger discipline).

    Fresh-checkpoint guard: when checkpoint_dir carries no commits but the
    URL store / out dir already hold batch_id dirs (a PRIOR stream
    generation), those dirs are folded into batch_id=-1 first — batch ids
    restarting at 0 would otherwise overwrite prior commits: consumed URL
    identities would vanish (their duplicates re-admitted forever) and
    delivered output docs would be destroyed. The folded URL history
    stays visible to every new batch (-1 < N for all N ≥ 0)."""
    spark = stream_docs.sparkSession
    if not os.path.exists(os.path.join(checkpoint_dir, "commits")):
        _fold_batch_dirs(spark, store_path, partition_by=("ub",),
                         dedup_cols=("canon_url",))
        _fold_batch_dirs(spark, out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_web_batch(batch_df, batch_id, store_path, out_dir,
                          blocked_hosts=blocked_hosts,
                          line_min_count=line_min_count,
                          quality_min=quality_min, id_col=id_col)

    return (stream_docs.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(process)
            .trigger(availableNow=True)
            .start())
