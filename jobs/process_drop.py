"""spark-submit entrypoint for INCREMENTAL drop processing: dedup one new
batch of documents against the persisted signature store and advance it.

    history store (id, fp, minhash, fpb — fpb-partitioned parquet;
                   Iceberg bucket-partitioned table at scale)
      → batch signature pass        (one scan: fingerprint + minhash)
      → exact gate                  (fp anti-join; history scan pruned to
                                     the batch's ≤256 fpb buckets)
      → near gate                   (LSH band equi-join, batch side
                                     broadcast; jaccard estimated from
                                     signature position agreement)
      → survivors appended to the store + audit trail of near-dup pairs

See operators/incremental.py for the shape-at-scale contract. Usage
(sandbox; on a cluster package with tools/package.sh + --py-files like
jobs/run_pipeline.py):

    python jobs/process_drop.py --store /tmp/sigstore \
        --batch /root/testdata/sf0.001/documents.parquet \
        [--init-from <docs.parquet>] [--est-threshold 0.5] \
        [--no-append] [--parallelism 8]

``--init-from`` bootstraps the store from an existing corpus when the
store directory does not exist yet (the day-0 path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="signature store dir")
    ap.add_argument("--batch", required=True, help="new drop (parquet of "
                    "documents: doc_id, text)")
    ap.add_argument("--init-from", default=None,
                    help="bootstrap the store from this corpus parquet if "
                         "the store dir does not exist")
    ap.add_argument("--est-threshold", type=float, default=0.5)
    ap.add_argument("--no-append", action="store_true",
                    help="report only; do not advance the store")
    ap.add_argument("--compact", action="store_true",
                    help="after appending, fold streamed batch dirs into "
                         "the base store and bin-pack each fpb partition "
                         "to one file (streaming/incremental.compact_store)")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on sys.path
    # (same fallback contract as jobs/run_pipeline.py).
    try:
        from omnition_opentelemetry_service_spark.operators import incremental
    except ModuleNotFoundError:
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark.operators import incremental
    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="omnition-process-drop",
                      parallelism=args.parallelism)
    try:
        if not os.path.exists(args.store):
            if not args.init_from:
                raise SystemExit(
                    f"store {args.store} does not exist; pass --init-from "
                    f"to bootstrap it from a corpus parquet")
            corpus = spark.read.parquet(args.init_from)
            incremental.write_signature_store(
                incremental.signature_store(corpus), args.store)

        # read via the streaming module's full-history view: base store +
        # committed stream batch dirs (the interleaving contract — a batch
        # drop must see stream-committed survivors or it re-admits their
        # dups) + crashed-compaction recovery
        from omnition_opentelemetry_service_spark.streaming.incremental \
            import read_full_history
        history = read_full_history(spark, args.store)
        batch = spark.read.parquet(args.batch)
        bstore = incremental.signature_store(batch).persist()
        buckets = incremental.batch_bucket_list(bstore)

        t0 = time.perf_counter()
        survivors, near = incremental.incremental_dedup(
            batch, history, est_threshold=args.est_threshold,
            prune_buckets=buckets, batch_store=bstore)
        survivors = survivors.persist()
        n_batch = batch.count()
        n_surv = survivors.count()
        n_near = near.count()
        if not args.no_append:
            incremental.append_signature_store(survivors, args.store)
        compact_stats = None
        if args.compact:
            from omnition_opentelemetry_service_spark.streaming.incremental import (  # noqa: E501
                compact_store,
            )
            spark.catalog.clearCache()
            compact_stats = compact_store(spark, args.store)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "batch_rows": n_batch,
            "survivors": n_surv,
            "dropped_exact_or_near": n_batch - n_surv,
            "near_dup_pairs": n_near,
            "pruned_buckets": len(buckets),
            "appended": not args.no_append,
            "compacted": compact_stats,
            "wall_sec": round(dt, 3),
        }))
    finally:
        spark.catalog.clearCache()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
