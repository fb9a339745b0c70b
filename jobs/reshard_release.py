"""Elastic RESHARD of an existing release — change the shard count (the
trainer world size) without re-running the pipeline and WITHOUT changing
the data order.

Why this is a projection, not a replay: make_release materializes the
global shuffle as a 48-bit permutation key (`shuffle_ord` =
mix_hash_wide of the pack identity) and derives `shard` as
pmod(shuffle_ord, n_shards) (mixture.shuffle_shards). The permutation is
therefore INDEPENDENT of the shard count — resharding only re-buckets
the same total order, so:

- **order invariance**: reading any reshard's shards ordered by
  (shuffle_ord, pack_key, pack_id[, seq_no]) yields the IDENTICAL
  global sequence as the original — a run trained at 64 workers resumes
  at 256 with the same data order (pinned in tests/test_reshard.py).
- **pack atomicity survives**: shuffle_ord is constant within a pack
  (it hashes the pack identity), so every pack still lands whole in
  exactly one new shard — no pack is ever split by a world-size change.

Scale shape: ONE exchange on (split, shard_new) + in-partition sort —
the same single-exchange write as the original release
(make_release.write_release); no re-hash of row identity, no re-pack,
no join. The manifest is rewritten with the new shard count (plus a
`resharded_from` provenance field) and revalidates under
jobs/validate_release.py unchanged.

Usage:
    python jobs/reshard_release.py --in <release> --out <dir> --shards N
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def reshard_release(spark, in_dir: str, out_dir: str, n_shards: int) -> dict:
    from pyspark.sql import functions as F

    from jobs.make_release import (read_manifest, write_manifest,
                                   write_packs_release, write_release)

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    manifest = read_manifest(in_dir)
    emit = manifest.get("emit", "rows")
    df = (spark.read.parquet(in_dir)
          # `shard` comes back as an inferred partition column; replace it
          # with the new bucketing of the SAME permutation key
          .withColumn("shard", F.pmod("shuffle_ord", F.lit(n_shards))))
    if emit == "packs":
        write_packs_release(df, out_dir, n_shards)
    else:
        write_release(df, out_dir, n_shards)
    meta = dict(manifest)
    meta["resharded_from"] = manifest["n_shards"]
    # full provenance chain: chained reshards append, so the canonical
    # original's shard count stays recoverable from any descendant
    meta["reshard_history"] = (manifest.get("reshard_history", [])
                               + [manifest["n_shards"]])
    meta["n_shards"] = n_shards
    write_manifest(out_dir, meta)
    return meta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, required=True)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    try:
        from omnition_opentelemetry_service_spark.session import get_spark
    except ModuleNotFoundError:
        import os

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="omnition-reshard-release",
                      parallelism=args.parallelism)
    t0 = time.perf_counter()
    try:
        meta = reshard_release(spark, args.in_dir, args.out, args.shards)
        print(json.dumps({
            "out": args.out,
            "n_shards": meta["n_shards"],
            "resharded_from": meta["resharded_from"],
            "wall_s": round(time.perf_counter() - t0, 2),
        }, sort_keys=True))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
