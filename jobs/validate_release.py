"""Release VALIDATION — the consumer-side audit a trainer runs before
committing a 10^4-GPU run to a dataset: re-derive every deterministic
column of a release from first principles and re-count the manifest.

All release columns are PURE FUNCTIONS of row identity (split/shard/
shuffle_ord are salted hashes; pack_id is the cumsum bin of the ordered
group) — so an auditor can recompute each one independently and compare,
with NO trust in the producer beyond the raw data rows themselves. That
is the whole design point of deterministic hash identity (mixture.py):
verification is a projection, not a replay of the pipeline.

Checks (rows emit):
  1. _MANIFEST.json per-split row + token totals match a recount.
  2. `split` equals mixture.split_expr(doc_id) (default weights).
  3. `pack_id` equals a recompute of packing.with_pack_id over
     (pack_key, seq_no) at the manifest's budget.
  4. (`shuffle_ord`, `shard`) equal the mix_hash_wide recompute of the
     pack identity (pack_key # pack_id).
  5. Pack atomicity: no (pack_key, pack_id) spans two shards or splits.

Checks (packs emit, additionally replacing 3):
  3p. Array invariants per pack: padded/positions/mask share length
      max(budget, pack_len); n_pad consistent; starts/lens a contiguous
      partition summing to pack_len; n_docs matches; loss_mask is
      1^pack_len 0^n_pad.

Output: ONE JSON line {"ok": bool, "emit": ..., "checks": {...}};
exit code 1 on any violation. Scale shape: every check is a projection
plus at most one bounded aggregate (per-split counts, per-pack window for
the recompute) — the audit costs about one scan of the release.

Usage:
    python jobs/validate_release.py --dir <release> [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json
import sys


def _check_counts(spark, df, manifest, tok_col):
    from pyspark.sql import functions as F

    got = {r["split"]: [r["rows"], r["toks"]] for r in
           df.groupBy("split").agg(
               F.count(F.lit(1)).alias("rows"),
               F.sum(tok_col).alias("toks")).collect()}
    want = {k: list(v) for k, v in manifest["per_split"].items()}
    return {"ok": got == want, "got": got, "want": want}


def _bad(df, cond) -> dict:
    n = df.filter(cond).count()
    return {"ok": n == 0, "bad_rows": n}


def validate(spark, out_dir: str) -> dict:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from jobs.make_release import read_manifest
    from omnition_opentelemetry_service_spark.operators import packing
    from omnition_opentelemetry_service_spark.operators.mixture import (
        mix_hash_wide, split_expr)

    manifest = read_manifest(out_dir)
    emit = manifest.get("emit", "rows")
    budget = int(manifest["budget"])
    df = spark.read.parquet(out_dir)
    checks: dict[str, dict] = {}

    tok_col = "pack_len" if emit == "packs" else "n_tok"
    checks["manifest_totals"] = _check_counts(spark, df, manifest, tok_col)

    # pack identity: the shard/shuffle_ord recompute key
    pid = F.concat_ws("#", "pack_key", F.col("pack_id").cast("string"))
    # mix_hash_wide takes a column NAME; materialize pid first
    d = df.withColumn("_pid", pid)
    ord_expr = mix_hash_wide("_pid", "shuffle-s0")
    checks["shuffle_identity"] = _bad(
        d, (F.col("shuffle_ord") != ord_expr) |
           (F.col("shard") != F.pmod(ord_expr, F.lit(manifest["n_shards"]))))

    checks["pack_atomic"] = {
        "ok": (d.groupBy("_pid")
               .agg(F.countDistinct("shard").alias("ns"),
                    F.countDistinct("split").alias("np"))
               .filter("ns > 1 OR np > 1").count()) == 0}

    if emit == "packs":
        checks["split_label"] = _bad(
            df, ~F.col("pack_key").startswith(
                F.concat(F.col("split"), F.lit("|"))))
        L = F.greatest(F.lit(budget), F.col("pack_len"))
        # CASE keeps the index lambda off 1-doc packs (sequence(1, 0)
        # DESCENDS — [1, 0] — and index 1 faults a 1-element array)
        starts_ok = F.expr(
            "starts[0] = 0 AND (CASE WHEN size(starts) < 2 THEN true ELSE "
            "size(filter(sequence(1, size(starts) - 1), "
            "i -> starts[i] != starts[i-1] + lens[i-1])) = 0 END)")
        mask_ok = F.expr(
            f"loss_mask = concat(array_repeat(1, pack_len), "
            f"array_repeat(0, n_pad))")
        checks["pack_arrays"] = _bad(df, ~(
            (F.size("padded_tokens") == L)
            & (F.size("position_ids") == L)
            & (F.size("loss_mask") == L)
            & (F.col("n_pad") == L - F.col("pack_len"))
            & (F.col("n_docs") == F.size("doc_ids"))
            & (F.size("starts") == F.col("n_docs"))
            & (F.size("lens") == F.col("n_docs"))
            & F.expr("aggregate(lens, 0, (a, x) -> a + x) = pack_len")
            & ((F.col("n_docs") == 0) | starts_ok)
            & mask_ok))
    else:
        checks["split_label"] = _bad(
            df, F.col("split") != split_expr("doc_id"))
        w = (W.partitionBy("pack_key").orderBy("seq_no")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        offset = F.sum("n_tok").over(w) - F.col("n_tok")
        recomputed = F.floor(offset / F.lit(budget)).cast("long")
        checks["pack_id_recompute"] = _bad(
            df.withColumn("_rp", recomputed),  # window can't live in WHERE
            F.col("pack_id") != F.col("_rp"))

    ok = all(c["ok"] for c in checks.values())
    return {"ok": ok, "emit": emit, "dir": out_dir, "checks": checks}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    try:
        from omnition_opentelemetry_service_spark.session import get_spark
    except ModuleNotFoundError:
        import os

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="omnition-validate-release",
                      parallelism=args.parallelism)
    try:
        report = validate(spark, args.dir)
        print(json.dumps(report, sort_keys=True))
        sys.exit(0 if report["ok"] else 1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
