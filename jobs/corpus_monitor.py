"""spark-submit entrypoint for CORPUS MONITORING: the data-layer analog
of the reference collector's obsreport self-observability (its counters
watch VOLUME per receiver/exporter — internal/obsreport usage across
components.go pipelines; a training-data pipeline must also watch
CONTENT). Given two corpus snapshots (previous release vs incoming
drop), one run emits:

- **volume**: per-source doc counts for both snapshots + deltas
  (one combinable agg per snapshot);
- **quality**: quality-gate pass rate and identified-language rate per
  snapshot (same single scan as volume — all row metrics ride one
  select);
- **dup_rate**: exact-duplicate fraction within the incoming snapshot
  (groupBy(fp) with map-side partials — dedup.py's shape);
- **drift**: hashed n-gram KL/TVD between snapshots (operators/drift.py,
  B-bounded bucket table) + the top-k drifted GRAMS (interpretable);
- **alarms**: threshold flags over the above — the bit a scheduler pages
  on.

Shape at scale, per snapshot: ONE scoring pass (quality + lang + fp —
the heavy regex/md5 work) over a persisted narrow projection feeding
both the per-source agg and the distinct-fp agg, plus two raw-text
drift scans (bucket counts and per-gram top-k group on different keys,
so they cannot share an exchange). Drift exchanges are B-bounded /
distinct-gram-bounded; the dup-rate agg keys on fp. Driver state is
O(sources + n_buckets + k): never corpus-bounded.

Usage (sandbox; cluster: package with tools/package.sh + --py-files):

    python jobs/corpus_monitor.py --prev <parquet> --cur <parquet> \
        [--out report.json] [--kl-alarm 0.5] [--dup-alarm 0.2] \
        [--quality-drop-alarm 0.1] [--topk 15] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if __package__ in (None, ""):  # direct `python jobs/corpus_monitor.py`
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def snapshot_stats(docs: DataFrame) -> dict:
    """Per-source volume + quality/lang pass rates + the global
    distinct-fp count. TWO aggregation passes over a persisted SCORED
    projection (countDistinct cannot ride the per-source agg:
    cross-source duplicate fps would double count) — the projection is
    narrow (source + 3 small columns), so persisting it pays the heavy
    regex/md5 text scoring once; released before return (this job is the
    cache's caller per the repo convention). Returns driver-bounded
    values only.

    NULL handling (a crawl with missing metadata must be MONITORED, not
    crash the monitor): a NULL source is counted under the
    ``(null source)`` label (a real string — sorted()/json.dumps chokes
    on mixed None/str keys), and a NULL-text fingerprint gets the
    per-doc ``null:<id>`` sentinel (operators/incremental.signature_store
    convention) so fetch-failed docs are NOT counted as duplicates of
    each other — countDistinct ignores NULLs, which would otherwise
    report n_null - 1 phantom dups and false-page the dup alarm."""
    from omnition_opentelemetry_service_spark.functions import text as tx

    scored = docs.select(
        F.coalesce(F.col("source").cast("string"),
                   F.lit("(null source)")).alias("source"),
        # coalesce(0): NULL text scores NULL quality and NULL lang (the
        # quarantine convention) — a fetch-failed doc counts as neither
        # quality-passing nor language-identified, and an all-NULL source
        # group must sum to 0, not NULL (int(None) would kill the monitor)
        F.coalesce((tx.quality_score("text") >= 0.5).cast("int"),
                   F.lit(0)).alias("q_ok"),
        F.coalesce((tx.lang_id("text") != "und").cast("int"),
                   F.lit(0)).alias("lang_ok"),
        F.coalesce(
            tx.fingerprint("text"),
            F.concat(F.lit("null:"), F.col("doc_id").cast("string")))
        .alias("fp"),
    ).persist()
    per_source = (scored.groupBy("source")
                  .agg(F.count(F.lit(1)).alias("docs"),
                       F.sum("q_ok").alias("q_ok"),
                       F.sum("lang_ok").alias("lang_ok"))
                  .collect())  # bounded: one row per source
    n = sum(r.docs for r in per_source)
    dup = 0
    if n:
        # dups = docs - distinct fps; map-side-combinable distinct agg
        distinct_fp = scored.agg(
            F.countDistinct("fp").alias("d")).collect()[0].d
        dup = n - distinct_fp
    scored.unpersist()
    return {
        "docs": n,
        "by_source": {r.source: int(r.docs) for r in per_source},
        "quality_rate": (sum(r.q_ok for r in per_source) / n) if n else None,
        "lang_rate": (sum(r.lang_ok for r in per_source) / n) if n else None,
        "dup_rate": (dup / n) if n else None,
    }


def monitor_corpus(docs_prev: DataFrame, docs_cur: DataFrame,
                   n_buckets: int = 2048, topk: int = 15,
                   kl_alarm: float = 0.5, dup_alarm: float = 0.2,
                   quality_drop_alarm: float = 0.1) -> dict:
    """The composed report. All inputs are DataFrames of at least
    (doc_id, text, source); every number in the result is
    driver-bounded (sources, buckets, top-k)."""
    from omnition_opentelemetry_service_spark.operators import drift

    prev = snapshot_stats(docs_prev)
    cur = snapshot_stats(docs_cur)
    counts = drift.drift_bucket_counts(
        docs_prev, docs_cur, n_buckets).collect()  # B-bounded
    scalars = drift.kl_tvd(counts, n_buckets)
    top = [
        {"gram": r.gram, "c_prev": int(r.c_a), "c_cur": int(r.c_b)}
        for r in drift.drift_topk_grams(docs_prev, docs_cur,
                                        k=topk).collect()
    ]
    q_prev, q_cur = prev["quality_rate"], cur["quality_rate"]
    alarms = {
        "drift": scalars["kl_ab"] > kl_alarm or scalars["kl_ba"] > kl_alarm,
        "dup": (cur["dup_rate"] or 0.0) > dup_alarm,
        "quality_drop": (
            q_prev is not None and q_cur is not None
            and (q_prev - q_cur) > quality_drop_alarm),
        "new_source": sorted(set(cur["by_source"]) - set(prev["by_source"])),
        "lost_source": sorted(set(prev["by_source"]) - set(cur["by_source"])),
    }
    return {"prev": prev, "cur": cur,
            "drift": {**{k: round(v, 6) for k, v in scalars.items()},
                      "top_grams": top},
            "alarms": alarms}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True)
    ap.add_argument("--cur", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-buckets", type=int, default=2048)
    ap.add_argument("--topk", type=int, default=15)
    ap.add_argument("--kl-alarm", type=float, default=0.5)
    ap.add_argument("--dup-alarm", type=float, default=0.2)
    ap.add_argument("--quality-drop-alarm", type=float, default=0.1)
    ap.add_argument("--parallelism", type=int, default=8)
    args = ap.parse_args()

    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="corpus_monitor",
                      parallelism=args.parallelism)
    report = monitor_corpus(
        spark.read.parquet(args.prev), spark.read.parquet(args.cur),
        n_buckets=args.n_buckets, topk=args.topk,
        kl_alarm=args.kl_alarm, dup_alarm=args.dup_alarm,
        quality_drop_alarm=args.quality_drop_alarm)
    out = json.dumps(report, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    print(out)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
