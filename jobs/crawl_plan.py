"""spark-submit entrypoint for CRAWL PLAN: turn the LAST crawl snapshot
into the NEXT politeness-legal, budget-cut, worker-assigned fetch cycle —
the scheduler back half that feeds jobs/web_ingest.py's content front
half. Reference analog: the collector's receiver→queue→worker dispatch
loop (exporter queue NumWorkers/QueueSize, exporter/kinesis/config.go:50)
re-expressed as one declarative plan over the whole frontier.

    pages (doc_id, url, html) + robots (host, robots_txt)
      → link graph            linkgraph.host_edges → host_rank
                              (integer-exact PageRank)
      → cycle budget          linkgraph.allocate_budget(ranks, --budget)
                              (exact Hamilton apportionment)
      → discovery             linkgraph.extract_links → sitemap-entry
                              shape → frontier.discover_from_sitemaps
                              (canon-dedup + anti-join vs seen: the
                              snapshot's own urls ∪ optional --seen store)
      → politeness schedule   frontier.frontier_schedule (robots gate,
                              canonical collapse, crawl-delay throttle)
      → budget cut            linkgraph.budgeted_frontier
      → worker assignment     retry.assign_workers (host-sticky md5 —
                              politeness survives the pool)
      → ONE write partitioned by worker + a JSON report

url_id for discovered candidates is the md5-prefix BIGINT of the
canonical url (the operators/dedup.py hash pattern): deterministic
across runs/engines with no global counter shuffle. The id is the 48-bit
prefix: id collisions are identity collisions (ordering ties, oracle
cardinality), so the wide pair applies (dedup._XH12_*).

Shape at scale: everything upstream documents its own shape (see each
operator's docstring); this job adds NO exchange of its own — the final
write is partitioned by the (bounded-cardinality) worker column, and the
report's per-worker load is retry.worker_load's num_workers-row
aggregate.

Usage (sandbox; cluster: package with tools/package.sh + --py-files):

    python jobs/crawl_plan.py --pages <parquet> --robots <parquet> \
        --out <dir> [--seen <parquet-with-url-col>] [--budget 1000] \
        [--workers 8] [--report report.json] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if __package__ in (None, ""):  # direct `python jobs/crawl_plan.py`
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

# md5-prefix BIGINT id — the CANONICAL wide pair from operators/dedup.py
# (48-bit: at 10^6 frontier urls a 32-bit id expects ~100 birthday
# collisions, which are NOT benign — a colliding pair makes the within-
# host fetch order tie-nondeterministic across runs and diverges from a
# GROUP-BY-id oracle; 48-bit expects ~0.004, disclosed residual risk)
from omnition_opentelemetry_service_spark.operators.dedup import (
    _XH12_SPARK)

_ID_EXPR = _XH12_SPARK.format(s="canon_url")


def crawl_plan(pages: DataFrame, robots: DataFrame, budget: int = 1000,
               num_workers: int = 8, seen: DataFrame | None = None,
               default_delay: float = 1.0) -> DataFrame:
    """(host, url_id, url, fetch_seq, scheduled_at, worker): the next
    cycle's fetch plan per the module pipeline. ``seen`` (any table with
    a url column) augments the snapshot's own urls as the already-known
    set."""
    from omnition_opentelemetry_service_spark.operators import (
        frontier as fr,
        linkgraph as lg,
        retry as rt,
    )

    ranks = lg.host_rank(lg.host_edges(pages))
    alloc = lg.allocate_budget(ranks, budget)

    from omnition_opentelemetry_service_spark.operators import urls as ur

    # relative hrefs carry no authority (url_host = '') — same-host
    # self-links, not fetch candidates (the host_edges predicate)
    entries = (lg.extract_links(pages)
               # absolute http(s) only: mailto:/javascript:/tel:/data:
               # hrefs parse to junk hosts through URL_PAT and would earn
               # budget + frontier slots (review finding)
               .filter(ur.is_fetchable("href"))
               .withColumn("h", ur.url_host("href"))
               .filter("h IS NOT NULL AND h <> ''")
               .select(F.col("h").alias("host"),
                       F.lit("url").alias("kind"),
                       F.col("href").alias("loc")))
    known = pages.select("url")
    if seen is not None:
        known = known.unionByName(seen.select("url"))
    cands = (fr.discover_from_sitemaps(entries, known)
             .select(F.expr(_ID_EXPR).alias("url_id"), "url"))

    sched = fr.frontier_schedule(cands, robots,
                                 default_delay=default_delay)
    return rt.assign_workers(
        lg.budgeted_frontier(sched, alloc), num_workers=num_workers)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="parquet of (doc_id, url, html) — last snapshot")
    ap.add_argument("--robots", required=True,
                    help="parquet of (host, robots_txt)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seen", default=None,
                    help="optional parquet with a url column (URL store)")
    ap.add_argument("--budget", type=int, default=1000)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--default-delay", type=float, default=1.0)
    ap.add_argument("--report", default=None)
    ap.add_argument("--parallelism", type=int, default=8)
    args = ap.parse_args()

    from omnition_opentelemetry_service_spark.operators import retry as rt
    from omnition_opentelemetry_service_spark.registry import (
        release_caches,
    )
    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="crawl_plan", parallelism=args.parallelism)
    plan = crawl_plan(
        spark.read.parquet(args.pages), spark.read.parquet(args.robots),
        budget=args.budget, num_workers=args.workers,
        seen=(spark.read.parquet(args.seen) if args.seen else None),
        default_delay=args.default_delay)
    plan = plan.persist()  # written once, reported once
    plan.write.partitionBy("worker").mode("overwrite").parquet(args.out)

    if args.report:
        load = {int(r["worker"]): [int(r["n_urls"]), int(r["n_hosts"]),
                                   float(r["queue_horizon"])]
                for r in rt.worker_load(plan).collect()}
        report = {"budget": args.budget, "workers": args.workers,
                  "planned_urls": sum(v[0] for v in load.values()),
                  "worker_load": {str(k): load[k] for k in sorted(load)}}
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    release_caches(spark)
    spark.stop()


if __name__ == "__main__":
    main()
