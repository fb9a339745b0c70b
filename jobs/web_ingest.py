"""spark-submit entrypoint for WEB INGEST: the crawl-side front half of
the training-data pipeline, composed end-to-end from the individual
operators (the back half — tokenize → dedup → mix → pack — is
jobs/make_release.py --input-docs; this job's output parquet is exactly
that flag's input shape). The CCNet/RefinedWeb stage order, cheapest
identity first:

    raw crawl (doc_id, url, html [, source])
      → host blocklist            (urls.host_blocklist_filter — URL-only,
                                   no text touched yet)
      → robots politeness         (optional --robots: RFC 9309 verdicts
                                   via robots.robots_gate_inline —
                                   broadcast rule arrays, zero shuffle)
      → canonical-URL dedup       (urls.canonical_url + ONE min_by groupBy;
                                   the cheapest duplicate identity — pages
                                   collapse before any HTML byte is parsed)
      → HTML → text               (functions/html.strip_html; block tags
                                   become newlines so the next stage has
                                   real lines) ; empty/NULL text dropped
      → per-host line dedup       (corpus.line_dedup_grouped keyed by
                                   canonical host — site boilerplate
                                   nav/footer removal)
      → quality + language gates  (functions/text rule scores)
      → exact content dedup       (md5 fingerprint min_by collapse —
                                   same-text-different-URL pages)
      → optional per-host quota   (corpus.quota_per_stratum — RefinedWeb
                                   at-most-N-per-domain)
      → ONE partitioned write + per-stage counters riding the same action

Counter discipline (the reference's obsreport contract — counters must
not add passes): every stage boundary carries an Observation
(metrics.StageCounters) measuring received/dropped in the SAME pass as
the write. The one extra action in the job is the materialize() of the
stripped-text table, which is ALSO a perf necessity: line_dedup_grouped
consumes its input three times (base/exploded/removal-set) and the
strip+URL-dedup upstream is the expensive part — and it keeps every
upstream Observation single-fire (the make_release discipline).

Shape at scale, stage by stage: blocklist = literal IN filter (no join);
URL dedup = ONE exchange on (canon_url, null-key) with map-side min_by
partials — NULL-url rows get their own doc_id-keyed group so they pass
through the same aggregate with no union branch (a second consumer of
the input would double-fire the ingest Observation and rescan the raw
table); strip = projection; line dedup = three line-grain exchanges
keyed (host, line)/(doc) — no corpus-sized join; gates = projection;
exact dedup = one fp exchange, min_by partials; quota = two bounded
windows (salt-phase then ≤ n_salts·cap rows per host). Nothing joins
corpus×corpus; every broadcast is a bounded rule/removal table chosen by
Catalyst.

Usage (sandbox; cluster: package with tools/package.sh + --py-files):

    python jobs/web_ingest.py --input <parquet> --out <dir> \
        [--block-hosts h1,h2] [--line-min-count 2] [--quality-min 0.5] \
        [--host-cap N] [--report report.json] [--parallelism 8]

    # or straight from the raw crawl file layer (operators/warc.py):
    python jobs/web_ingest.py --input-warc <dir-of-warc-files> --out <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame

if __package__ in (None, ""):  # direct `python jobs/web_ingest.py`
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def web_ingest(docs: DataFrame, blocked_hosts: list[str] | None = None,
               line_min_count: int = 2, quality_min: float = 0.5,
               host_cap: int | None = None,
               host_quality_min: float | None = None, counters=None,
               robots: DataFrame | None = None,
               robots_agent: str = "trainbot",
               id_col: str = "doc_id") -> DataFrame:
    """The composed front half (see module doc). Returns the cleaned
    document table (doc_id, url, host, source, text) — make_release
    --input-docs shape plus provenance columns. Caller owns the returned
    DataFrame's cache lifecycle (one persist is created internally and
    registered for registry.release_caches via spark.catalog).

    ``counters`` (metrics.StageCounters) receives one Observation per
    stage boundary; harvest() after the consuming action. The stage
    functions themselves live in operators/web.py so the streaming twin
    (streaming/web_ingest.py) replays them from the packaged zip."""
    from omnition_opentelemetry_service_spark.operators import corpus as cp
    from omnition_opentelemetry_service_spark.operators import web as wb
    from omnition_opentelemetry_service_spark.operators.widen import (
        materialize,
    )

    annotated, drop_pred = wb.annotate_urls(docs, blocked_hosts, id_col)
    if counters is not None:
        annotated = counters.observe_stage(
            annotated, "web_ingest", "blocklist", drop_predicate=drop_pred)
    unblocked = annotated.filter(~drop_pred)

    if robots is not None:
        # RFC 9309 politeness (operators/robots.py): zero-shuffle inline
        # verdict over broadcast per-host rule arrays, riding the same
        # pass — reuses annotate's host column, fails open on NULLs
        from omnition_opentelemetry_service_spark.operators import (
            robots as rb,
        )

        unblocked, rb_drop = rb.robots_gate_inline(
            unblocked, robots, agent=robots_agent, host_col="host")
        if counters is not None:
            unblocked = counters.observe_stage(
                unblocked, "web_ingest", "robots", drop_predicate=rb_drop)
        unblocked = unblocked.filter(~rb_drop).drop("_robots_verdict")

    url_deduped = wb.url_collapse(unblocked, id_col).drop("canon_url")

    stripped, empty_pred = wb.strip_stage(url_deduped, id_col)
    if counters is not None:
        stripped = counters.observe_stage(
            stripped, "web_ingest", "strip", drop_predicate=empty_pred)
    stripped = stripped.filter(~empty_pred)
    # three consumers ahead (line dedup's base/exploded/removal) and the
    # join back for provenance — materialize once, observations upstream
    # fire exactly once here.
    stripped = materialize(stripped)

    cleaned = wb.line_dedup_stage(stripped, line_min_count, id_col)

    gate_pred = wb.doc_gate_pred(quality_min)
    if counters is not None:
        cleaned = counters.observe_stage(
            cleaned, "web_ingest", "gates", drop_predicate=gate_pred)
    gated = cleaned.filter(~gate_pred)

    if host_quality_min is not None:
        # domain-reputation pass (corpus.host_quality_gate): a spam
        # host's individually-passable pages fall together; runs AFTER
        # the per-doc gates so the host mean is over gated survivors
        gated = cp.host_quality_gate(
            gated, min_host_quality=host_quality_min)

    exact = wb.exact_collapse(gated, id_col)

    out = exact
    if host_cap is not None:
        # NULL-host docs form one pseudo-domain under the quota (they
        # share the NULL stratum) — the conservative reading for a cap
        # whose job is bounding any one origin's share
        out = cp.quota_per_stratum(out, cap=host_cap, strata_col="host",
                                   key_col=id_col)
    if counters is not None:
        out = counters.observe_stage(out, "web_ingest", "written")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet of (doc_id, url, html[, source])")
    src.add_argument("--input-warc",
                     help="directory of WARC archives (plain or "
                          "per-record-gzip) — the raw crawl file layer; "
                          "read via binaryFile + operators/warc.parse_warc, "
                          "a 'fetch' counter stage precedes the blocklist")
    ap.add_argument("--out", required=True)
    ap.add_argument("--block-hosts", default=None)
    ap.add_argument("--robots", default=None,
                    help="parquet of (host, robots_txt) — enables the "
                         "RFC 9309 politeness stage")
    ap.add_argument("--robots-agent", default="trainbot")
    ap.add_argument("--line-min-count", type=int, default=2)
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--host-cap", type=int, default=None)
    ap.add_argument("--host-quality-min", type=float, default=None)
    ap.add_argument("--report", default=None)
    ap.add_argument("--parallelism", type=int, default=8)
    args = ap.parse_args()

    from omnition_opentelemetry_service_spark.metrics import StageCounters
    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="web_ingest", parallelism=args.parallelism)
    counters = StageCounters()
    blocked = (args.block_hosts.split(",") if args.block_hosts else None)
    if args.input_warc:
        from omnition_opentelemetry_service_spark.operators import warc as wc

        docs = wc.load_warc_docs(spark, args.input_warc, counters=counters)
    else:
        docs = spark.read.parquet(args.input)
    cleaned = web_ingest(
        docs, blocked_hosts=blocked,
        line_min_count=args.line_min_count, quality_min=args.quality_min,
        host_cap=args.host_cap, host_quality_min=args.host_quality_min,
        robots=(spark.read.parquet(args.robots) if args.robots else None),
        robots_agent=args.robots_agent,
        counters=counters)
    cleaned.write.mode("overwrite").parquet(args.out)
    rows = counters.harvest()
    report = {f"{stage}:{tag}": {"received": rec, "dropped": drop}
              for stage, tag, rec, drop in rows}
    out = json.dumps(report, sort_keys=True)
    if args.report:
        with open(args.report, "w") as f:
            f.write(out + "\n")
    print(out)
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
