"""spark-submit entrypoint for WEB INGEST: the crawl-side front half of
the training-data pipeline, composed end-to-end from the individual
operators (the back half — tokenize → dedup → mix → pack — is
jobs/make_release.py --input-docs; this job's output parquet is exactly
that flag's input shape). The CCNet/RefinedWeb stage order, cheapest
identity first:

    raw crawl (doc_id, url, html [, source])
      → host blocklist            (urls.host_blocklist_filter — URL-only,
                                   no text touched yet)
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
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if __package__ in (None, ""):  # direct `python jobs/web_ingest.py`
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def web_ingest(docs: DataFrame, blocked_hosts: list[str] | None = None,
               line_min_count: int = 2, quality_min: float = 0.5,
               host_cap: int | None = None,
               host_quality_min: float | None = None, counters=None,
               id_col: str = "doc_id") -> DataFrame:
    """The composed front half (see module doc). Returns the cleaned
    document table (doc_id, url, host, source, text) — make_release
    --input-docs shape plus provenance columns. Caller owns the returned
    DataFrame's cache lifecycle (one persist is created internally and
    registered for registry.release_caches via spark.catalog).

    ``counters`` (metrics.StageCounters) receives one Observation per
    stage boundary; harvest() after the consuming action."""
    from omnition_opentelemetry_service_spark.functions import html as hh
    from omnition_opentelemetry_service_spark.functions import text as tx
    from omnition_opentelemetry_service_spark.operators import corpus as cp
    from omnition_opentelemetry_service_spark.operators import urls as ur
    from omnition_opentelemetry_service_spark.operators.widen import (
        materialize,
    )

    has_source = "source" in docs.columns
    src = F.col("source") if has_source else F.lit(None).cast("string")

    annotated = docs.select(
        F.col(id_col), F.col("url"), F.col("html"), src.alias("source"),
        ur.canonical_url("url").alias("canon_url"),
        ur.url_host("url").alias("host"))

    blocked = list(blocked_hosts or [])
    if blocked:
        # validate exactly like host_blocklist_filter (trap 24 charset)
        for h in blocked:
            if not h or not set(h) <= ur._HOST_CHARSET:
                raise ValueError(f"blocklist host not literal-safe: {h!r}")
        # NULL host must PASS (blocklist, not allowlist — the
        # host_blocklist_filter rule); a bare isin() is NULL for NULL
        # hosts and filter(~NULL) would silently drop them
        drop_pred = F.col("host").isNotNull() & F.col("host").isin(blocked)
    else:
        drop_pred = F.lit(False)
    if counters is not None:
        annotated = counters.observe_stage(
            annotated, "web_ingest", "blocklist", drop_predicate=drop_pred)
    unblocked = annotated.filter(~drop_pred)

    # canonical-URL dedup as ONE aggregate: NULL-canon rows (no URL
    # identity) group by their own doc_id via the null-key column, so
    # they survive individually without a second consumer of `unblocked`.
    url_deduped = (
        unblocked
        .groupBy("canon_url",
                 F.when(F.col("canon_url").isNull(), F.col(id_col))
                 .otherwise(F.lit(0)).alias("_nk"))
        .agg(F.min_by(
            F.struct(id_col, "url", "html", "source", "host"),
            F.col(id_col)).alias("r"))
        .select("r.*"))

    stripped = url_deduped.select(
        id_col, "url", "host", "source",
        hh.strip_html("html").alias("text"))
    empty_pred = F.col("text").isNull() | (F.col("text") == "")
    if counters is not None:
        stripped = counters.observe_stage(
            stripped, "web_ingest", "strip", drop_predicate=empty_pred)
    stripped = stripped.filter(~empty_pred)
    # three consumers ahead (line dedup's base/exploded/removal) and the
    # join back for provenance — materialize once, observations upstream
    # fire exactly once here.
    stripped = materialize(stripped)

    lines = cp.line_dedup_grouped(
        stripped, group_col="host", min_count=line_min_count, id_col=id_col)
    cleaned = (lines
               .join(stripped.select(id_col, "url", "host", "source"),
                     id_col)
               .select(id_col, "url", "host", "source",
                       F.col("clean_text").alias("text")))

    gate_pred = ((tx.quality_score("text") < quality_min)
                 | (tx.lang_id("text") == "und"))
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

    exact = (gated
             .groupBy(tx.fingerprint("text").alias("_fp"))
             .agg(F.min_by(
                 F.struct(id_col, "url", "host", "source", "text"),
                 F.col(id_col)).alias("r"))
             .select("r.*"))

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
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--block-hosts", default=None)
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
    cleaned = web_ingest(
        spark.read.parquet(args.input), blocked_hosts=blocked,
        line_min_count=args.line_min_count, quality_min=args.quality_min,
        host_cap=args.host_cap, host_quality_min=args.host_quality_min,
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
