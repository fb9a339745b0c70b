"""Web-ingest stage functions — the composable pieces of the crawl front
half (jobs/web_ingest.py is the batch CLI composition; streaming/
web_ingest.py replays the same stages per micro-batch against a
persisted URL store). Stage semantics, counter discipline and the
at-scale shapes are documented on the composition in jobs/web_ingest.py;
each function below also states its own shape.

Kept in the package (not jobs/) because the streaming twin must import
these from the --py-files zip on a cluster; jobs/ entrypoint scripts ride
outside the package by design (tools/package.sh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import html as hh
from ..functions import text as tx
from . import corpus as cp
from . import urls as ur


def annotate_urls(docs: DataFrame, blocked_hosts: list[str] | None = None,
                  id_col: str = "doc_id") -> tuple[DataFrame, "F.Column"]:
    """(annotated, drop_pred): canon_url + host columns added; drop_pred
    marks blocklisted hosts (NULL host PASSES — blocklist, not allowlist:
    a bare isin() is NULL for NULL hosts and filter(~NULL) silently
    drops). Projection-only; the caller attaches its Observation between
    annotate and filter so received/dropped ride one pass."""
    has_source = "source" in docs.columns
    src = F.col("source") if has_source else F.lit(None).cast("string")
    annotated = docs.select(
        F.col(id_col), F.col("url"), F.col("html"), src.alias("source"),
        ur.canonical_url("url").alias("canon_url"),
        ur.url_host("url").alias("host"))
    blocked = list(blocked_hosts or [])
    if blocked:
        ur.validate_blocklist(blocked)
        drop_pred = (F.col("host").isNotNull()
                     & F.col("host").isin(blocked))
    else:
        drop_pred = F.lit(False)
    return annotated, drop_pred


def url_collapse(annotated: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Canonical-URL dedup as ONE aggregate (min_by keeper; NULL-canon
    rows group by their own id via the null-key column, so they pass
    through the same exchange — no second consumer of the input)."""
    return (annotated
            .groupBy("canon_url",
                     F.when(F.col("canon_url").isNull(), F.col(id_col))
                     .otherwise(F.lit(0)).alias("_nk"))
            .agg(F.min_by(
                F.struct(id_col, "url", "html", "source", "host",
                         "canon_url"),
                F.col(id_col)).alias("r"))
            .select("r.*"))


def strip_stage(url_deduped: DataFrame,
                id_col: str = "doc_id") -> tuple[DataFrame, "F.Column"]:
    """(stripped, empty_pred): HTML → line-structured text; the caller
    filters ~empty_pred (after attaching its Observation)."""
    stripped = url_deduped.select(
        id_col, "url", "host", "source",
        *([F.col("canon_url")] if "canon_url" in url_deduped.columns
          else []),
        hh.strip_html("html").alias("text"))
    return stripped, (F.col("text").isNull() | (F.col("text") == ""))


def line_dedup_stage(stripped: DataFrame, line_min_count: int = 2,
                     id_col: str = "doc_id") -> DataFrame:
    """Per-host boilerplate line removal + provenance join-back. The
    caller materializes `stripped` first (three consumers here)."""
    extra = [c for c in ("canon_url",) if c in stripped.columns]
    lines = cp.line_dedup_grouped(
        stripped, group_col="host", min_count=line_min_count, id_col=id_col)
    return (lines
            .join(stripped.select(id_col, "url", "host", "source", *extra),
                  id_col)
            .select(id_col, "url", "host", "source", *extra,
                    F.col("clean_text").alias("text")))


def doc_gate_pred(quality_min: float = 0.5) -> "F.Column":
    """Per-doc drop predicate: quality floor + language identified."""
    return ((tx.quality_score("text") < quality_min)
            | (tx.lang_id("text") == "und"))


def exact_collapse(gated: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup (fingerprint min_by — same-text-different-URL
    pages), one exchange with map-side partials. NULL-text rows get a
    per-row sentinel key (the incremental.signature_store rule): groupBy
    treats NULL keys as EQUAL, so without it every quarantine row would
    silently collapse into one survivor."""
    extra = [c for c in ("canon_url",) if c in gated.columns]
    fp = F.coalesce(tx.fingerprint("text"),
                    F.concat(F.lit("null:"), F.col(id_col).cast("string")))
    return (gated
            .groupBy(fp.alias("_fp"))
            .agg(F.min_by(
                F.struct(id_col, "url", "host", "source", *extra, "text"),
                F.col(id_col)).alias("r"))
            .select("r.*"))
