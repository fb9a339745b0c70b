"""Crawl-frontier scheduler — politeness-aware fetch ordering for the web
front half (the stage BEFORE jobs/web_ingest.py's content pipeline: decide
what to fetch, in what order, and when).

Composes this module family's politeness primitives into a fetch schedule:

1. annotate: canonical URL + canonical host (pure projection, urls.py);
2. gate: RFC 9309 verdict via robots.robots_gate_inline — broadcast
   per-host rule arrays, higher-order fold, ZERO shuffle on the
   candidate stream;
3. identity collapse: one keeper per canonical URL (min id — the
   urls.url_dedup_groups pattern), so the frontier never schedules the
   same page twice under different spellings;
4. throttle: robots.crawl_delays per host (group-scoped like
   allow/disallow), absent hosts fall to ``default_delay``;
5. schedule: fetch_seq = position in the host's queue (deterministic:
   ordered by keeper id), scheduled_at = fetch_seq × the host's delay —
   the earliest politeness-legal fetch offset in seconds.

``discover_from_sitemaps`` feeds the frontier forward: <url> entries from
robots.parse_sitemap, canonical-deduped within the batch and anti-joined
against the already-seen store, become the next round's candidates.

Reference analog: the collector's receiver admission + queued-retry
pacing (components.go:69 batching, semantics only) applied to the crawl
domain — admission control keyed by an external politeness contract.

Shape at scale: the gate is a broadcast join + projection (no exchange on
candidates); the collapse is ONE hash-agg exchange on canon_url with
map-side partials; the delay join broadcasts (delays ≤ hosts ≪ urls);
the schedule is ONE exchange on host. The per-host row_number window
serializes a mega-host onto one task — frontier_schedule_scalable is the
bounded two-exchange form (the node_batches_scalable / carry_forward
pattern: slice the id domain, rank in-slice, roll up slice counts). No
join touches urls×urls; no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import robots as rb
from . import urls as ur


def _annotate_gate(candidates: DataFrame, robots: DataFrame, agent: str,
                   url_col: str, id_col: str) -> DataFrame:
    """(url_id, url, canon_url, host) — gated + identity-annotated
    candidates. NULL-canon rows (NULL url) are dropped: nothing to fetch."""
    annot = candidates.select(
        F.col(id_col).alias("url_id"),
        F.col(url_col).alias("url"),
        ur.canonical_url(url_col).alias("canon_url"),
        ur.url_host(url_col).alias("host"))
    gated, drop = rb.robots_gate_inline(
        annot, robots, agent=agent, url_col="url", host_col="host")
    return (gated.filter(~drop).drop("_robots_verdict")
            .filter(F.col("canon_url").isNotNull()))


def _collapse(annotated: DataFrame) -> DataFrame:
    """One keeper per canonical URL: min id, its url/host carried via
    min_by (id is unique, so the keeper is total-order deterministic).
    ONE exchange on canon_url, map-side partial min."""
    return (annotated.groupBy("canon_url")
            .agg(F.min("url_id").alias("url_id"),
                 F.expr("min_by(url, url_id)").alias("url"),
                 F.expr("min_by(host, url_id)").alias("host")))


def _with_delay(kept: DataFrame, robots: DataFrame, agent: str,
                default_delay: float) -> DataFrame:
    delays = F.broadcast(rb.crawl_delays(robots, agent=agent))
    return (kept.join(delays, "host", "left")
            .withColumn("_delay", F.coalesce(
                F.col("crawl_delay"), F.lit(float(default_delay))))
            .drop("crawl_delay"))


def frontier_schedule(candidates: DataFrame, robots: DataFrame,
                      agent: str = rb.DEFAULT_AGENT,
                      default_delay: float = 1.0,
                      url_col: str = "url",
                      id_col: str = "url_id") -> DataFrame:
    """(url_id, url, host, fetch_seq, scheduled_at): the politeness-legal
    fetch plan. Native window form — exactly its own oracle SQL
    (frontier_schedule_sql_duck); one host = one window partition, fine
    for real host fan-outs (a frontier rarely holds >10^6 urls of ONE
    host); use frontier_schedule_scalable past that."""
    kept = _with_delay(
        _collapse(_annotate_gate(candidates, robots, agent, url_col,
                                 id_col)),
        robots, agent, default_delay)
    w = Window.partitionBy("host").orderBy("url_id")
    return (kept
            .withColumn("fetch_seq",
                        (F.row_number().over(w) - 1).cast("bigint"))
            .select("url_id", "url", "host", "fetch_seq",
                    (F.col("fetch_seq") * F.col("_delay"))
                    .cast("double").alias("scheduled_at")))


def frontier_schedule_scalable(candidates: DataFrame, robots: DataFrame,
                               agent: str = rb.DEFAULT_AGENT,
                               default_delay: float = 1.0,
                               url_col: str = "url",
                               id_col: str = "url_id",
                               slice_rows: int = 100_000) -> DataFrame:
    """frontier_schedule for the degenerate-host case (one host owning a
    frontier-sized URL set). Same output, bounded parallelism: slice the
    id domain (_slice = url_id div slice_rows — data-derived, ≤ slice_rows
    ids per slice because ids are unique), rank within (host, _slice),
    roll per-slice counts into cumulative offsets through a tiny window
    over the slice table. Two bounded exchanges on (host, _slice) instead
    of one unbounded exchange on host."""
    kept = _with_delay(
        _collapse(_annotate_gate(candidates, robots, agent, url_col,
                                 id_col)),
        robots, agent, default_delay)
    # sliced feeds BOTH the in-slice rank and the per-slice counts —
    # without a persist the whole upstream (gate projection, canon
    # collapse exchange, delay join) executes twice per action (review
    # finding; allocate_budget persists for the same reason). Caller
    # releases per the repo cache contract.
    sliced = kept.withColumn(
        "_slice", (F.col("url_id") / F.lit(slice_rows)).cast("bigint")) \
        .persist()
    w_in = Window.partitionBy("host", "_slice").orderBy("url_id")
    ranked = sliced.withColumn("_rk", F.row_number().over(w_in))

    counts = sliced.groupBy("host", "_slice").agg(F.count("*").alias("_c"))
    w_cum = (Window.partitionBy("host").orderBy("_slice")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_cum), F.lit(0))).drop("_c")

    return (ranked.join(offsets, ["host", "_slice"])
            .withColumn("fetch_seq",
                        (F.col("_off") + F.col("_rk") - 1).cast("bigint"))
            .select("url_id", "url", "host", "fetch_seq",
                    (F.col("fetch_seq") * F.col("_delay"))
                    .cast("double").alias("scheduled_at")))


def discover_from_sitemaps(entries: DataFrame, seen: DataFrame | None = None,
                           seen_url_col: str = "url") -> DataFrame:
    """Sitemap <url> entries → (host, url, canon_url) NEW frontier
    candidates: kind='url' only (index entries point at more sitemaps,
    not pages), canonical-deduped WITHIN the batch (min loc keeper —
    deterministic without ids), and anti-joined against ``seen`` on the
    canonical key. ``seen`` is any table carrying already-known urls
    (the URL store, the current frontier). One hash-agg exchange + one
    anti-join on canon_url; the seen side is whatever identity store the
    crawl already maintains — no new corpus-scale state. Non-fetchable
    locs (mailto:/javascript:/relative — a sitemap may carry anything)
    are gated out BEFORE canonicalization, the same is_fetchable rule as
    host_edges/anchor_texts: URL_PAT's tolerant authority group would
    otherwise schedule a junk candidate that can never be fetched."""
    cand = (entries.filter(F.col("kind") == "url")
            .filter(ur.is_fetchable("loc"))
            .select("host", F.col("loc").alias("url"),
                    ur.canonical_url("loc").alias("canon_url"))
            .filter(F.col("canon_url").isNotNull())
            .groupBy("canon_url")
            # keeper = lexicographic min (url, host) PAIR: min_by(host,
            # url) is tie-nondeterministic when two hosts' sitemaps list
            # the identical loc (review finding) — the struct min is a
            # total order in both engines
            .agg(F.min(F.struct("url", "host")).alias("_k"))
            .select("canon_url", F.col("_k.host").alias("host"),
                    F.col("_k.url").alias("url")))
    if seen is None:
        return cand.select("host", "url", "canon_url")
    seen_canon = seen.select(
        ur.canonical_url(seen_url_col).alias("canon_url")).distinct()
    return (cand.join(seen_canon, "canon_url", "left_anti")
            .select("host", "url", "canon_url"))


# -- DuckDB twins ----------------------------------------------------------------
def frontier_schedule_sql_duck(candidates_table: str, robots_table: str,
                               agent: str = rb.DEFAULT_AGENT,
                               default_delay: float = 1.0,
                               url_col: str = "url",
                               id_col: str = "url_id") -> str:
    """Full-chain twin: gate (robots_gate_sql_duck — verdict equality with
    the inline form is pinned by test_robots), canon collapse, delay join,
    per-host schedule. Same keeper rule (arg_min by id), same window
    order, same DOUBLE arithmetic."""
    gate = rb.robots_gate_sql_duck(
        f"(SELECT {id_col} AS url_id, {url_col} AS url "
        f"FROM {candidates_table}) c0",
        robots_table, agent=agent, url_col="url", id_col="url_id")
    delays = rb.crawl_delays_sql_duck(robots_table, agent=agent)
    canon = ur.canonical_url_sql_duck("g.url")
    return f"""
    WITH g AS ({gate}),
    annot AS (SELECT g.url_id, g.url, g.host, {canon} AS canon_url
              FROM g WHERE g.allowed),
    ded AS (SELECT min(url_id) AS url_id,
                   arg_min(url, url_id) AS url,
                   arg_min(host, url_id) AS host
            FROM annot WHERE canon_url IS NOT NULL
            GROUP BY canon_url),
    dl AS ({delays}),
    sched AS (SELECT d.url_id, d.url, d.host,
                     CAST(row_number() OVER (PARTITION BY d.host
                                             ORDER BY d.url_id) - 1
                          AS BIGINT) AS fetch_seq,
                     coalesce(dl.crawl_delay, {float(default_delay)!r})
                       AS _delay
              FROM ded d LEFT JOIN dl ON d.host = dl.host)
    SELECT url_id, url, host, fetch_seq,
           CAST(fetch_seq * _delay AS DOUBLE) AS scheduled_at
    FROM sched"""


def discover_from_sitemaps_sql_duck(entries_table: str,
                                    seen_table: str | None = None,
                                    seen_url_col: str = "url") -> str:
    canon = ur.canonical_url_sql_duck("loc")
    anti = ""
    if seen_table is not None:
        seen_canon = ur.canonical_url_sql_duck(seen_url_col)
        anti = (f" WHERE canon_url NOT IN (SELECT DISTINCT {seen_canon} "
                f"FROM {seen_table} WHERE {seen_url_col} IS NOT NULL)")
    return f"""
    WITH cand AS (SELECT host, loc AS url, {canon} AS canon_url
                  FROM {entries_table}
                  WHERE kind = 'url' AND {ur.is_fetchable_sql_duck('loc')}),
    ded AS (SELECT canon_url,
                   (min(struct_pack(u := url, h := host))).h AS host,
                   min(url) AS url
            FROM cand WHERE canon_url IS NOT NULL GROUP BY canon_url)
    SELECT host, url, canon_url FROM ded{anti}"""
