"""URL canonicalization + URL-keyed dedup — the web-pipeline identity layer.

A crawl-fed training corpus carries one URL per document, and the SAME
page arrives under many spellings: scheme variants, ``www.`` prefixes,
default ports, userinfo, trailing slashes, tracking query params
(``utm_*`` & friends), reordered query strings, fragments. CCNet /
RefinedWeb-style pipelines dedup by CANONICAL URL before any content
dedup because it is the cheapest identity available (no text scan at
all). Reference analog: the collector's attribute-normalization
processors (internal/processor/attributes, semantics only — the
canonical-key idea of normalizing before keying), applied to the web
domain.

Canonicalization recipe (ONE definition, engine-keyed syntax table — the
``_words_expr`` pattern from operators/corpus.py):

1. parse ``scheme://authority path ?query`` with one backslash-free regex
   (trap 24: a quoted ``\\?`` literal is ITSELF engine-divergent — Spark
   honors backslash escapes in SQL literals, DuckDB doesn't — so every
   pattern here uses ``[?]``/``[.]`` classes instead of escapes);
2. authority → lowercase, strip userinfo ``user@``, strip default ports
   ``:80``/``:443``, strip leading ``www.``;
3. path → strip trailing ``/``+ (path CASE is preserved — only the host
   is case-insensitive per RFC 3986);
4. query → split on ``&``, drop empties and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``ref``), SORT the
   remainder (param order is transport noise), rejoin;
5. fragment → dropped;
6. NULL url → NULL canon via an explicit CASE guard (trap 25: DuckDB
   ``concat`` ignores NULL args, Spark's returns NULL — without the
   guard a NULL url would canonicalize to the surviving literals).

Every regexp_replace here is ANCHORED and single-occurrence, so Spark's
replace-all vs DuckDB's replace-first-without-'g' divergence cannot
bite. Contract: ASCII URLs (binary collation makes the query sort and
host lower() engine-identical; IDN/percent-decoding are out of scope and
documented, not silently wrong).

Shape at scale: canonicalization is a pure projection (no shuffle, rides
the scan, whole-stage codegen). ``url_dedup_groups`` is ONE exchange on
the canonical key with map-side partial min/count — the exact_dedup
pattern (operators/dedup.py) keyed by canon URL instead of content
fingerprint; no join against the corpus, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC-3986-ish, backslash-free: group 1 = authority, 2 = path, 3 = query.
# All parts optional so the regex matches EVERY string (a non-match would
# hit regexp_extract's no-match behavior, which differs by engine
# version — never rely on it).
URL_PAT = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]*)([^?#]*)(?:[?]([^#]*))?"
TRACKING_PAT = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

_SYNTAX = {
    # array fns + regex-match predicate differ by name only; the recipe
    # (and every pattern) is shared above these.
    # trim: Duck's bare trim strips ALL unicode whitespace while Spark's
    # strips only 0x20 — pin space-only semantics (corpus._words_sql_duck).
    "spark": dict(lfilter="filter", lsort="array_sort", ljoin="array_join",
                  split="split", null_t="STRING", trim="trim({x})",
                  match="{x} rlike '{p}'"),
    "duck": dict(lfilter="list_filter", lsort="list_sort",
                 ljoin="array_to_string", split="string_split",
                 null_t="VARCHAR", trim="trim({x}, ' ')",
                 match="regexp_matches({x}, '{p}')"),
}


def _host_sql(col: str, engine: str) -> str:
    """Canonical host (the canon-URL component): space-trimmed, lowercase
    authority, minus userinfo/default port/trailing DNS root dot/www
    (regexp_extract/regexp_replace/lower agree across engines; all
    replaces anchored single-match). Non-default ports are KEPT here —
    a different port is a different resource in the canon identity."""
    t = _SYNTAX[engine]["trim"].format(x=col)
    auth = f"lower(regexp_extract({t}, '{URL_PAT}', 1))"
    no_user = f"regexp_replace({auth}, '^[^@]*@', '')"
    no_port = f"regexp_replace({no_user}, ':(80|443)$', '')"
    # trailing DNS root dot, in both spellings (bare end / before a kept
    # port) — TWO backref-free replaces: replacement backrefs are engine-
    # divergent ($1 in Java, \\1 in DuckDB), so they are banned here.
    # The '[.]+:' pattern is UNANCHORED and can match more than once on
    # junk authorities ('a.:b.:c'); Spark replaces every occurrence while
    # DuckDB default-replaces only the first — trap 2's defense: pass 'g'
    # in the DuckDB fragment so both engines replace globally.
    g = ", 'g'" if engine == "duck" else ""
    no_dot = (f"regexp_replace(regexp_replace({no_port}, '[.]+$', ''), "
              f"'[.]+:', ':'{g})")
    return f"regexp_replace({no_dot}, '^www[.]', '')"


def _canon_sql(col: str, engine: str) -> str:
    s = _SYNTAX[engine]
    host = _host_sql(col, engine)
    t = s["trim"].format(x=col)
    path = (f"regexp_replace(regexp_extract({t}, '{URL_PAT}', 2), "
            f"'/+$', '')")
    rawq = f"regexp_extract({t}, '{URL_PAT}', 3)"
    keep = s["match"].format(x="x", p=TRACKING_PAT)
    # coalesce: DuckDB's list-join on an EMPTY list yields NULL where
    # Spark's array_join yields '' (the corpus.py empty-gram divergence)
    # — and that NULL would then vanish inside Duck's concat (trap 25),
    # leaving a bare '?'. Pin the Spark semantics in both engines.
    q = (f"coalesce({s['ljoin']}({s['lsort']}({s['lfilter']}("
         f"{s['split']}({rawq}, '&'), x -> x <> '' AND NOT ({keep}))), "
         f"'&'), '')")
    canon = (f"concat({host}, {path}, "
             f"CASE WHEN q_ = '' THEN '' ELSE concat('?', q_) END)")
    # bind the query once through a transform wrapper (the CollapseProject
    # re-evaluation trap — see functions/text.py) and guard NULL urls
    # explicitly (trap 25: Duck concat would ignore the NULL).
    bound = (f"transform(array({q}), q_ -> {canon})[0]" if engine == "spark"
             else f"list_transform([{q}], q_ -> {canon})[1]")
    return (f"CASE WHEN {col} IS NULL THEN CAST(NULL AS {s['null_t']}) "
            f"ELSE {bound} END")


def canonical_url(col: str = "url") -> Column:
    """Spark column: canonical form of ``col`` per the module recipe."""
    return F.expr(_canon_sql(col, "spark"))


def canonical_url_sql_duck(col: str = "url") -> str:
    """DuckDB twin of :func:`canonical_url` — same recipe, same patterns."""
    return _canon_sql(col, "duck")


def _bare_host_sql(col: str, engine: str) -> str:
    """The HOST identity (blocklist / politeness / per-host grouping):
    the canon host with ANY port stripped — a crawl source must not dodge
    a host blocklist or its politeness budget by appending :8080 (ports
    are also outside the blocklist charset, so a ported host could not
    even be listed) — and '' collapsed to NULL: relative/junk URLs have
    NO host, and an empty-string host would silently pool every such doc
    into one phantom host group for line-dedup/quota stages."""
    base = _host_sql(col, engine)
    return f"nullif(regexp_replace({base}, ':[0-9]+$', ''), '')"


def url_host(col: str = "url") -> Column:
    """Spark column: host identity only (blocklists key on this)."""
    return F.expr(f"CASE WHEN {col} IS NULL THEN CAST(NULL AS STRING) "
                  f"ELSE {_bare_host_sql(col, 'spark')} END")


def url_host_sql_duck(col: str = "url") -> str:
    return (f"CASE WHEN {col} IS NULL THEN CAST(NULL AS VARCHAR) "
            f"ELSE {_bare_host_sql(col, 'duck')} END")


def url_dedup_groups(docs: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """(canon_url, keep_id, dup_cnt): one row per canonical URL, smallest
    id as the deterministic keeper — exact_dedup's group table
    (operators/dedup.py:47) keyed by canonical URL. NULL urls are
    EXCLUDED: no identity to dedup on, and grouping them would declare
    every fetch-failed doc a duplicate of every other (the
    corpus_monitor NULL-fp rule). One exchange on canon_url with
    map-side partial min/count; never corpus×corpus."""
    return (docs
            .withColumn("canon_url", canonical_url(url_col))
            .filter(F.col("canon_url").isNotNull())
            .groupBy("canon_url")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("dup_cnt")))


def url_dedup_groups_sql_duck(docs_sql: str, url_col: str = "url",
                              id_col: str = "doc_id") -> str:
    canon = canonical_url_sql_duck(url_col)
    return f"""
    SELECT canon_url, CAST(min({id_col}) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_cnt
    FROM (SELECT {id_col}, {canon} AS canon_url FROM ({docs_sql}))
    WHERE canon_url IS NOT NULL
    GROUP BY canon_url"""


_HOST_CHARSET = set("abcdefghijklmnopqrstuvwxyz0123456789.-")


def validate_blocklist(blocked_hosts: list[str]) -> list[str]:
    """THE blocklist literal-safety gate (one definition; PARITY trap 24
    — reject, don't escape): hosts inline into both engines' SQL."""
    for h in blocked_hosts:
        if not h or not set(h) <= _HOST_CHARSET:
            raise ValueError(f"blocklist host not literal-safe: {h!r}")
    return blocked_hosts


def host_blocklist_filter(docs: DataFrame, blocked_hosts: list[str],
                          url_col: str = "url") -> DataFrame:
    """Drop docs whose canonical host is on the blocklist. Hosts are
    validated to a literal-safe charset and REJECTED otherwise (trap 24:
    escaping a quoted literal is itself engine-divergent; the DuckDB twin
    inlines the same list). NULL-url docs pass (no host to match — the
    filter removes known-bad hosts, it is not an allowlist). The list is
    a driver-side literal IN over a bounded blocklist — no join, no
    shuffle; a corpus-scale blocklist would become a broadcast anti-join
    instead, which this deliberately is not (blocklists are small)."""
    validate_blocklist(blocked_hosts)
    host = url_host(url_col)
    return docs.filter(host.isNull() | ~host.isin(blocked_hosts))


def host_blocklist_pred_duck(blocked_hosts: list[str],
                             url_col: str = "url") -> str:
    """DuckDB WHERE-clause twin of :func:`host_blocklist_filter`."""
    validate_blocklist(blocked_hosts)
    host = url_host_sql_duck(url_col)
    lits = ", ".join(f"'{h}'" for h in blocked_hosts)
    return f"(({host}) IS NULL OR ({host}) NOT IN ({lits}))"


# --- deterministic URL fixture (documents carries no url column) --------
#
# Engine-NEUTRAL SQL (CAST AS STRING works in both: DuckDB aliases STRING
# to VARCHAR) so the Spark query and the DuckDB oracle synthesize
# byte-identical urls from doc_id. Variants cover every canonicalization
# rule; doc_ids congruent mod lcm(20,50)=100 with variants in the same
# canon class COLLIDE, so the dedup extras slot is non-vacuous at sf0.01.

def url_fixture_sql(id_col: str = "doc_id") -> str:
    h = f"CAST({id_col} % 20 AS STRING)"
    p = f"CAST({id_col} % 50 AS STRING)"
    return f"""CASE
      WHEN {id_col} % 97 = 0 THEN CAST(NULL AS STRING)
      WHEN {id_col} % 7 = 0 THEN concat('http://www.site', {h}, '.example.com/a/p', {p})
      WHEN {id_col} % 7 = 1 THEN concat('https://site', {h}, '.example.com/a/p', {p}, '/')
      WHEN {id_col} % 7 = 2 THEN concat('https://site', {h}, '.example.com:443/a/p', {p}, '?utm_source=x')
      WHEN {id_col} % 7 = 3 THEN concat('http://site', {h}, '.example.com/a/p', {p}, '?b=2&a=1')
      WHEN {id_col} % 7 = 4 THEN concat('https://www.site', {h}, '.example.com/a/p', {p}, '?a=1&b=2&utm_campaign=z#frag')
      WHEN {id_col} % 7 = 5 THEN concat('http://crawler@site', {h}, '.example.com/other/p', {p})
      ELSE concat('HTTP://Site', {h}, '.Example.COM/plain/p', {p})
    END"""


# -- fetchability gate ----------------------------------------------------------
# Only absolute http(s) URLs are crawl candidates. Everything else an
# <a href> can carry — mailto:, javascript:, tel:, data:, ftp:// — parses
# to a junk "host" through URL_PAT (its authority group tolerates
# schemeless forms, so 'mailto:bob@e.com' yields host 'e.com'), pollutes
# host_edges/host_rank, and earns frontier budget it can never use.
# Discovery must gate on this BEFORE host extraction. (?i) is shared
# regex syntax (java.util.regex and RE2 agree).
FETCHABLE_RX = "(?i)^https?://"


def is_fetchable(col: str = "url") -> Column:
    return F.expr(_fetchable_sql(col, "spark"))


def is_fetchable_sql_duck(col: str = "url") -> str:
    return _fetchable_sql(col, "duck")


def _fetchable_sql(col: str, engine: str) -> str:
    s = _SYNTAX[engine]
    t = s["trim"].format(x=col)
    m = s["match"].format(x=t, p=FETCHABLE_RX)
    return f"CASE WHEN {col} IS NULL THEN false ELSE {m} END"
