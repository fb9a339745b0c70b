"""Robots Exclusion Protocol (RFC 9309) gate — crawl politeness for the
web front half (jobs/web_ingest.py sits downstream; this op decides which
fetched URLs a compliant crawler may even keep).

Semantics implemented (all from the public RFC):
- robots.txt is line-structured: ``User-agent:`` lines open a group;
  contiguous agent lines share one group; ``Allow:``/``Disallow:`` rules
  belong to the nearest preceding group; rules before any group are
  ignored; directives unknown to the GATE (Crawl-delay, Sitemap) are
  ignored by it but surfaced by crawl_delays / sitemap_urls /
  parse_sitemap for the frontier scheduler; ``#`` starts a comment.
- Group selection per host: if any group names OUR agent exactly
  (case-insensitive), exactly those groups apply; otherwise the ``*``
  groups; otherwise everything is allowed.
- Rule matching is longest-match over the URL's path+query: ``*`` is a
  wildcard, a trailing ``$`` anchors the end, precedence = most octets in
  the pattern, and on a length tie Allow wins. No matching rule → allowed.

Cross-engine twin discipline: the whole parse (line split → comment strip
→ directive extract → gaps-and-islands group ids → group choice) and the
matcher (pattern → LIKE with ``!`` as the escape char — NO backslash
anywhere, PARITY.md trap 24/28) are built from ONE fragment builder per
step parameterized by engine, corpus.py `_words_expr` style. The verdict
aggregate orders by ``2*octets(pattern) + (type=allow)`` — ties cannot
flip the ALLOWED verdict (equal score ⇒ equal type), and the reported
matched_pattern uses a zero-padded score+pattern string key
(``_score_key``) so max_by/arg_max ties resolve identically in both
engines and across runs; both aggregates ignore NULL-key rows
(non-matching rules), pinned by test_robots.

Shape at scale: parse is per-host-bounded (a robots file is ≤ a few KB —
the windows partition by host over ≤ file-line counts); the gate is ONE
equi-join docs⋈rules on host (rules tables are hosts-bounded, far
smaller than the corpus — Catalyst broadcasts when small, shuffles on
host otherwise; fan-out per doc ≤ rules-per-host, a small constant) and
ONE doc-keyed aggregate. No cross product, no corpus×corpus join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_AGENT = "trainbot"

_AGENT_SAFE = set("abcdefghijklmnopqrstuvwxyz0123456789-_")


def _check_agent(agent: str) -> str:
    a = agent.lower()
    if not a or not set(a) <= _AGENT_SAFE:
        # the agent name is inlined as a SQL literal — reject instead of
        # escaping (PARITY.md trap 24: escaping is itself divergent)
        raise ValueError(f"agent not literal-safe: {agent!r}")
    return a


def _trim(x: str, engine: str) -> str:
    """ASCII space/tab/CR trim — NOT bare trim (trap 5: DuckDB's bare trim
    strips all unicode whitespace). CR matters: robots.txt ships CRLF."""
    fn = "btrim" if engine == "spark" else "trim"
    return f"{fn}({x}, ' ' || chr(9) || chr(13))"


def _nocmt(line: str, engine: str) -> str:
    g = "" if engine == "spark" else ", 'g'"
    return f"regexp_replace({line}, '#.*', ''{g})"


def _dir_key(nocmt: str, engine: str) -> str:
    inner = f"regexp_extract({nocmt}, '^([^:]+):', 1)"
    return f"lower({_trim(inner, engine)})"


def _dir_val(nocmt: str, engine: str) -> str:
    return _trim(f"regexp_extract({nocmt}, '^[^:]+:(.*)$', 1)", engine)


def _like_pat(p: str) -> str:
    """Robots path pattern → LIKE pattern (engine-neutral: '!' escape,
    no backslash). '*'→'%', trailing '$' anchors (no trailing '%')."""
    anchored = f"substr({p}, length({p}), 1) = '$'"
    body = f"CASE WHEN {anchored} THEN substr({p}, 1, length({p}) - 1) ELSE {p} END"
    esc = (f"replace(replace(replace({body}, '!', '!!'), '%', '!%'), "
           f"'_', '!_')")
    star = f"replace({esc}, '*', '%')"
    return f"CASE WHEN {anchored} THEN {star} ELSE {star} || '%' END"


def _path_q(url: str, engine: str) -> str:
    """URL → path+query (fragment stripped; no path → '/'); NULL-safe."""
    nofrag = _nocmt(url, engine)  # '#.*' strip IS the fragment strip
    ext = (f"regexp_extract({nofrag}, "
           f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$', 1)")
    return (f"CASE WHEN {url} IS NULL THEN NULL "
            f"ELSE coalesce(nullif({ext}, ''), '/') END")


def _score(typ: str, plen: str, match: str) -> str:
    """Integer precedence: most-octets wins, Allow breaks ties (RFC).
    NULL when the rule does not match — max_by skips those rows."""
    return (f"CASE WHEN {match} THEN CAST(2 * {plen} + "
            f"CASE WHEN {typ} = 'allow' THEN 1 ELSE 0 END AS BIGINT) "
            f"ELSE NULL END")


def _score_key(typ: str, plen: str, match: str, pattern: str) -> str:
    """max_by/arg_max ordering key with a DETERMINISTIC total order:
    fixed-width zero-padded score then the pattern text. Two distinct
    same-length, same-type patterns tie on the integer score alone, and
    max_by is documented non-deterministic on ties (Spark) / picks its
    own row (DuckDB) — an oracle-compared matched_pattern column must not
    depend on that. Equal key ⇒ equal pattern ⇒ equal rule type (the
    score's allow-bit is part of the key), so the verdict row is unique.
    NULL when the rule does not match (both aggregates skip NULL keys);
    inner concat args are non-NULL by construction, so trap 25 (engine
    NULL-concat divergence) has no surface."""
    s = _score(typ, plen, match)
    return (f"CASE WHEN ({s}) IS NULL THEN NULL ELSE "
            f"concat(lpad(CAST({s} AS STRING), 12, '0'), '|', {pattern}) "
            f"END")


# -- Spark implementation -------------------------------------------------------
def parse_robots(robots: DataFrame, agent: str = DEFAULT_AGENT,
                 host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → the rules applicable to ``agent``:
    (host, rule_type, pattern, like_pat, plen). Windows partition by host
    (bounded: one robots file's lines); group choice per RFC."""
    rules = _group_scoped(robots, ("allow", "disallow"), agent,
                          host_col, txt_col)
    return rules.select(
        "host", "rule_type", "pattern",
        F.expr(_like_pat("pattern")).alias("like_pat"),
        # RFC 9309 §2.2.2 ranks by most OCTETS (UTF-8 bytes), not chars —
        # Spark octet_length == DuckDB strlen; length() would mis-rank any
        # multibyte pattern against an ASCII one
        F.expr("octet_length(pattern)").cast("bigint").alias("plen"))


# Every group-scoped record type (RFC 9309 rules + the de-facto
# crawl-delay extension): ALL of them participate in block formation, in
# both engines, whichever type a caller extracts.
GROUP_RECORD_KEYS = ("allow", "disallow", "crawl-delay")


def _lines(robots: DataFrame, host_col: str, txt_col: str) -> DataFrame:
    """(host, ln, k, v) — every directive line, comment-stripped."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("ln", "line"))
    return lines.select(
        "host", "ln",
        F.expr(_dir_key(_nocmt("line", "spark"), "spark")).alias("k"),
        F.expr(_dir_val(_nocmt("line", "spark"), "spark")).alias("v"))


def _group_scoped(robots: DataFrame, rule_keys: tuple[str, ...],
                  agent: str, host_col: str, txt_col: str) -> DataFrame:
    """Group machinery shared by allow/disallow and crawl-delay scoping.
    Blocks are formed over user-agent lines + EVERY group-record type
    (GROUP_RECORD_KEYS) regardless of which type is being extracted: any
    recognized rule line terminates an agent-line run, so in
    'ua:a / disallow:/x / ua:b / crawl-delay:7' the delay scopes to b
    ONLY (mainstream-parser behavior; extracting crawl-delay with blocks
    formed over delay lines alone would merge a and b and leak b's delay
    to a). Truly-unrecognized directives between two agent lines still do
    not split their group (RFC 9309 "other records MUST NOT interfere").
    Returns (host, bid, rule_type, pattern) for the groups chosen for
    ``agent`` (exact match excludes '*')."""
    a = _check_agent(agent)
    d = _lines(robots, host_col, txt_col)
    d = d.filter(F.col("k").isin("user-agent", *GROUP_RECORD_KEYS))
    w = Window.partitionBy("host").orderBy("ln")
    blocks = (d
              .withColumn("ia", (F.col("k") == "user-agent").cast("int"))
              .withColumn("pia", F.coalesce(F.lag("ia").over(w), F.lit(0)))
              .withColumn("bid", F.sum(
                  ((F.col("ia") == 1) & (F.col("pia") == 0)).cast("int"))
                  .over(w.rowsBetween(Window.unboundedPreceding, 0))))
    agents = (blocks.filter(F.col("ia") == 1)
              .select("host", "bid", F.lower("v").alias("aname")))
    chosen = (agents
              .withColumn("has_spec", F.max(
                  (F.col("aname") == a).cast("int"))
                  .over(Window.partitionBy("host")))
              .filter(((F.col("has_spec") == 1) & (F.col("aname") == a))
                      | ((F.col("has_spec") == 0)
                         & (F.col("aname") == "*")))
              .select("host", "bid").distinct())
    rules = (blocks.filter((F.col("ia") == 0) & (F.col("v") != "")
                           & F.col("k").isin(*rule_keys))
             .select("host", "bid", F.col("k").alias("rule_type"),
                     F.col("v").alias("pattern")))
    return rules.join(chosen, ["host", "bid"], "leftsemi")


_NUM_RX = "^[0-9]+([.][0-9]+)?$"


def crawl_delays(robots: DataFrame, agent: str = DEFAULT_AGENT,
                 host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, crawl_delay): the de-facto Crawl-delay directive, scoped to
    ``agent``'s groups like allow/disallow; non-numeric values ignored,
    several applicable values fold to the MOST conservative (max). Hosts
    without a delay emit no row (frontier code treats absent as
    unthrottled)."""
    d = _group_scoped(robots, ("crawl-delay",), agent, host_col, txt_col)
    num = (f"CASE WHEN pattern RLIKE '{_NUM_RX}' "
           f"THEN CAST(pattern AS DOUBLE) ELSE NULL END")
    return (d.select("host", F.expr(num).alias("delay"))
            .groupBy("host")
            .agg(F.max("delay").alias("crawl_delay"))
            .filter(F.col("crawl_delay").isNotNull()))


def sitemap_urls(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url): Sitemap directives are GLOBAL (not
    group-scoped, per the sitemaps protocol) — one row per directive."""
    d = _lines(robots, host_col, txt_col)
    return (d.filter((F.col("k") == "sitemap") & (F.col("v") != ""))
            .select("host", F.col("v").alias("sitemap_url")))


# -- sitemap XML ---------------------------------------------------------------
_XML_UNESCAPES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&apos;", "'"), ("&amp;", "&")]  # &amp; LAST


def _xml_unescape(x: str) -> str:
    # replace() chain, identical order both engines; &amp; last so
    # double-escaped entities decode one level only, like real parsers
    out = x
    for ent, ch in _XML_UNESCAPES:
        rep = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep}')"
    return out


def parse_sitemap(sitemaps: DataFrame, host_col: str = "host",
                  xml_col: str = "xml") -> DataFrame:
    """Sitemap / sitemap-index XML → (host, kind, loc, lastmod): one row
    per <url> or <sitemap> entry, <loc> entity-unescaped, <lastmod>
    nullable. Regex extraction (RE2-safe lazy blocks, (?s) for multi-line
    entries) — a projection + one explode, zero shuffle."""
    out = []
    for kind in ("url", "sitemap"):
        blocks = (f"regexp_extract_all({xml_col}, "
                  f"'(?s)<{kind}>(.*?)</{kind}>', 1)")
        ent = (f"transform({blocks}, b -> named_struct("
               f"'kind', '{kind}', "
               f"'loc', {_xml_unescape(_sm_field('b', 'loc', 'spark'))}, "
               f"'lastmod', nullif({_sm_field('b', 'lastmod', 'spark')}, "
               f"'')))")
        out.append(ent)
    both = f"concat({out[0]}, {out[1]})"
    return (sitemaps
            .select(F.col(host_col).alias("host"),
                    F.explode(F.expr(both)).alias("e"))
            .select("host", "e.kind", "e.loc", "e.lastmod")
            .filter(F.col("loc") != ""))


def _sm_field(block: str, tag: str, engine: str) -> str:
    return _trim(f"regexp_extract({block}, "
                 f"'(?s)<{tag}>(.*?)</{tag}>', 1)", engine)


def robots_gate(docs: DataFrame, robots: DataFrame,
                agent: str = DEFAULT_AGENT, url_col: str = "url",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc verdict: (doc_id, url, host, allowed, matched_rule,
    matched_pattern). ONE host equi-join + ONE doc-keyed aggregate; docs
    with NULL/unknown hosts or no matching rule are allowed (politeness
    gates fail open, exactly like the blocklist's NULL rule)."""
    from . import urls as ur

    rules = parse_robots(robots, agent=agent)
    pathed = docs.select(
        F.col(id_col), F.col(url_col).alias("url"),
        ur.url_host(url_col).alias("host"),
        F.expr(_path_q(url_col, "spark")).alias("pq"))
    j = pathed.join(rules, "host", "left")
    m = "pq LIKE like_pat ESCAPE '!'"
    return (j.groupBy(id_col)
            .agg(F.min("url").alias("url"),
                 F.min("host").alias("host"),
                 F.expr(f"max_by(rule_type, "
                        f"{_score_key('rule_type', 'plen', m, 'pattern')})")
                 .alias("matched_rule"),
                 F.expr(f"max_by(pattern, "
                        f"{_score_key('rule_type', 'plen', m, 'pattern')})")
                 .alias("matched_pattern"))
            .select(id_col, "url", "host",
                    (F.col("matched_rule").isNull()
                     | (F.col("matched_rule") == "allow"))
                    .alias("allowed"),
                    "matched_rule", "matched_pattern"))


def rules_by_host(robots: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, rules array<struct<like_pat, score, typ>>) — the applicable
    rule set folded per host with the precedence score precomputed
    (2*plen + allow-wins). Hosts-bounded: broadcastable for any realistic
    robots corpus (rules ≪ documents)."""
    return (parse_robots(robots, agent=agent)
            .groupBy("host")
            .agg(F.expr(
                "collect_list(named_struct("
                "'like_pat', like_pat, "
                "'score', CAST(2 * plen + CASE WHEN rule_type = 'allow' "
                "THEN 1 ELSE 0 END AS BIGINT), "
                "'typ', rule_type)) AS rules")))


_VERDICT_EXPR = """
  aggregate(
    filter(coalesce(rules, array()), r -> {pq} LIKE r.like_pat ESCAPE '!'),
    CAST(NULL AS STRUCT<score BIGINT, typ STRING>),
    (acc, r) -> CASE WHEN acc IS NULL OR r.score > acc.score
                THEN named_struct('score', r.score, 'typ', r.typ) ELSE acc END
  ).typ
"""


def robots_gate_inline(docs: DataFrame, robots: DataFrame,
                       agent: str = DEFAULT_AGENT, url_col: str = "url",
                       host_col: str | None = None) -> tuple[DataFrame, "F.Column"]:
    """ZERO-shuffle politeness stage for pipeline composition
    (jobs/web_ingest.py): broadcast the per-host rule arrays, evaluate the
    longest-match fold as a single projected higher-order expression — no
    doc-keyed aggregate, no second consumer of the input (counter
    discipline). Returns (docs + _robots_verdict column, drop_pred);
    caller attaches its Observation between. Verdict semantics are pinned
    equal to robots_gate by test_robots (the oracle-matching twin).
    ``host_col`` reuses an existing host column (web_ingest's annotate
    stage already extracted it) instead of re-deriving one."""
    from pyspark.sql.functions import broadcast

    from . import urls as ur

    rules = rules_by_host(robots, agent=agent)
    host = (F.col(host_col) if host_col is not None
            else ur.url_host(url_col).alias("_rb_host"))
    with_host = docs.withColumn("_rb_host", host) if host_col is None \
        else docs
    join_key = "_rb_host" if host_col is None else host_col
    j = with_host.join(
        broadcast(rules.withColumnRenamed("host", join_key)),
        join_key, "left")
    pq = _path_q(url_col, "spark")
    verdict = F.expr(_VERDICT_EXPR.format(pq=f"({pq})"))
    out = (j.withColumn("_robots_verdict", verdict)
           .drop("rules", *(["_rb_host"] if host_col is None else [])))
    # eqNullSafe: a NULL verdict (no rules / no match / NULL url) means
    # ALLOWED — a bare == would yield NULL and filter(~NULL) silently
    # drops exactly the rows that must fail open (trap 25's cousin)
    drop_pred = F.col("_robots_verdict").eqNullSafe("disallow")
    return out, drop_pred


# -- DuckDB twin ----------------------------------------------------------------
def _duck_lines_cte(robots_table: str, host_col: str,
                    txt_col: str) -> str:
    nocmt = _nocmt("lst[pos]", "duck")
    return f"""
    WITH rl AS (SELECT {host_col} AS host,
                       string_split({txt_col}, chr(10)) AS lst
                FROM {robots_table}),
    ln AS (SELECT host, pos AS ln,
                  {_dir_key(nocmt, 'duck')} AS k,
                  {_dir_val(nocmt, 'duck')} AS v
           FROM rl, unnest(range(1, len(lst) + 1)) t(pos))"""


def _duck_scoped_cte(robots_table: str, agent: str, rule_keys: tuple,
                     host_col: str, txt_col: str) -> str:
    """CTE chain ending in scoped rules ``ru``/chosen groups ``ch`` —
    the DuckDB half of _group_scoped (same group semantics)."""
    a = _check_agent(agent)
    keys = ", ".join(f"'{k}'" for k in ("user-agent",) + GROUP_RECORD_KEYS)
    extract = ", ".join(f"'{k}'" for k in rule_keys)
    return f"""{_duck_lines_cte(robots_table, host_col, txt_col)},
    d AS (SELECT * FROM ln WHERE k IN ({keys})),
    blk AS (SELECT *,
                   CASE WHEN k = 'user-agent' THEN 1 ELSE 0 END AS ia,
                   coalesce(lag(CASE WHEN k = 'user-agent' THEN 1 ELSE 0 END)
                            OVER (PARTITION BY host ORDER BY ln), 0) AS pia
            FROM d),
    bid AS (SELECT *,
                   sum(CASE WHEN ia = 1 AND pia = 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY host ORDER BY ln
                         ROWS UNBOUNDED PRECEDING) AS bid
            FROM blk),
    ag AS (SELECT host, bid, lower(v) AS aname FROM bid WHERE ia = 1),
    ch AS (SELECT DISTINCT host, bid FROM (
             SELECT *, max(CASE WHEN aname = '{a}' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY host) AS has_spec
             FROM ag)
           WHERE (has_spec = 1 AND aname = '{a}')
              OR (has_spec = 0 AND aname = '*')),
    ru AS (SELECT host, bid, k AS rule_type, v AS pattern
           FROM bid WHERE ia = 0 AND v <> '' AND k IN ({extract})),
    scoped AS (SELECT r.* FROM ru r
               SEMI JOIN ch c ON r.host = c.host AND r.bid = c.bid)"""


def parse_robots_sql_duck(robots_table: str, agent: str = DEFAULT_AGENT,
                          host_col: str = "host",
                          txt_col: str = "robots_txt") -> str:
    """Same CTE chain as parse_robots, DuckDB-side; ``robots_table`` is a
    subquery/view with (host, robots_txt)."""
    cte = _duck_scoped_cte(robots_table, agent, ("allow", "disallow"),
                           host_col, txt_col)
    return f"""{cte}
    SELECT host, rule_type, pattern,
           {_like_pat('pattern')} AS like_pat,
           CAST(strlen(pattern) AS BIGINT) AS plen
    FROM scoped"""


def crawl_delays_sql_duck(robots_table: str, agent: str = DEFAULT_AGENT,
                          host_col: str = "host",
                          txt_col: str = "robots_txt") -> str:
    cte = _duck_scoped_cte(robots_table, agent, ("crawl-delay",),
                           host_col, txt_col)
    num = (f"CASE WHEN regexp_matches(pattern, '{_NUM_RX}') "
           f"THEN CAST(pattern AS DOUBLE) ELSE NULL END")
    return f"""{cte}
    SELECT host, max({num}) AS crawl_delay
    FROM scoped GROUP BY host
    HAVING max({num}) IS NOT NULL"""


def sitemap_urls_sql_duck(robots_table: str, host_col: str = "host",
                          txt_col: str = "robots_txt") -> str:
    cte = _duck_lines_cte(robots_table, host_col, txt_col)
    return f"""{cte}
    SELECT host, v AS sitemap_url FROM ln
    WHERE k = 'sitemap' AND v <> ''"""


def parse_sitemap_sql_duck(sitemaps_table: str, host_col: str = "host",
                           xml_col: str = "xml") -> str:
    """DuckDB twin of parse_sitemap — same lazy (?s) block regexes, same
    trim charset, same entity-unescape replace chain."""
    legs = []
    for kind in ("url", "sitemap"):
        legs.append(
            f"SELECT {host_col} AS host, '{kind}' AS kind, "
            f"unnest(regexp_extract_all({xml_col}, "
            f"'(?s)<{kind}>(.*?)</{kind}>', 1)) AS b "
            f"FROM {sitemaps_table}")
    both = " UNION ALL ".join(legs)
    return f"""
    WITH blk AS ({both}),
    ent AS (SELECT host, kind,
                   {_xml_unescape(_sm_field('b', 'loc', 'duck'))} AS loc,
                   nullif({_sm_field('b', 'lastmod', 'duck')}, '')
                     AS lastmod
            FROM blk)
    SELECT host, kind, loc, lastmod FROM ent WHERE loc <> ''"""


def robots_gate_sql_duck(docs_table: str, robots_table: str,
                         agent: str = DEFAULT_AGENT, url_col: str = "url",
                         id_col: str = "doc_id") -> str:
    from . import urls as ur

    m = "pq LIKE like_pat ESCAPE '!'"
    return f"""
    WITH rules AS ({parse_robots_sql_duck(robots_table, agent)}),
    pathed AS (SELECT {id_col}, {url_col} AS url,
                      {ur.url_host_sql_duck(url_col)} AS host,
                      {_path_q(url_col, 'duck')} AS pq
               FROM {docs_table}),
    j AS (SELECT p.*, r.rule_type, r.pattern, r.like_pat, r.plen
          FROM pathed p LEFT JOIN rules r ON p.host = r.host),
    agg AS (SELECT {id_col}, min(url) AS url, min(host) AS host,
                   arg_max(rule_type, {_score_key('rule_type', 'plen', m, 'pattern')})
                     AS matched_rule,
                   arg_max(pattern, {_score_key('rule_type', 'plen', m, 'pattern')})
                     AS matched_pattern
            FROM j GROUP BY {id_col})
    SELECT {id_col}, url, host,
           (matched_rule IS NULL OR matched_rule = 'allow') AS allowed,
           matched_rule, matched_pattern
    FROM agg"""


# -- deterministic fixtures ------------------------------------------------------
def sitemap_fixture_sql(host_col: str = "host") -> str:
    """Engine-NEUTRAL sitemap XML synthesized from a host column: an
    entity-escaped whitespace-padded <url> with lastmod, a bare <url>, an
    empty <loc> (must be dropped), and on every third host a <sitemap>
    index entry. NULL host → NULL xml (trap 25 concat guard)."""
    d = (f"CAST(coalesce(nullif(regexp_extract({host_col}, '([0-9]+)', 1), "
         f"''), '0') AS BIGINT)")
    nl = "chr(10)"
    idx = (f"CASE WHEN {d} % 3 = 0 THEN "
           f"'<sitemap>' || {nl} || '  <loc>https://' || {host_col} || "
           f"'/sitemap-news.xml</loc>' || {nl} || "
           f"'  <lastmod>2026-01-15</lastmod>' || {nl} || "
           f"'</sitemap>' || {nl} ELSE '' END")
    return (f"CASE WHEN {host_col} IS NULL THEN NULL ELSE "
            f"'<?xml version=\"1.0\"?>' || {nl} || "
            f"'<urlset>' || {nl} || "
            f"'<url>' || {nl} || "
            f"'  <loc> https://' || {host_col} || "
            f"'/p?a=1&amp;b=2 </loc>' || {nl} || "
            f"'  <lastmod>2026-02-0' || CAST({d} % 9 + 1 AS STRING) || "
            f"'</lastmod>' || {nl} || "
            f"'</url>' || {nl} || "
            f"'<url><loc>https://' || {host_col} || '/plain</loc></url>' "
            f"|| {nl} || "
            f"'<url><loc></loc></url>' || {nl} || "
            f"{idx} || '</urlset>' END")


def robots_fixture_sql(host_col: str = "host") -> str:
    """Engine-NEUTRAL robots.txt synthesized from a host column: hosts
    whose digits ≡ 0 (mod 3) carry a trainbot-specific group (which then
    EXCLUDES the '*' group per RFC); all hosts carry a '*' group with
    prefix / wildcard / anchored rules plus an ignored unknown directive
    and a comment. NULL host → NULL robots (trap 25 concat guard)."""
    # nullif/coalesce: CAST('' AS BIGINT) errors under ANSI — digit-less
    # hosts fall to 0 identically in both engines
    d = (f"CAST(coalesce(nullif(regexp_extract({host_col}, '([0-9]+)', 1), "
         f"''), '0') AS BIGINT)")
    nl = "chr(10)"
    spec = (f"CASE WHEN {d} % 3 = 0 THEN "
            f"'User-agent: trainbot' || {nl} || "
            f"'Disallow: /a/p1*' || {nl} || "
            f"'Allow: /a/p1$' || {nl} || "
            f"'Crawl-delay: 1.5' || {nl} || "
            f"'Disallow: /a/p4' || {nl} ELSE '' END")
    return (f"CASE WHEN {host_col} IS NULL THEN NULL ELSE "
            f"'# fixture robots' || {nl} || "
            f"'Sitemap: https://' || {host_col} || '/sitemap.xml' || {nl} "
            f"|| {spec} || "
            f"'User-agent: otherbot' || {nl} || "
            f"'Disallow: /' || {nl} || "
            f"'User-agent: *' || {nl} || "
            f"'Disallow: /a/p2$' || {nl} || "
            f"'Disallow: /a/p3' || {nl} || "
            f"'Allow: /a/p33*' || {nl} || "
            f"'Crawl-delay: fast' || {nl} || "
            f"'Crawl-delay: 3' END")
