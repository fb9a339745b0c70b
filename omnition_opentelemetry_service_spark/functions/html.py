"""HTML → text extraction: the FIRST content stage of a crawl-fed
training pipeline (CCNet/C4/RefinedWeb all begin by reducing fetched HTML
to visible text before any quality/dedup pass). Reference analog: the
collector's receiver-side decode branches (functions/parse.py maps those);
this is the same decode idea applied to the web-document payload.

Recipe (ONE definition per rule; both engines consume the same pattern
strings — every pattern is deliberately BACKSLASH-FREE, so PARITY.md
trap 24 — engine-divergent escape handling in SQL literals — has no
surface at all):

1. drop ``<script ...>...</script>`` and ``<style ...>...</style>``
   blocks case-insensitively, dot-matches-newline, NON-greedy
   (``(?is)`` inline flags parse identically in java.util.regex and
   RE2); an UNCLOSED script/style tag doesn't match and degrades to
   tag-stripping its markup (disclosed, not silent: content of a
   malformed block survives as text — the conservative direction for a
   data pipeline is keeping bytes, not guessing at dropping them);
2. drop HTML comments ``<!-- ... -->`` (non-greedy, dotall);
3. replace every remaining tag ``<[^>]*>`` with a SPACE (not '': tags
   separate words — ``a</p><p>b`` must not fuse into ``ab``);
4. decode the six core character entities via LITERAL replace (no regex):
   &lt; &gt; &quot; &#39; &apos; &nbsp;, then &amp; LAST (decoding amp
   first would double-decode ``&amp;lt;`` → ``<``). Numeric/exotic
   entities beyond these stay verbatim — documented scope, same in both
   engines;
5. collapse whitespace runs to one space (the shared WS class from
   functions/text.py — spelled-out Java ``\\s`` set, because RE2's \\s
   lacks vertical tab) and trim.

NULL text → NULL out in both engines (every step NULL-propagates).

Shape at scale: pure projection — whole-stage codegen, rides the scan,
no shuffle, no Python. The chained regexp_replace passes are each one
linear scan of the string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import WS, WS_SQL_DUCK

# backslash-free by construction (see module doc). Order matters:
# script/style/comment blocks BEFORE the generic tag strip (the generic
# rule would eat '<script>' itself and leave its body behind).
SCRIPT_RX = "(?is)<script[^>]*>.*?</script>"
STYLE_RX = "(?is)<style[^>]*>.*?</style>"
COMMENT_RX = "(?s)<!--.*?-->"
TAG_RX = "<[^>]*>"

# literal (non-regex) entity decodes; &amp; strictly last.
ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: str = "html") -> Column:
    """Visible text of an HTML document per the module recipe."""
    out = F.col(col)
    for rx in (SCRIPT_RX, STYLE_RX, COMMENT_RX, TAG_RX):
        out = F.regexp_replace(out, rx, " ")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, WS, " "))


def strip_html_sql_duck(col: str = "html") -> str:
    """DuckDB twin — same patterns, same order; 'g' flag per the
    replace-all divergence (functions/text.py module doc); quotes in
    literals doubled for the SQL string."""
    out = col
    for rx in (SCRIPT_RX, STYLE_RX, COMMENT_RX, TAG_RX):
        out = f"regexp_replace({out}, '{rx}', ' ', 'g')"
    for ent, ch in ENTITIES:
        e = ent.replace("'", "''")
        c = ch.replace("'", "''")
        out = f"replace({out}, '{e}', '{c}')"
    return f"trim(regexp_replace({out}, '{WS_SQL_DUCK}', ' ', 'g'))"


def html_fixture_sql(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Engine-NEUTRAL SQL wrapping a plain-text corpus in deterministic
    HTML (documents carries no html column): head with title/style/script
    (the script body contains '<', '&&' and an entity-looking '&amp;lt;'
    to exercise rules 1 and 4's ordering), a comment, block tags around
    the text, a self-closing tag, attribute-carrying tags, and a footer
    with decodable entities plus one OUT-of-scope entity (&copy;) that
    must survive verbatim. concat with no NULL literals: a NULL text
    yields NULL html in Spark; DuckDB's concat would ignore the NULL arg
    (trap 25), so the CASE guard pins NULL html in both engines."""
    h = (
        f"concat('<!DOCTYPE html><html><head><title>Doc ', "
        f"CAST({id_col} AS STRING), "
        f"'</title><style type=\"text/css\">p {{color: red}}</style>"
        f"<SCRIPT>if (a<b && c) {{ x = \"&amp;lt;\"; }}</SCRIPT>"
        f"</head><body><!-- nav <b>bar</b> --><h1>Doc ', "
        f"CAST({id_col} AS STRING), '</h1><p class=\"body\">', "
        f"{text_col}, '</p><br/><div id=\"f\">&quot;T&#39;s&quot; "
        f"&lt;tag&gt;&nbsp;&amp; more &copy; 2026</div></body></html>')"
    )
    return (f"CASE WHEN {text_col} IS NULL THEN CAST(NULL AS STRING) "
            f"ELSE {h} END")
