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
3. replace BLOCK-level tags (p/div/br/h1-6/li/tr/table/...) with a
   NEWLINE — this is what makes the output line-grain real, so the
   downstream line-level boilerplate dedup (corpus.line_dedup_grouped,
   the CCNet pass) has lines to work on; a flat everything-to-space
   strip would collapse each page to one line and blind that stage;
4. replace every remaining tag ``<[^>]*>`` with a SPACE (not '': inline
   tags separate words — ``a<i>b</i>`` must not fuse into ``ab``);
5. decode the six core character entities via LITERAL replace (no regex):
   &lt; &gt; &quot; &#39; &apos; &nbsp;, then &amp; LAST (decoding amp
   first would double-decode ``&amp;lt;`` → ``<``). Numeric/exotic
   entities beyond these stay verbatim — documented scope, same in both
   engines;
6. collapse NON-newline whitespace runs to one space (the text.py WS
   class minus ``\\n`` — spelled out because RE2's ``\\s`` lacks
   vertical tab), strip spaces around newlines, collapse newline runs
   to one, strip leading/trailing newlines, trim.

NULL text → NULL out in both engines (every step NULL-propagates).

Escaping note: the STRUCTURAL patterns (script/style/comment/tag) are
backslash-free, so trap 24 has no surface there. The whitespace/boundary
patterns use regex-level escapes (``\\t`` ``\\n`` ``\\x0B`` ``\\b``) that
java.util.regex and RE2 interpret identically; they reach Java via the
Column API (no SQL-literal layer) and DuckDB verbatim inside a literal —
the same two-context discipline as functions/text.py WS.

Shape at scale: pure projection — whole-stage codegen, rides the scan,
no shuffle, no Python. The chained regexp_replace passes are each one
linear scan of the string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: script/style/comment blocks BEFORE the block/tag strips
# (the generic rules would eat '<script>' itself and leave its body
# behind), block tags before the generic tag rule (which would turn them
# into spaces).
# The tag NAME must end after 'script'/'style': without the guard,
# '<script-loader>' (custom elements always contain '-') would open a
# script block that swallows all visible text up to the next REAL
# </script> — silent page-body loss. \b is NOT enough ('-' is a
# non-word char, so t|- IS a boundary) and RE2 (the DuckDB twin) has no
# lookahead, so the portable spelling is an alternation: bare '>' or a
# non-tag-name char then attributes.
SCRIPT_RX = "(?is)<script(|[^a-z0-9>-][^>]*)>.*?</script>"
STYLE_RX = "(?is)<style(|[^a-z0-9>-][^>]*)>.*?</style>"
COMMENT_RX = "(?s)<!--.*?-->"
# \b keeps '<p ...>' from also matching '<param ...>' (ASCII word
# boundary — same semantics in java.util.regex and RE2; RE2 has no
# lookahead, so the boundary is the portable spelling).
BLOCK_TAG_RX = (r"(?i)</?(p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|"
                r"table|thead|tbody|blockquote|section|article|header|"
                r"footer|nav|pre|form|hr|fieldset|address|center)\b[^>]*>")
TAG_RX = "<[^>]*>"
# text.py's WS class minus \n (newlines are now structure, not noise).
SP_RUN = r"[ \t\x0B\f\r]+"
NL_TRIM = r"[ \t\x0B\f\r]*\n[ \t\x0B\f\r]*"
NL_RUN = r"\n+"
NL_EDGE = r"^\n+|\n+$"

# literal (non-regex) entity decodes; &amp; strictly last.
ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
]


# (pattern, replacement) — ONE ordered recipe both engines consume.
_REGEX_STEPS = [
    (SCRIPT_RX, " "), (STYLE_RX, " "), (COMMENT_RX, " "),
    (BLOCK_TAG_RX, "\n"), (TAG_RX, " "),
]
_WS_STEPS = [(SP_RUN, " "), (NL_TRIM, "\n"), (NL_RUN, "\n"), (NL_EDGE, "")]


def strip_html(col: str = "html") -> Column:
    """Visible line-structured text of an HTML document per the module
    recipe."""
    out = F.col(col)
    for rx, rep in _REGEX_STEPS:
        out = F.regexp_replace(out, rx, rep)
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    for rx, rep in _WS_STEPS:
        out = F.regexp_replace(out, rx, rep)
    return F.trim(out)


def strip_html_sql_duck(col: str = "html") -> str:
    """DuckDB twin — same patterns, same order; 'g' flag per the
    replace-all divergence (functions/text.py module doc); quotes in
    literals doubled for the SQL string; the '\\n' REPLACEMENT is spelled
    chr(10) (replacement strings, unlike patterns, are NOT regex-decoded
    by DuckDB — a literal '\\n' replacement writes backslash-n)."""
    out = col
    nl = "chr(10)"
    for rx, rep in _REGEX_STEPS + _WS_STEPS:
        r = nl if rep == "\n" else f"'{rep}'"
        out = f"regexp_replace({out}, '{rx}', {r}, 'g')"
        if rx is TAG_RX:
            for ent, ch in ENTITIES:
                e = ent.replace("'", "''")
                c = ch.replace("'", "''")
                out = f"replace({out}, '{e}', '{c}')"
    return f"trim({out}, ' ')"


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
