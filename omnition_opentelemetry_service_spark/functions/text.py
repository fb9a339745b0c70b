"""Text-analysis functions for the training-data pipeline (documents table):
language-ID heuristic, quality scoring, token counting, fingerprinting,
character shingles. All JVM-side built-ins (whole-stage codegen); each ships
a DuckDB-parity SQL fragment for the oracle harness.

Caveat encoded here once: Spark's regexp_replace replaces ALL matches;
DuckDB's replaces the FIRST unless passed the 'g' flag — every Duck fragment
below passes 'g'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "ein"],
}

PUNCT_CLASS = r"[.,;:!?]"
# Whitespace, spelled out as Java's \s set ([ \t\n\x0B\f\r]): RE2 (DuckDB)
# omits \x0B from its \s, so every twin pair written with a bare '\s'
# silently diverges on vertical-tab text. ONE definition, three quotings:
# WS for the Python Column API (Java regex reads the \t escapes),
# WS_SQL_SPARK for F.expr SQL text (the SQL parser eats one backslash
# level), WS_SQL_DUCK for DuckDB SQL literals (passed through verbatim).
WS_CHARS = r" \t\n\x0B\f\r"
WS = f"[{WS_CHARS}]+"
WS_SQL_SPARK = WS.replace("\\", "\\\\")
WS_SQL_DUCK = WS

# Astral (supplementary-plane) codepoints — same \x{...} range syntax in
# java.util.regex and RE2; the Spark variant is double-escaped for F.expr.
ASTRAL_RX = r"[\x{10000}-\x{10FFFF}]"
ASTRAL_RX_SPARK = ASTRAL_RX.replace("\\", "\\\\")
ASTRAL_RX_DUCK = ASTRAL_RX


# -- token counting ---------------------------------------------------------
def token_count(col: str = "text") -> Column:
    """Whitespace token count: non-empty split elements, so blank and
    whitespace-ONLY text (tabs/newlines included — trim strips only
    0x20) count 0, and edge whitespace adds nothing. NULL text → NULL
    (the quarantine convention; size(filter(NULL)) is NULL)."""
    return F.size(F.filter(F.split(F.col(col), WS),
                           lambda w: F.length(w) > 0))


def token_count_sql_duck(col: str = "text") -> str:
    return (
        f"len(list_filter(string_split_regex({col}, '{WS_SQL_DUCK}'), "
        f"w -> len(w) > 0))"
    )


# -- BPE-ish subword estimate ----------------------------------------------
# THE segmentation pattern (shared with operators/tokenize.py): words |
# digit runs | single non-space symbol. The whitespace class is EXPLICIT,
# not '\s': Java's \s is [ \t\n\x0B\f\r] while RE2's omits \x0B (vertical
# tab) — with '\s' in both engines a VT character silently becomes a piece
# in DuckDB but not in Spark (the identical-character-classes rule).
PIECE_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def bpe_token_estimate(col: str = "text") -> Column:
    """Regex-segmented subword count (GPT-2-style pre-tokenizer shape:
    words, numbers, punctuation runs)."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(PIECE_RX), 0))


def bpe_token_estimate_sql_duck(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{PIECE_RX}'))"


# -- quality scoring ---------------------------------------------------------
def punct_ratio(col: str = "text") -> Column:
    t = F.col(col)
    removed = F.regexp_replace(t, PUNCT_CLASS, "")
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        (F.length(t) - F.length(removed)) / F.length(t)
    )


def punct_ratio_sql_duck(col: str = "text") -> str:
    return (
        f"CASE WHEN len({col}) = 0 THEN 0.0 ELSE "
        f"(len({col}) - len(regexp_replace({col}, '[.,;:!?]', '', 'g'))) "
        f"* 1.0 / len({col}) END"
    )


def stopword_count(col: str = "text", lang: str = "en") -> Column:
    words = F.split(lower_fold(F.trim(F.col(col))), WS)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def stopword_count_sql_duck(col: str = "text", lang: str = "en") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split_regex("
        f"{lower_fold_sql_duck(trim_sql_duck(col))}, '{WS_SQL_DUCK}'), "
        f"w -> list_contains([{lst}], w)))"
    )


def quality_score(col: str = "text") -> Column:
    """Deterministic [0,1] quality proxy: length band + low punct + stopword
    presence. Round to 6 dp so float formatting matches across engines."""
    n = token_count(col)
    length_ok = F.when((n >= 5) & (n <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ratio = F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(col) / n)
    sw_ok = F.when(sw_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + punct_ok + sw_ok, 6)


def quality_score_sql_duck(col: str = "text") -> str:
    # CASE over bare 0.4/0.3 literals would be DECIMAL in DuckDB (vs Spark's
    # DOUBLE) — cast the whole thing to DOUBLE for type + hash parity.
    n = token_count_sql_duck(col)
    return (
        f"CAST(round((CASE WHEN ({n}) BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END) + "
        f"(CASE WHEN ({punct_ratio_sql_duck(col)}) <= 0.2 THEN 0.3 ELSE 0.0 END) + "
        f"(CASE WHEN ({n}) > 0 AND "
        f"({stopword_count_sql_duck(col)}) * 1.0 / ({n}) >= 0.05 "
        f"THEN 0.3 ELSE 0.0 END), 6) AS DOUBLE)"
    )


# -- language identification --------------------------------------------------
def lang_id(col: str = "text") -> Column:
    """Stopword-vote n-gram-free heuristic; deterministic tie-break en>es>fr>de;
    'und' (undetermined) when no stopwords hit."""
    c = {lang: stopword_count(col, lang) for lang in STOPWORDS}
    best = F.greatest(*c.values())
    # NULL text first: every stopword count is NULL, so all whens skip
    # and the bare .otherwise would label a fetch-failed doc 'de'
    return (
        F.when(F.col(col).isNull(), F.lit(None).cast("string"))
        .when(best == 0, F.lit("und"))
        .when(c["en"] == best, F.lit("en"))
        .when(c["es"] == best, F.lit("es"))
        .when(c["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def lang_id_sql_duck(col: str = "text") -> str:
    c = {lang: stopword_count_sql_duck(col, lang) for lang in STOPWORDS}
    return (
        f"CASE WHEN {col} IS NULL THEN CAST(NULL AS VARCHAR) "
        f"WHEN greatest({c['en']}, {c['es']}, {c['fr']}, {c['de']}) = 0 THEN 'und' "
        f"WHEN ({c['en']}) = greatest({c['en']}, {c['es']}, {c['fr']}, {c['de']}) THEN 'en' "
        f"WHEN ({c['es']}) = greatest({c['es']}, {c['fr']}, {c['de']}) THEN 'es' "
        f"WHEN ({c['fr']}) = greatest({c['fr']}, {c['de']}) THEN 'fr' "
        f"ELSE 'de' END"
    )


# -- case-fold normalization ---------------------------------------------------
# Java/Python lowercase applies SpecialCasing (\u0130 = İ → i + U+0307) and
# the FINAL-SIGMA context rule (word-final Σ → ς); DuckDB's lower() applies
# simple one-to-one mappings only. On top of that, the JVM's Unicode tables
# are NEWER than DuckDB's utf8proc: a full BMP + plane-1 sweep (every
# codepoint in bare / word-final / mid-word contexts, Spark vs DuckDB) found
# exactly 70 codepoints the JVM lowercases and utf8proc leaves unchanged
# (U+1C89, U+2C2F, the U+A7Cx/A7Dx Latin additions, Vithkuqi U+10570-95,
# Garay U+10D50-65). Fold ALL divergences explicitly so normalized text is
# byte-identical across engines on every input:
#  * pre-expand İ on the DuckDB side (Java already emits i + U+0307),
#  * map every ς to σ on BOTH sides (covers the final-sigma context rule
#    AND literal ς in the input),
#  * apply the 70-entry Unicode-skew cap→lower table on the DuckDB side
#    (and after .lower() in any Python twin — CPython 3.11 knows some but
#    not all of them; post-lower application makes that irrelevant).
# The table was derived EMPIRICALLY (tools/case_skew_sweep.py re-derives
# it); if the sandbox's JVM or DuckDB ever changes, re-run the sweep.
CASE_SKEW_CAPS = "\u1c89\u2c2f\ua7c0\ua7c7\ua7c9\ua7cb\ua7cc\ua7d0\ua7d6\ua7d8\ua7da\ua7dc\ua7f5\U00010570\U00010571\U00010572\U00010573\U00010574\U00010575\U00010576\U00010577\U00010578\U00010579\U0001057a\U0001057c\U0001057d\U0001057e\U0001057f\U00010580\U00010581\U00010582\U00010583\U00010584\U00010585\U00010586\U00010587\U00010588\U00010589\U0001058a\U0001058c\U0001058d\U0001058e\U0001058f\U00010590\U00010591\U00010592\U00010594\U00010595\U00010d50\U00010d51\U00010d52\U00010d53\U00010d54\U00010d55\U00010d56\U00010d57\U00010d58\U00010d59\U00010d5a\U00010d5b\U00010d5c\U00010d5d\U00010d5e\U00010d5f\U00010d60\U00010d61\U00010d62\U00010d63\U00010d64\U00010d65"
CASE_SKEW_LOWS = "\u1c8a\u2c5f\ua7c1\ua7c8\ua7ca\u0264\ua7cd\ua7d1\ua7d7\ua7d9\ua7db\u019b\ua7f6\U00010597\U00010598\U00010599\U0001059a\U0001059b\U0001059c\U0001059d\U0001059e\U0001059f\U000105a0\U000105a1\U000105a3\U000105a4\U000105a5\U000105a6\U000105a7\U000105a8\U000105a9\U000105aa\U000105ab\U000105ac\U000105ad\U000105ae\U000105af\U000105b0\U000105b1\U000105b3\U000105b4\U000105b5\U000105b6\U000105b7\U000105b8\U000105b9\U000105bb\U000105bc\U00010d70\U00010d71\U00010d72\U00010d73\U00010d74\U00010d75\U00010d76\U00010d77\U00010d78\U00010d79\U00010d7a\U00010d7b\U00010d7c\U00010d7d\U00010d7e\U00010d7f\U00010d80\U00010d81\U00010d82\U00010d83\U00010d84\U00010d85"
_PY_SKEW = str.maketrans(CASE_SKEW_CAPS, CASE_SKEW_LOWS)


def lower_fold(col: Column) -> Column:
    return F.translate(F.lower(col), "\u03c2", "\u03c3")


def lower_fold_sql_spark(inner: str) -> str:
    return f"translate(lower({inner}), '\u03c2', '\u03c3')"


def lower_fold_sql_duck(inner: str) -> str:
    return (
        f"translate(lower(replace({inner}, '\u0130', 'i\u0307')), "
        f"'{CASE_SKEW_CAPS}\u03c2', '{CASE_SKEW_LOWS}\u03c3')"
    )


def lower_fold_py(s: str) -> str:
    """Python twin of the JVM-side lower_fold — for pandas kernels."""
    return s.lower().translate(_PY_SKEW).replace("\u03c2", "\u03c3")


# DuckDB's bare trim() strips ALL Unicode whitespace (NBSP, U+2000…); Java's
# strips only ASCII space — pin space-only semantics in every Duck twin.
def trim_sql_duck(inner: str) -> str:
    return f"trim({inner}, ' ')"


# -- fingerprinting ------------------------------------------------------------
def fingerprint(col: str = "text") -> Column:
    """Whitespace-normalized case-folded md5 — the exact-dup document key."""
    return F.md5(lower_fold(F.trim(F.regexp_replace(F.col(col), WS, " "))))


def fingerprint_sql_duck(col: str = "text") -> str:
    inner = trim_sql_duck(f"regexp_replace({col}, '{WS_SQL_DUCK}', ' ', 'g')")
    return f"md5({lower_fold_sql_duck(inner)})"


# -- shingling (minhash / jaccard input) ---------------------------------------
def char_shingles(col: str = "text", k: int = 5) -> Column:
    """Distinct k-char shingles of the normalized text; texts shorter than k
    contribute a single whole-text shingle (so every doc gets a signature)."""
    return F.array_distinct(_shingles_expr(col, k))


def _norm_grams_sql(col: str, k: int) -> str:
    """THE normalized overlapping-k-gram SQL — one definition, used by both
    the shingle path and the winnowing fingerprint path (a fix applied to
    one copy must reach both; the DOTALL subtlety below bit exactly once).

    Overlapping grams via a zero-width-lookahead regex: ONE pass over the
    normalized text. The transform(sequence(...), j -> substring(norm, ...))
    formulation re-evaluates `norm` (a regexp_replace) once PER GRAM —
    O(len²) regex work per document; at ~200 grams/doc that was ~25s for 5k
    docs vs <2s for this form. Same output values.
    (?s) DOTALL: Java '.' excludes U+0085/U+2028/U+2029 which the '\\s+'
    normalization does NOT remove — without DOTALL, grams spanning those
    characters are silently dropped, diverging from the oracle's substring
    semantics (which has no such exclusion).

    Astral chars (U+10000+) fold to U+FFFD FIRST, on BOTH engines: Java's
    regex engine iterates lookahead match positions by UTF-16 CODE UNIT, so
    a surrogate pair also yields a bogus gram starting mid-pair whose lone
    surrogate is '?'-mangled at extraction — unrecoverable downstream (it
    is byte-identical to a legit '?'-led gram). The symmetric pre-fold
    keeps the one-pass regex form (measured 2× faster than codepoint-array
    slicing) at the cost of collapsing astral distinctions inside the
    similarity signature — negligible for dedup."""
    pre = f"regexp_replace({col}, '{ASTRAL_RX_SPARK}', '�')"
    norm = lower_fold_sql_spark(
        f"trim(regexp_replace({pre}, '{WS_SQL_SPARK}', ' '))")
    return (
        f"CASE WHEN length({norm}) < {k} THEN array({norm}) "
        f"ELSE regexp_extract_all({norm}, '(?s)(?=(.{{{k}}}))', 1) END"
    )


def _shingles_expr(col: str, k: int) -> Column:
    return F.expr(_norm_grams_sql(col, k))


def char_shingles_sql_duck(col: str = "text", k: int = 5) -> str:
    pre = f"regexp_replace({col}, '{ASTRAL_RX_DUCK}', '�', 'g')"
    norm = lower_fold_sql_duck(
        trim_sql_duck(f"regexp_replace({pre}, '{WS_SQL_DUCK}', ' ', 'g')"))
    return (
        f"list_distinct(CASE WHEN len({norm}) < {k} THEN [{norm}] "
        f"ELSE list_transform(range(len({norm}) - {k} + 1), "
        f"j -> substr({norm}, CAST(j + 1 AS INTEGER), {k})) END)"
    )


# -- PII scrubbing --------------------------------------------------------------
# The redaction pass every training-data release runs before packing. Regexes
# are RE2-safe (no lookaround/backrefs) so the SAME pattern runs in Spark
# (java.util.regex) and DuckDB (RE2) — the cross-engine parity contract.
# Order matters: emails first (their local part contains digit runs the
# phone pattern would eat), then IPs (dotted digit runs the phone pattern
# also matches), then phones.
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Phone shape: ≥9 digits (dates have 8 — '2026-01-01' must NOT redact),
# ≤15 (E.164 max), at most TWO of [ ().-] between digits ('1 (415' has the
# two-char ' (' gap; the old [\d\s().-]{7,} run matched ISO dates outright
# and its \s let a match span newlines, joining unrelated digit runs into
# one <PHONE>). Lookaround is unavailable (DuckDB is RE2), so this stays a
# digit-count heuristic: a date immediately followed by more digits
# ('2026-01-01 10...') still redacts — over-redaction is the safe
# direction for a PII pass.
PII_PHONE_RX = r"\+?\d(?:[ ().-]{0,2}\d){8,14}"


def scrub_pii(col: str = "text") -> Column:
    """Redact emails → <EMAIL>, IPv4s → <IP>, phone-shaped digit runs →
    <PHONE>. Three chained regexp_replace calls — expression-level,
    whole-stage codegen, one pass each."""
    out = F.regexp_replace(F.col(col), PII_EMAIL_RX, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP_RX, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RX, "<PHONE>")


def scrub_pii_sql_duck(col: str = "text") -> str:
    return (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'{PII_EMAIL_RX}', '<EMAIL>', 'g'), "
        f"'{PII_IP_RX}', '<IP>', 'g'), "
        f"'{PII_PHONE_RX}', '<PHONE>', 'g')"
    )


# -- winnowing (rolling-hash document fingerprints) ----------------------------
def winnowing_fingerprints(col: str = "text", k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the standard local document-fingerprinting algorithm): hash every
    overlapping k-gram, then keep the MINIMUM hash of each sliding window
    of ``w`` consecutive k-gram hashes; the distinct minima are the
    document's fingerprints.

    Guarantee: any shared substring of length ≥ k + w − 1 between two
    documents yields at least one shared fingerprint — edit-robust partial-
    duplicate detection, unlike the whole-document md5 (fingerprint()).

    All expression-level: the k-gram hash array is computed ONCE (transform
    as the windowing input — the CollapseProject re-evaluation trap), the
    window minima via transform(sequence)+slice+array_min over the
    precomputed array. ~w array reads per position, no Python, no shuffle.
    """
    return F.expr(_winnowing_sql(col, k, w))


def _winnowing_sql(col: str, k: int, w: int) -> str:
    grams = _norm_grams_sql(col, k)  # the ONE gram definition (see its doc)
    # hash each k-gram once: first 8 md5 hex chars → bigint
    hashes = (f"transform({grams}, "
              f"g -> CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT))")
    # Bind the hash array ONCE via a lambda variable (transform over a
    # 1-element wrapper): interpolating {hashes} into each of its four use
    # sites would re-run the whole md5 pass per site (the CollapseProject
    # re-evaluation trap). Then: windows of w consecutive hashes → min per
    # window → distinct.
    return (
        f"transform(array({hashes}), hs -> "
        f"array_distinct(CASE WHEN size(hs) <= {w} "
        f"THEN array(array_min(hs)) "
        f"ELSE transform(sequence(1, size(hs) - {w} + 1), "
        f"j -> array_min(slice(hs, j, {w}))) END))[0]"
    )


# -- invisible-character stripping ----------------------------------------------
# The pre-tokenization hygiene strip (the ftfy-lite stage CCNet-style
# pipelines run before anything hashes or shingles text): C0 controls
# except the whitespace class (\t \n \x0B \x0C \r stay — they are WS_CHARS
# members and downstream tokenization owns them), DEL + C1 controls, soft
# hyphen, zero-width + joiners, bidi embedding/override marks and isolates,
# and the BOM. ONE pattern string shared verbatim by both engines: the
# \x{...} hex-class syntax parses identically in java.util.regex and RE2,
# and contains no quote/backslash that survives into a SQL literal
# divergently (trap 3 has no surface — the Column API takes it raw and the
# Duck fragment embeds it unchanged).
INVISIBLE_RX = (
    "[\\x{0000}-\\x{0008}\\x{000E}-\\x{001F}\\x{007F}-\\x{009F}"
    "\\x{00AD}\\x{200B}-\\x{200F}\\x{202A}-\\x{202E}"
    "\\x{2060}-\\x{2064}\\x{2066}-\\x{2069}\\x{FEFF}]"
)


def strip_invisible(col: str = "text") -> Column:
    """Remove control/format characters that carry no text content (see
    INVISIBLE_RX). Pure expression — whole-stage codegen, zero shuffle."""
    return F.regexp_replace(F.col(col), INVISIBLE_RX, "")


def strip_invisible_sql_duck(col: str = "text") -> str:
    return f"regexp_replace({col}, '{INVISIBLE_RX}', '', 'g')"


# -- character-entropy quality signal ------------------------------------------
# Shannon entropy (bits/char) of the character distribution — the classic
# gibberish/boilerplate detector (near-0 = repeated filler, high = random
# blobs; natural text sits in a band). ONE definition per engine, built
# from the identity H = ln(n)/ln(2) - (Σ c·ln c)/(n·ln 2).
#
# Float-fold discipline (PARITY trap 11): the Σ folds over terms sorted BY
# VALUE (array_sort on DOUBLEs — identical ASC semantics in both engines),
# NOT by character: string collation differs between UTF-16 code-unit
# order (Spark) and UTF-8 byte order (DuckDB) for astral-vs-BMP mixes,
# while equal double terms are order-indifferent to the sum by identity.
# ln parity between engines is the lm.py precedent (same double-op order).
#
# Scale shape: pure projection, zero shuffle; per-row cost is
# O(alphabet · len) from the count-per-distinct-char filter — alphabet is
# bounded (≤ distinct chars in a doc), so the term stays scan-shaped at
# any corpus size. Empty/NULL text → NULL (no distribution to measure).
_ENTROPY_TMPL = (
    "CASE WHEN {t} IS NULL OR length({t}) = 0 THEN NULL ELSE "
    "round((ln(CAST(length({t}) AS DOUBLE)) - {fold} / "
    "CAST(length({t}) AS DOUBLE)) / ln(CAST(2 AS DOUBLE)), 6) END")
_TERM_SPARK = ("transform(array_sort(array_distinct(split({t}, ''))), "
               "c -> CAST(size(filter(split({t}, ''), x -> x = c)) AS DOUBLE)"
               " * ln(CAST(size(filter(split({t}, ''), x -> x = c)) "
               "AS DOUBLE)))")
_FOLD_SPARK = ("aggregate(array_sort({terms}), CAST(0 AS DOUBLE), "
               "(acc, v) -> acc + v)")
_TERM_DUCK = ("list_transform(list_sort(list_distinct(string_split({t}, "
              "''))), c -> CAST(len(list_filter(string_split({t}, ''), "
              "x -> x = c)) AS DOUBLE) * ln(CAST(len(list_filter("
              "string_split({t}, ''), x -> x = c)) AS DOUBLE)))")
_FOLD_DUCK = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
              "list_sort({terms})), (acc, v) -> acc + v)")


def char_entropy(col: str = "text") -> Column:
    """Shannon entropy in bits/char; NULL for empty/NULL text."""
    fold = _FOLD_SPARK.format(terms=_TERM_SPARK.format(t=col))
    return F.expr(_ENTROPY_TMPL.format(t=col, fold=fold))


def char_entropy_sql_duck(col: str = "text") -> str:
    fold = _FOLD_DUCK.format(terms=_TERM_DUCK.format(t=col))
    return _ENTROPY_TMPL.format(t=col, fold=fold)
