"""Unicode text normalization — the ftfy-lite hygiene stage a crawl
pipeline runs before ANY hashing, shingling or tokenization (CCNet,
Wenzek et al. 2020, normalizes before its dedup hashes for exactly this
reason): two visually-identical strings must be byte-identical before an
exact-dup fingerprint or a MinHash shingle ever sees them.

Two steps, composed by ``normalize_docs``:

1. invisible-character strip — controls/ZW/bidi/BOM (functions/text.py
   INVISIBLE_RX), a pure JVM expression;
2. Unicode NFC composition — decomposed sequences (e + U+0301) fold to
   their canonical composed form. Spark has no built-in normalizer, so
   this is an Arrow-batched pandas kernel (``pd.Series.str.normalize``);
   the cross-engine oracle is DuckDB's ``nfc_normalize`` (utf8proc).
   CPython's unicodedata and utf8proc both implement UAX#15 NFC, which is
   stability-guaranteed for assigned codepoints; an adversarial sweep
   (combining-sequence fuzz + Hangul jamo + full BMP singletons + astral
   sample, ~59k cases — tests/test_normalize.py re-runs a bounded slice)
   found ZERO divergences on this sandbox's versions.

Shape at scale: the strip is projection-only; the NFC kernel is one
mapInPandas Arrow pass inheriting the scan's partitioning
(widen_if_narrow splits sub-parallelism small-scale inputs; at-scale
inputs stay literally zero-shuffle). No aggregation, no join, no skew
surface — the operator is embarrassingly parallel at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import strip_invisible, strip_invisible_sql_duck
from .widen import widen_if_narrow

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def nfc_sql_duck(inner: str) -> str:
    """DuckDB's NFC — the oracle twin of the pandas kernel."""
    return f"nfc_normalize({inner})"


def normalize_docs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, norm_text, n_removed, changed): invisible-strip + NFC per doc.
    ``n_removed`` counts codepoints the strip removed; ``changed`` is true
    iff the final text differs from the input at all (strip OR NFC). NULL
    text stays NULL with n_removed 0, changed false (trap-27 convention:
    NULLs route to the counted/false side explicitly)."""
    stripped = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        strip_invisible(text_col).alias("_stripped"))
    stripped = widen_if_narrow(stripped)
    # fresh StructType: StructType.add MUTATES, and df.schema is cached on
    # the DataFrame — extending it in place corrupts df.columns
    from pyspark.sql.types import StructField, StringType, StructType
    out_schema = StructType(
        list(stripped.schema.fields)
        + [StructField("norm_text", StringType())])

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = pdf.copy()
            out["norm_text"] = pdf["_stripped"].str.normalize("NFC")
            yield out

    nfc = stripped.mapInPandas(batches, schema=out_schema)
    return nfc.select(
        F.col(id_col),
        F.col("norm_text"),
        F.when(F.col("_orig").isNull(), F.lit(0))
        .otherwise(F.length("_orig") - F.length("_stripped"))
        .cast("int").alias("n_removed"),
        F.when(F.col("_orig").isNull(), F.lit(False))
        .otherwise(F.col("norm_text") != F.col("_orig")).alias("changed"))


def normalize_docs_sql_duck(table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """DuckDB twin: utf8proc NFC over the identical strip."""
    st = strip_invisible_sql_duck(text_col)
    nn = nfc_sql_duck(st)
    return f"""
    SELECT {id_col},
           {nn} AS norm_text,
           CAST(CASE WHEN {text_col} IS NULL THEN 0
                     ELSE len({text_col}) - len({st}) END AS INTEGER)
             AS n_removed,
           CASE WHEN {text_col} IS NULL THEN FALSE
                ELSE {nn} != {text_col} END AS changed
    FROM {table}"""


def unicode_fixture_sql(text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """Engine-NEUTRAL SQL decorating the plain-ASCII fixture corpus with
    the unicode defects this operator exists to fix: a decomposed accent
    (e + U+0301), a zero-width space, and per-id-modulus soft hyphen /
    BOM+bidi-override / decomposable ring / Hangul jamo pair. 1-in-4 docs
    stay verbatim so ``changed`` binds both ways. All characters are
    embedded as LITERAL codepoints — Spark's chr() is mod-256 ASCII, NOT
    a unicode codepoint constructor like DuckDB's, so chr() is unusable
    cross-engine here (and escape spellings would hit trap 24)."""
    t, i = text_col, id_col
    # Python escapes here; the SQL string (and so both engines) carries the
    # real characters. Decomposed forms on purpose -- NFC must change them.
    acute = "Cafe\u0301 menu \u200bzero "   # e+COMBINING ACUTE, ZWSP
    ring = "A\u030a ring "                   # A+COMBINING RING
    soft = "\u00adsoft"                      # SOFT HYPHEN
    bidi = " \ufeff\u202ebidi"              # BOM + RLO
    jamo = " \u1100\u1161"                  # decomposed Hangul GA
    body = (
        f"concat('{acute}', "
        f"CASE WHEN {i} % 3 = 0 THEN '{ring}' ELSE '' END, "
        f"substr({t}, 1, 50), "
        f"CASE WHEN {i} % 5 = 0 THEN '{soft}' ELSE '' END, "
        f"CASE WHEN {i} % 7 = 0 THEN '{bidi}' ELSE '' END, "
        f"CASE WHEN {i} % 11 = 0 THEN '{jamo}' ELSE '' END)"
    )
    return (f"CASE WHEN {t} IS NULL THEN CAST(NULL AS STRING) "
            f"WHEN {i} % 4 = 0 THEN {t} ELSE {body} END")
