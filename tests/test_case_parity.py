"""Pin the cross-engine case-fold contract on the KNOWN divergence points.

tools/case_skew_sweep.py exhaustively derived every codepoint where the
JVM's and DuckDB's Unicode tables disagree on lower(); functions/text.py
bakes the resulting fold (CASE_SKEW_CAPS/LOWS + İ pre-expansion + ς→σ +
space-only trim + astral→U+FFFD shingle pre-fold). These tests pin the
representative members of each divergence family so a regression in any
twin (Spark expr, DuckDB SQL, Python kernel) fails loudly — without
re-running the full 387k-row sweep in the suite.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from omnition_opentelemetry_service_spark.functions import text as tx
from omnition_opentelemetry_service_spark.operators import dedup as dd

# One representative per divergence family (see lower_fold's doc):
TORTURE = [
    "İstanbul",              # SpecialCasing: İ → i + U+0307 (expands)
    "ΟΔΟΣ",                  # final-sigma context rule: word-final Σ → ς
    "σςΣ mix ΣΣ",            # literal ς + repeated capitals
    "Ᲊ tje",            # U+1C89 Cyrillic TJE (Unicode 16, JVM-only)
    "Ⱟ glagolitic",     # U+2C2F (Unicode 14 lower mapping)
    "Ɤ latin",          # U+A7CB (JVM-only lower)
    "\U00010570 vithkuqi",   # plane-1 cased letter (JVM-only lower)
    "\U00010d50 garay",      # plane-1, Unicode 16
    "a\U0001F600b emoji",    # astral, uncased — shingle code-unit trap
    "x y",              # NBSP: Duck bare trim() would strip it
    "  lead",           # unicode-space at the trim edge
    "a\x0bb vt",             # vertical tab: \s skew between regex engines
    " the is of to in ",     # plain ASCII control row
]


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame({"i": range(len(TORTURE)), "text": TORTURE})
    return spark.createDataFrame(pdf), pdf


def test_fingerprint_and_counts_match_duckdb(spark, frames):
    sdf, pdf = frames
    got = {
        r.i: (r.fp, r.sw, sorted(set(r.shg)), r.tc, r.la)
        for r in sdf.select(
            "i",
            tx.fingerprint("text").alias("fp"),
            tx.stopword_count("text").alias("sw"),
            tx.char_shingles("text", 3).alias("shg"),
            tx.token_count("text").alias("tc"),
            tx.lang_id("text").alias("la"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    q = f"""SELECT i, {tx.fingerprint_sql_duck('text')} AS fp,
      {tx.stopword_count_sql_duck('text')} AS sw,
      list_sort(list_distinct({tx.char_shingles_sql_duck('text', 3)})) AS shg,
      {tx.token_count_sql_duck('text')} AS tc,
      {tx.lang_id_sql_duck('text')} AS la FROM t"""
    for r in con.execute(q).fetchall():
        i = int(r[0])
        assert got[i][0] == r[1], f"fingerprint diverges on {TORTURE[i]!r}"
        assert got[i][1] == int(r[2]), f"stopwords diverge on {TORTURE[i]!r}"
        assert got[i][2] == [str(x) for x in r[3]], \
            f"shingles diverge on {TORTURE[i]!r}"
        assert got[i][3] == int(r[4]), f"token_count diverges on {TORTURE[i]!r}"
        assert got[i][4] == r[5], f"lang_id diverges on {TORTURE[i]!r}"


def test_simhash_tri_engine(spark, frames):
    """simhash_expr (JVM) == simhash_signatures_pandas (Python kernel) ==
    the DuckDB word-split CTE on every known divergence point."""
    sdf, pdf = frames
    expr = {
        r.i: r.sh
        for r in sdf.select("i", dd.simhash_expr("text").alias("sh")).collect()
    }
    pandas_form = {
        r.id: r.sh
        for r in dd.simhash_signatures_pandas(
            sdf.selectExpr("i AS doc_id", "text")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    bits = dd.SIMHASH_BITS
    vote = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (CAST(concat('0x', substr(md5(w), 1, 15)) "
        f"AS BIGINT) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    duck = {
        int(r[0]): r[1]
        for r in con.execute(f"""
        SELECT i, (SELECT CAST({vote} AS BIGINT)
          FROM unnest(list_filter(string_split_regex(
            {tx.lower_fold_sql_duck(tx.trim_sql_duck('t.text'))},
            '[ \\t\\n\\x0B\\f\\r]+'), w -> len(w) > 0)) AS u(w)) AS sh
        FROM t""").fetchall()
    }
    for i in expr:
        assert (expr[i] or 0) == (pandas_form[i] or 0), \
            f"pandas simhash diverges on {TORTURE[i]!r}"
        assert (expr[i] or 0) == (duck[i] or 0), \
            f"duck simhash diverges on {TORTURE[i]!r}"


def test_lower_fold_py_matches_jvm(spark, frames):
    sdf, _ = frames
    jvm = {r.i: r.lo for r in sdf.select(
        "i", tx.lower_fold("text").alias("lo")).collect()}
    for i, t in enumerate(TORTURE):
        assert jvm[i] == tx.lower_fold_py(t), f"lower_fold_py on {t!r}"


def test_skew_table_is_consistent():
    caps, lows = tx.CASE_SKEW_CAPS, tx.CASE_SKEW_LOWS
    assert len(caps) == len(lows) == 70
    assert len(set(caps)) == len(caps)
    # every cap is genuinely unknown to CPython's lower (post-lower
    # application of the table relies on this being a superset)
    for c, l in zip(caps, lows):
        assert c.lower() in (c, l), hex(ord(c))
