"""Unicode normalization (operators/normalize.py): invisible-strip rules,
NFC composition, NULL routing, cross-engine parity (pandas unicodedata vs
DuckDB utf8proc), idempotence, and the zero-shuffle at-scale contract."""

from __future__ import annotations

import random
import unicodedata

import duckdb
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import normalize as nz
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _norm(spark, text: str | None):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return tuple(nz.normalize_docs(df).collect()[0])


def _norm_duck(text: str | None):
    con = duckdb.connect()
    sql = nz.normalize_docs_sql_duck("(SELECT 1 AS doc_id, ? AS text)")
    return tuple(con.execute(sql, [text]).fetchone())


def _both(spark, text):
    s, d = _norm(spark, text), _norm_duck(text)
    assert s == d, (ascii(s), ascii(d))
    return s


def test_invisible_classes_stripped(spark):
    # C0 (not \t \n \x0B \x0C \r), DEL, C1, SHY, ZW, bidi, BOM all go;
    # tabs/newlines survive
    src = ("a\x00b\x07c\td\ne\x7ff\x85g\u00adh\u200bi\u200fj"
           "\u202ek\u2060l\u2066m\ufeffn")
    r = _both(spark, src)
    assert r[1] == "ab" + "c\td\ne" + "fghijklmn"
    assert r[2] == 11 and r[3] is True


def test_nfc_composes(spark):
    # decomposed e+acute / A+ring / jamo pair -> composed forms
    r = _both(spark, "Cafe\u0301 A\u030a \u1100\u1161")
    assert r[1] == "Caf\u00e9 \u00c5 \uac00"
    assert r[2] == 0 and r[3] is True  # NFC-only change still flags


def test_already_clean_unchanged(spark):
    r = _both(spark, "plain ascii text\twith tabs\nand lines")
    assert r[3] is False and r[2] == 0


def test_null_routing(spark):
    assert _both(spark, None) == (1, None, 0, False)
    assert _both(spark, "") == (1, "", 0, False)


def test_idempotent(spark):
    once = _both(spark, "Cafe\u0301\u200b x\u00ad A\u030a")[1]
    again = _both(spark, once)
    assert again[1] == once and again[3] is False


def test_nfc_engine_sweep():
    """Bounded slice of the adversarial divergence sweep from the module
    docstring: CPython unicodedata NFC vs DuckDB utf8proc NFC on random
    combining sequences + jamo + a BMP/astral sample — any divergence here
    means the oracle twin is invalid on this host and the operator must
    not ship."""
    random.seed(7)
    comb = [0x300, 0x301, 0x308, 0x30A, 0x323, 0x342, 0x345]
    base = "aeouAEOUcny" + chr(0x1100) + chr(0x1161) + chr(0x11A8)
    cases = ["".join(
        random.choice(base)
        + "".join(chr(random.choice(comb))
                  for _ in range(random.randint(0, 3)))
        for _ in range(4)) for _ in range(500)]
    cases += [chr(cp) for cp in range(0x3000, 0xD800, 211)]
    cases += [chr(cp) for cp in range(0x1E00, 0x2000)]
    cases += [chr(cp) for cp in range(0x10000, 0x2FFFF, 997)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in cases])
    duck = [r[0] for r in con.execute(
        "SELECT nfc_normalize(x) FROM t").fetchall()]
    py = [unicodedata.normalize("NFC", c) for c in cases]
    assert py == duck


def test_fixture_corpus_parity_and_binding(spark):
    docs = load(spark, SF, "documents")
    wrapped = docs.select(
        "doc_id", F.expr(nz.unicode_fixture_sql()).alias("text"))
    s = sorted(tuple(r) for r in nz.normalize_docs(wrapped).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    inner = (f"(SELECT doc_id, {nz.unicode_fixture_sql('text', 'doc_id')} "
             f"AS text FROM documents)")
    d = sorted(tuple(r)
               for r in con.execute(nz.normalize_docs_sql_duck(inner))
               .fetchall())
    assert s == d
    changed = sum(1 for r in s if r[3])
    assert 0 < changed < len(s)


def test_at_scale_zero_shuffle(spark):
    """An input already at session parallelism skips widen_if_narrow's
    repartition: the whole operator plans with no Exchange."""
    docs = load(spark, SF, "documents").repartition(8)
    # repartition is itself an Exchange in this plan's history; measure the
    # operator's ADDITION by planning from a materialized-width input
    docs = spark.createDataFrame(docs.collect(), docs.schema).repartition(8)
    plan = (nz.normalize_docs(docs)
            ._jdf.queryExecution().sparkPlan().toString())
    assert plan.count("Exchange") == 1  # only the input's own repartition
