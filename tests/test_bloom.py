"""Bloom-filter membership contract: no false negatives ever, bounded
false positives, exact-equivalence of the prefilter to a plain anti-join,
cross-engine flag parity, and the fixed-size/broadcast plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import bloom

M = 1 << 14  # small filter so the FPR test actually sees false positives
K = 5
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def history(spark):
    df = spark.range(0, 4000).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("fp"))
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def words(history):
    w = bloom.bloom_build(history, "fp", M, K).persist()
    w.count()
    yield w
    w.unpersist()


def test_word_table_is_fixed_size(words):
    assert words.count() <= M // 32
    # every word id in range, every bits value fits 32 unsigned bits
    row = words.agg(F.min("w"), F.max("w"), F.max("bits")).collect()[0]
    assert row[0] >= 0 and row[1] < M // 32
    assert 0 < row[2] < (1 << 32)


def test_no_false_negatives(spark, history, words):
    """Every inserted key must probe might_contain=true — the load-bearing
    Bloom guarantee (the prefilter's exactness rests on it)."""
    flags = bloom.bloom_might_contain(history, words, "fp", M, K)
    assert flags.filter(~F.col("might_contain")).count() == 0
    assert flags.count() == 4000


def test_fpr_within_bound(spark, history, words):
    """Disjoint probe keys: measured FPR ≤ 3× the (1-e^(-kn/m))^k bound.
    With n=4000, m=2^14, k=5 the bound is ~0.48 — use a larger filter for
    a meaningful pin too."""
    probes = spark.range(0, 4000).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("fp"))
    flags = bloom.bloom_might_contain(probes, words, "fp", M, K)
    fpr = flags.filter(F.col("might_contain")).count() / 4000
    assert fpr <= 3 * bloom.bloom_fpr_bound(4000, M, K)

    big = bloom.bloom_build(history, "fp", bloom.BLOOM_BITS, K)
    probes2 = spark.range(0, 40_000).select(
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("fp"))
    flags2 = bloom.bloom_might_contain(probes2, big, "fp",
                                       bloom.BLOOM_BITS, K)
    fpr2 = flags2.filter(F.col("might_contain")).count() / 40_000
    # bound at 2^17 bits is ~5.7e-5; the hash is deterministic so this
    # measured value is FIXED (2.5e-5 — 1 hit in 40k), not a flaky draw;
    # the Poisson slack covers a future probe-set rename
    assert fpr2 <= 3 * bloom.bloom_fpr_bound(4000, bloom.BLOOM_BITS, K) \
        + 5 / 40_000


def test_flags_match_duckdb_exactly(spark, history):
    """Cross-engine parity of the full build+probe pipeline on mixed
    member/non-member probes INCLUDING NULL keys on both sides (DuckDB
    re-derives the word table itself). NULL semantics are the trap:
    DuckDB's concat ignores NULL args (PARITY.md trap 25), so without
    the CASE guard a NULL history key would set spurious bits and a NULL
    probe would crash _XH_DUCK's '0x' cast."""
    hist_nulls = history.unionByName(
        spark.range(0, 3).select(F.lit(None).cast("string").alias("fp")))
    probes = spark.range(0, 1000).select(
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("h"), F.col("id").cast("string")))
        .when(F.col("id") % 9 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("p"), F.col("id").cast("string")))
        .alias("fp"))
    words = bloom.bloom_build(hist_nulls, "fp", M, K)
    by_key = lambda t: (t[0] is None, t[0] or "")
    flags = bloom.bloom_might_contain(probes, words, "fp", M, K)
    # output key column carries the caller's name — twin-aligned
    assert flags.columns == ["fp", "might_contain"]
    got = sorted(map(tuple, flags.collect()), key=by_key)

    con = duckdb.connect()
    keys_sql = ("SELECT concat('h', CAST(r AS VARCHAR)) AS fp "
                "FROM (SELECT unnest(range(4000)) AS r) "
                "UNION ALL SELECT CAST(NULL AS VARCHAR) "
                "FROM (SELECT unnest(range(3)))")
    probes_sql = (
        "SELECT CASE WHEN r % 2 = 0 THEN concat('h', CAST(r AS VARCHAR)) "
        "WHEN r % 9 = 1 THEN CAST(NULL AS VARCHAR) "
        "ELSE concat('p', CAST(r AS VARCHAR)) END AS fp "
        "FROM (SELECT unnest(range(1000)) AS r)")
    want = sorted(map(tuple, con.execute(bloom.bloom_might_contain_sql_duck(
        probes_sql, keys_sql, "fp", M, K)).fetchall()), key=by_key)
    assert got == want
    # the NULL probe row exists and is flagged definitely-absent
    assert (None, False) in got


def test_prefilter_equals_plain_anti_join(spark, history):
    """The end-to-end oracle: bloom_prefilter_new is EXACTLY the plain
    anti-join — the Bloom only reroutes work. Batch overlaps history on
    half its keys and carries a payload column that must survive."""
    batch = spark.range(0, 800).select(
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("h"), F.col("id").cast("string")))
        .when(F.col("id") % 7 == 3, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("b"), F.col("id").cast("string")))
        .alias("fp"),
        (F.col("id") * 10).alias("payload"))
    # the when-chain plants NULL fps (id%2!=0 and id%7==3): the plain
    # anti-join keeps them, so the prefilter must too
    assert batch.filter(F.col("fp").isNull()).count() > 0
    by_payload = lambda t: t[1]  # payload is unique; fp may be NULL
    got = sorted(map(tuple, bloom.bloom_prefilter_new(
        batch, history, "fp", M, K).select("fp", "payload").collect()),
        key=by_payload)
    want = sorted(map(tuple, batch.join(
        history, "fp", "left_anti").select("fp", "payload").collect()),
        key=by_payload)
    assert got == want
    # and the bloom actually prunes: the definitely-new split is non-empty
    words = bloom.bloom_build(history, "fp", M, K)
    flags = bloom.bloom_might_contain(batch, words, "fp", M, K)
    n_definite = flags.filter(~F.col("might_contain")).count()
    assert n_definite > 0  # those rows skipped the history join entirely


def test_plan_shape(spark, history, words):
    """The probe joins the word table BROADCAST; no cartesian product
    anywhere in build or probe."""
    probes = spark.range(0, 100).select(
        F.col("id").cast("string").alias("fp"))
    plan = bloom.bloom_might_contain(probes, words, "fp", M, K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    bplan = bloom.bloom_build(history, "fp", M, K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in bplan


def test_prefilter_accepts_prebuilt_words(spark):
    """The per-epoch amortization path: a word table built once and passed
    in produces the identical prefilter result (and the call never needs
    the history frame for the build)."""
    from omnition_opentelemetry_service_spark.operators import bloom

    batch = spark.createDataFrame(
        [(f"k{i}",) for i in range(40)], "fp string")
    history = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 40, 2)], "fp string")
    words = bloom.bloom_build(history, "fp", 1 << 12, 4)
    got = {r.fp for r in bloom.bloom_prefilter_new(
        batch, history, m_bits=1 << 12, k=4,
        prebuilt_words=words).collect()}
    want = {r.fp for r in batch.join(history, "fp", "left_anti").collect()}
    assert got == want
    spark.catalog.clearCache()
