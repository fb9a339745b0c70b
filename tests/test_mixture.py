"""Deterministic corpus mixing (operators/mixture.py): train/val/test split,
epoch-weight resampling, hash-sharded global shuffle — value-checked against
DuckDB (the registry's 50 driver slots are full; extras verify in-suite)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import mixture as mx
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"
DOCS = f"'{SF}/documents.parquet'"


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {DOCS}")
    return con.execute(sql).fetch_df()


# ---------------------------------------------------------------- split

def test_split_total_disjoint_deterministic(spark):
    docs = load(spark, SF, "documents")
    out = mx.with_split(docs).select("doc_id", "split")
    n = docs.count()
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # total: every row exactly one split
    assert counts.get("train", 0) > counts.get("val", 0)
    # deterministic: re-computation is identical row-for-row
    again = mx.with_split(docs).select("doc_id", "split")
    assert out.exceptAll(again).count() == 0


def test_split_matches_duckdb(spark):
    docs = load(spark, SF, "documents")
    s = (mx.with_split(docs).select("doc_id", "split")
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    d = (_duck(f"SELECT doc_id, {mx.split_sql_duck()} AS split "
               f"FROM documents")
         .sort_values("doc_id").reset_index(drop=True))
    assert (s["split"] == d["split"]).all()


def test_split_fraction_tracks_weights(spark):
    docs = load(spark, SF, "documents")
    out = mx.with_split(docs, {"a": 0.5, "b": 0.5}, salt="even")
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert abs(counts["a"] / n - 0.5) < 0.1  # 500 docs → ±10% tolerance


def test_split_weight_validation():
    with pytest.raises(ValueError):
        mx._split_thresholds({})
    with pytest.raises(ValueError):
        mx._split_thresholds({"a": -1.0})
    with pytest.raises(ValueError):
        mx._split_thresholds({"a": 0.0})


# ------------------------------------------------------------- resample

WEIGHTS = {"src0": 0.25, "src1": 2.3, "src2": 1.0}


def test_epoch_resample_matches_duckdb(spark):
    docs = load(spark, SF, "documents")
    s = (mx.epoch_resample(docs, WEIGHTS).select("doc_id", "epoch")
         .toPandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    d = (_duck(mx.epoch_resample_sql_duck(
            "documents", WEIGHTS, cols="doc_id"))
         .sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    assert len(s) == len(d)
    assert (s["doc_id"].astype(str) == d["doc_id"].astype(str)).all()
    assert (s["epoch"] == d["epoch"]).all()


def test_epoch_resample_copy_counts(spark):
    docs = load(spark, SF, "documents")
    out = mx.epoch_resample(docs, WEIGHTS)
    per_doc = out.groupBy("doc_id", "source").agg(
        F.count("*").alias("copies"),
        F.max("epoch").alias("max_epoch")).collect()
    for r in per_doc:
        w = WEIGHTS.get(r.source, 1.0)
        assert int(w) <= r.copies <= int(w) + 1  # floor(w) or floor(w)+1
        assert r.max_epoch == r.copies - 1       # epochs are 0..copies-1
    # src1 (w=2.3): every doc >= 2 copies; ~30% get a 3rd
    books = [r.copies for r in per_doc if r.source == "src1"]
    if books:
        assert min(books) >= 2
        frac3 = sum(1 for c in books if c == 3) / len(books)
        assert 0.05 < frac3 < 0.65


def test_epoch_resample_weight_zero_drops_source(spark):
    docs = load(spark, SF, "documents")
    out = mx.epoch_resample(docs, {"src0": 0.0})
    assert out.filter(F.col("source") == "src0").count() == 0
    kept = out.filter(F.col("source") != "src0")
    orig = docs.filter(F.col("source") != "src0")
    assert kept.count() == orig.count()  # default weight 1.0 = pass-through


def test_epoch_resample_validation(spark):
    docs = load(spark, SF, "documents")
    with pytest.raises(ValueError):
        mx.epoch_resample(docs, {"src0": -0.5})


# -------------------------------------------------------------- shuffle

def test_shuffle_shards_matches_duckdb(spark):
    docs = load(spark, SF, "documents")
    s = (mx.shuffle_shards(docs, n_shards=16)
         .select("doc_id", "shard", "shuffle_ord")
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    ord_sql, shard_sql = mx.shuffle_shard_sql_duck(n_shards=16)
    d = (_duck(f"SELECT doc_id, {shard_sql} AS shard, "
               f"{ord_sql} AS shuffle_ord FROM documents")
         .sort_values("doc_id").reset_index(drop=True))
    assert (s["shard"] == d["shard"]).all()
    assert (s["shuffle_ord"] == d["shuffle_ord"]).all()


def test_shuffle_is_permutation_and_spread(spark):
    docs = load(spark, SF, "documents")
    out = mx.shuffle_shards(docs, n_shards=8)
    n = docs.count()
    assert out.count() == n  # permutation: no row lost or duplicated
    assert out.select("doc_id").distinct().count() == n
    shards = out.groupBy("shard").count().collect()
    assert len(shards) == 8  # every shard populated at 500 rows / 8 shards
    # different seed ⇒ different permutation
    other = mx.shuffle_shards(docs, n_shards=8, seed="s1")
    joined = out.select("doc_id", "shard").withColumnRenamed(
        "shard", "a").join(
        other.select("doc_id", "shard").withColumnRenamed("shard", "b"),
        "doc_id")
    assert joined.filter(F.col("a") != F.col("b")).count() > 0


def test_shuffle_ord_is_wide_and_tie_free(spark):
    """The sort key must be the 48-bit hash, not the mod-1e6 fraction hash:
    tie runs in shuffle_ord fall back to sequential-id order — exactly the
    locality the shuffle must destroy. At 500 docs the wide hash collides
    with probability ~5e-9; any collision here means the wrong hash."""
    docs = load(spark, SF, "documents")
    out = mx.shuffle_shards(docs, n_shards=8)
    n = out.count()
    assert out.select("shuffle_ord").distinct().count() == n
    mx_ord = out.agg(F.max("shuffle_ord")).collect()[0][0]
    assert mx_ord >= mx.MIX_MOD  # wide range actually in use
    assert mx_ord < 1 << 48


def test_write_shuffled_roundtrip(spark, tmp_path):
    docs = load(spark, SF, "documents").limit(100)
    path = str(tmp_path / "shuffled")
    mx.write_shuffled(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.select("shard").distinct().count() == 4
    # reading shards in (shard, shuffle_ord) order is one fixed permutation
    seq = [r.doc_id for r in
           back.orderBy("shard", "shuffle_ord").select("doc_id").collect()]
    assert sorted(seq) == sorted(r.doc_id for r in
                                 docs.select("doc_id").collect())
    assert seq != sorted(seq)  # actually shuffled, not id order


# ------------------------------------------------- temperature weights

def test_temperature_identity_and_limits(spark):
    docs = load(spark, SF, "documents")
    # tau=1 with the default target preserves the corpus exactly: w_i = 1
    w1 = mx.temperature_weights(docs, tau=1.0, source_col="lang")
    assert all(v == 1.0 for v in w1.values())
    # tau -> inf approaches a uniform source mix: every source's expected
    # row count (w_i * n_i) converges to total / n_sources
    counts = {r.lang: r.n for r in docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    total, k = sum(counts.values()), len(counts)
    w_inf = mx.temperature_weights(docs, tau=1e9, source_col="lang")
    for s, n in counts.items():
        assert w_inf[s] * n == pytest.approx(total / k, rel=1e-3)
    # tau > 1 flattens: the smallest source gains weight, the largest loses
    w2 = mx.temperature_weights(docs, tau=2.0, source_col="lang")
    lo = min(counts, key=counts.get)
    hi = max(counts, key=counts.get)
    assert w2[lo] > 1.0 > w2[hi]
    with pytest.raises(ValueError, match="temperature"):
        mx.temperature_weights(docs, tau=0.0)


def test_temperature_composes_with_epoch_resample(spark):
    """The realized mixture matches the temperature target: resampled
    per-source counts land within hash-sampling noise of p_i * total."""
    docs = load(spark, SF, "documents")
    w = mx.temperature_weights(docs, tau=3.0, source_col="lang")
    out = mx.epoch_resample(docs, w, source_col="lang")
    got = {r.lang: r.n for r in out.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    counts = {r.lang: r.n for r in docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in counts.items():
        want = w[s] * n
        # the fractional copy is a hash coin per row: binomial noise
        assert abs(got[s] - want) <= 3 * (n ** 0.5) + 1, (s, got[s], want)


# -- select_token_budget -----------------------------------------------------------
def test_token_budget_semantics_and_parity(spark):
    """Hard cap binds per source, unbudgeted sources excluded, DuckDB twin
    hash-identical, scalable form output-identical (multi-slice forced)."""
    import duckdb

    from omnition_opentelemetry_service_spark import fixtures as fx
    from omnition_opentelemetry_service_spark.operators import mixture as mx

    n = 2000
    budgets = {"web": 9000, "books": 4000, "code": 1}  # code: nothing fits
    seqs = fx.sequences(spark, n)
    got = mx.select_token_budget(seqs, budgets)
    rows = got.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append((r["cum_tok"], r["n_tok"]))
    assert set(per) <= {"web", "books"}          # code empty, others absent
    for s, v in per.items():
        assert max(c for c, _ in v) <= budgets[s]
        # the budget actually binds: adding any excluded doc would overflow
        assert max(c for c, _ in v) > budgets[s] * 0.8
    # duck twin
    du = duckdb.connect().execute(
        mx.select_token_budget_sql_duck(fx.sequences_sql_duck(n), budgets)
        + " ORDER BY source, cum_tok").fetchall()
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in du)
    # scalable twin, sliced hard (n_slices ≫ 1 rows per slice)
    sc = mx.select_token_budget_scalable(seqs, budgets, n_slices=32)
    assert sorted(tuple(r) for r in sc.collect()) == sorted(
        tuple(r) for r in rows)


def test_token_budget_params(spark):
    from omnition_opentelemetry_service_spark.operators import mixture as mx

    for bad in ({}, {"a'b": 1}, {"web": -1}, {"web": 1.5}):
        try:
            mx.select_token_budget_sql_duck("t", bad)
            raise AssertionError(f"accepted {bad}")
        except ValueError:
            pass


def test_token_budget_rerun_and_salt(spark):
    """Same salt → byte-identical rerun; different salt → different subset
    (the selection is hash-driven, not positional)."""
    from omnition_opentelemetry_service_spark import fixtures as fx
    from omnition_opentelemetry_service_spark.operators import mixture as mx

    seqs = fx.sequences(spark, 800)
    b = {"web": 5000}
    a1 = sorted(r["doc_id"] for r in
                mx.select_token_budget(seqs, b).collect())
    a2 = sorted(r["doc_id"] for r in
                mx.select_token_budget(seqs, b).collect())
    assert a1 == a2 and len(a1) > 10
    b2 = sorted(r["doc_id"] for r in
                mx.select_token_budget(seqs, b, salt="other").collect())
    assert b2 != a1


# ---------------------------------------------------------------------------
# curriculum_shards: phase-major order, phase-independent shard bucketing,
# within-phase permutation == shuffle_shards', guards. Value parity is the
# curriculum_docs extras twin (test_consolidated_ops).
# ---------------------------------------------------------------------------
def test_curriculum_phase_major_within_shard(spark):
    from omnition_opentelemetry_service_spark.operators import mixture as mx

    docs = spark.range(500).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("phase"))
    out = mx.curriculum_shards(docs, "phase", n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.curriculum_ord)
        phases = [r.phase for r in rows]
        assert phases == sorted(phases), "curriculum order is phase-major"


def test_curriculum_shard_and_order_match_shuffle_shards(spark):
    from omnition_opentelemetry_service_spark.operators import mixture as mx

    docs = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 2).cast("int").alias("phase"))
    cur = {r.doc_id: r for r in
           mx.curriculum_shards(docs, "phase", n_shards=8).collect()}
    shf = {r.doc_id: r for r in
           mx.shuffle_shards(docs, n_shards=8).collect()}
    for did, r in cur.items():
        s = shf[did]
        # same bucketing (phase-independent), and the packed ord decomposes
        # into (phase, the SAME wide hash shuffle_shards uses)
        assert r.shard == s.shard
        assert r.curriculum_ord == r.phase * mx.WIDE_MOD + s.shuffle_ord


def test_curriculum_deterministic_under_repartition(spark):
    from omnition_opentelemetry_service_spark.operators import mixture as mx

    docs = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 2).cast("int").alias("phase"))
    a = sorted(map(tuple, mx.curriculum_shards(
        docs, "phase", n_shards=8).collect()))
    b = sorted(map(tuple, mx.curriculum_shards(
        docs.repartition(13), "phase", n_shards=8).collect()))
    assert a == b


def test_curriculum_guards(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from omnition_opentelemetry_service_spark.operators import mixture as mx

    with pytest.raises(ValueError, match="n_shards"):
        mx.curriculum_shards(spark.range(1).selectExpr(
            "CAST(id AS STRING) doc_id", "0 AS phase"), "phase", n_shards=0)
    bad_null = spark.createDataFrame([("a", None)],
                                     "doc_id string, phase int")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        mx.curriculum_shards(bad_null, "phase").collect()
    bad_range = spark.createDataFrame([("a", 40000)],
                                      "doc_id string, phase int")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        mx.curriculum_shards(bad_range, "phase").collect()


def test_literal_unsafe_names_rejected(spark):
    """PARITY trap 24: names/salts that would inline unsafely into SQL
    literals are rejected, never escaped."""
    import pytest

    from omnition_opentelemetry_service_spark.operators import mixture as mx

    df = spark.createDataFrame([("a", "s")], "doc_id string, source string")
    with pytest.raises(ValueError, match="literal-safe"):
        mx.epoch_resample(df, {"o'reilly": 2.0})
    with pytest.raises(ValueError, match="literal-safe"):
        mx.with_split(df, {"tr'ain": 0.5, "val": 0.5})
    with pytest.raises(ValueError, match="literal-safe"):
        mx.mix_hash("doc_id", "bad'salt")
    with pytest.raises(ValueError, match="literal-safe"):
        mx.epoch_resample_sql_duck("t", {'a"b': 1.0})


def test_epoch_resample_duck_default_cols_schema(spark):
    """The duck twin's default cols='*' must not leak internal columns."""
    import duckdb

    from omnition_opentelemetry_service_spark.operators import mixture as mx

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'd' || range AS doc_id, "
                "'web' AS source FROM range(10)")
    out = con.execute(mx.epoch_resample_sql_duck("t", {"web": 2.0})).fetch_df()
    assert list(out.columns) == ["doc_id", "source", "epoch"]
    assert len(out) == 20
