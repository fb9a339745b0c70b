"""Per-stratum quota cap (corpus.quota_per_stratum): exactness of the
two-phase skew-proof selection vs the naive one-window form, whole-stratum
survival below the cap, determinism under repartitioning, and the
no-cartesian plan shape. DuckDB value parity rides the extras oracle gate
(test_consolidated_ops / check_oracle --extras, slot quota_docs)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import corpus as cp
from omnition_opentelemetry_service_spark.operators.mixture import \
    mix_hash_wide

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _naive(df, cap, strata_col="source", key_col="doc_id",
           salt="quota-v1"):
    """The oracle form: single window, same (hash, key) order."""
    w = Window.partitionBy(strata_col).orderBy(
        F.asc(mix_hash_wide(key_col, salt)), F.asc(key_col))
    return (df.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= cap).drop("_r"))


def test_two_phase_equals_one_window(spark):
    """Phase 1 is a pure superset step: every n_salts gives the identical
    selection as the naive single window (the exactness claim)."""
    docs = _docs(spark)
    want = sorted(r.doc_id for r in
                  _naive(docs, 11).select("doc_id").collect())
    for n_salts in (1, 4, 32):
        got = sorted(r.doc_id for r in cp.quota_per_stratum(
            docs, cap=11, n_salts=n_salts).select("doc_id").collect())
        assert got == want, f"n_salts={n_salts}"


def test_small_strata_survive_whole(spark):
    """A cap above every stratum size keeps the whole corpus; the cap
    binds per stratum exactly (count == min(cap, |stratum|))."""
    docs = _docs(spark)
    sizes = {r.source: r.n for r in docs.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    out = cp.quota_per_stratum(docs, cap=10 ** 9)
    assert out.count() == sum(sizes.values())
    capped = {r.source: r.n for r in
              cp.quota_per_stratum(docs, cap=17).groupBy("source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in sizes.items():
        assert capped.get(s, 0) == min(17, n), s


def test_deterministic_under_repartition(spark):
    """The selected row SET is a pure function of (key, salt) — identical
    at any input partitioning (the queued-retry resume guarantee)."""
    docs = _docs(spark)
    a = sorted(r.doc_id for r in cp.quota_per_stratum(docs, cap=23)
               .select("doc_id").collect())
    b = sorted(r.doc_id for r in
               cp.quota_per_stratum(docs.repartition(17), cap=23)
               .select("doc_id").collect())
    assert a == b and len(a) > 0


def test_columns_and_validation(spark):
    docs = _docs(spark)
    out = cp.quota_per_stratum(docs, cap=5)
    assert out.columns == docs.columns  # helper columns dropped
    try:
        cp.quota_per_stratum(docs, cap=0)
        raise AssertionError("cap=0 must raise")
    except ValueError:
        pass


def test_null_keys_excluded_both_engines(spark):
    """NULL keys are routed out (no deterministic cross-engine NULL rule
    exists — PARITY.md trap 25 + unbreakable (hash, key) ties); the Spark
    op and the DuckDB twin agree on the surviving set."""
    import duckdb

    docs = _docs(spark).select(
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("doc_id")).alias("doc_id"), "source")
    out = cp.quota_per_stratum(docs, cap=9)
    assert out.filter(F.col("doc_id").isNull()).count() == 0
    got = sorted(r.doc_id for r in out.select("doc_id").collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW base AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    con.execute("CREATE VIEW docs AS SELECT CASE WHEN doc_id % 5 = 0 "
                "THEN NULL ELSE doc_id END AS doc_id, source FROM base")
    want = sorted(r[0] for r in con.execute(
        cp.quota_per_stratum_sql_duck("docs", cap=9, cols="doc_id")
    ).fetchall())
    assert got == want and len(got) > 0


def test_plan_shape(spark):
    plan = cp.quota_per_stratum(_docs(spark), cap=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
