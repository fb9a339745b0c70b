"""Every queries() entry must build and execute at sf0.001 — the automated
twin of the driver's smoke check. Catches any registry entry broken by a
refactor before the driver does."""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "sink", "rule_id", "source", "tenant",
                          "priority", "n_tok", "tokens_str"]


def test_registry_is_exactly_50_fully_oracled(spark):
    """The driver's correctness gate checks the FIRST 50 queries() entries;
    every registered query must therefore fit in — and fill — that window,
    and every one must ship an oracle."""
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(queries) == 50
    assert set(oracles) == set(queries)


def test_every_query_runs_and_every_oracle_parses(spark):
    from omnition_opentelemetry_service_spark.registry import release_caches

    queries = entry_mod.queries()
    failures = []
    for name, fn in queries.items():
        try:
            n = fn(spark, SF).count()
            assert n >= 0
        except Exception as e:  # collect all breakages, not just the first
            failures.append(f"{name}: {type(e).__name__}: {e}")
        release_caches(spark)
    assert not failures, "\n".join(failures)
    # cache lifecycle: after release, no persisted RDDs may linger
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == 0


def test_every_oracle_is_valid_duckdb(spark):
    """Oracle SQL must at least bind/plan in DuckDB against the real tables
    (EXPLAIN — no execution cost)."""
    import duckdb

    from omnition_opentelemetry_service_spark.sources.loader import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
    failures = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            failures.append(f"{name}: {str(e).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)
