"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf, compare row count,
column names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from omnition_opentelemetry_service_spark.session import get_spark  # noqa: E402
from omnition_opentelemetry_service_spark.sources.loader import TABLES  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def complex_cols(sdf) -> list[str]:
    """Columns the DRIVER's canonicalization cannot sort (its pandas
    sort_values raises TypeError on list/dict cells — CORRECTNESS_r03
    assembled_packs/fim_docs). Driver slots must be scalar-only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [f.name for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))]


def run_checks(spark, con, queries, oracles, sf_dir, only=None,
               log=print, strict_names=frozenset()) -> list[str]:
    """The driver-identical gate over a (queries, oracles) pair: per query,
    row count + column names + order-insensitive value hash vs DuckDB.
    Queries in ``strict_names`` (the 50 driver slots) additionally FAIL if
    their schema has array/map/struct columns — the driver's pandas-sort
    canonicalization throws on those, so a non-scalar slot must never look
    green locally (VERDICT r3 ask #2). Returns the failing names.
    Importable so pytest runs the SAME gate (tests/test_consolidated_ops.py
    uses it for the rotated-out extras)."""
    from omnition_opentelemetry_service_spark.registry import release_caches

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            if name in strict_names:
                bad = complex_cols(sdf)
                if bad:
                    log(f"FAIL  {name}: driver slot has non-scalar columns "
                        f"{bad} — the driver's pandas sort would raise")
                    failures.append(name)
                    continue
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            log(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            log(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            log(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failures.append(name)
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        sh = table_hash(s_rows, s_cols)
        dh = table_hash(d_rows, d_cols)
        ok_hash = sh == dh
        status = "OK   " if (ok_cols and ok_count and ok_hash) else "FAIL "
        log(f"{status} {name}: rows {len(s_rows)}/{len(d_rows)} "
            f"cols={'=' if ok_cols else f'{s_cols} vs {d_cols}'} "
            f"hash={'=' if ok_hash else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        release_caches(spark)  # operator caches are caller-released
        if not (ok_cols and ok_count and ok_hash):
            failures.append(name)
            if ok_cols and s_rows and d_rows:
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                s_set = {"|".join(canon(r[i]) for i in order) for r in s_rows}
                dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                d_set = {"|".join(canon(r[i]) for i in dorder) for r in d_rows}
                for x in sorted(s_set - d_set)[:3]:
                    log(f"        spark-only: {x[:200]}")
                for x in sorted(d_set - s_set)[:3]:
                    log(f"        duck-only:  {x[:200]}")
    return failures


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--extras"]
    extras = "--extras" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark(parallelism=16)
    con = duckdb.connect()
    register_views(con, sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    strict = frozenset(queries)  # the 50 driver slots: scalar-only schemas
    if extras:
        # the rotated-out twins ride the same gate (VERDICT r2 ask 2):
        # one command proves every twin, driver slots and extras alike
        from omnition_opentelemetry_service_spark import registry

        queries = {**queries, **registry.build_extra_queries()}
        oracles = {**oracles, **registry.build_extra_oracle_sql()}
    failures = run_checks(spark, con, queries, oracles, sf_dir, only=only,
                          strict_names=strict)
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
