"""Driver-window contract pins (VERDICT r3 ask #2).

The driver's correctness harness canonicalizes each slot's result by
pandas-sorting ALL columns before hashing; list/dict cells make that sort
raise ``TypeError: unhashable type`` (this killed assembled_packs/fim_docs
in round 3 — the rows were value-correct, the artifact shape was not).
These tests make the contract un-regressable: every driver slot's OUTPUT
SCHEMA must be scalar-only, checked at plan-build time, so a window
rotation can never promote a driver-incompatible slot again.
"""

from __future__ import annotations

import os
import sys

from omnition_opentelemetry_service_spark import registry

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check_oracle import complex_cols  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_every_driver_slot_schema_is_scalar_only(spark):
    """All 50 driver slots produce only atomic column types — the driver's
    pandas canonicalization sorts every column, so array/map/struct outputs
    fail its gate even when the values are right."""
    queries = registry.build_queries()
    assert len(queries) == 50
    offenders = {}
    for name, fn in queries.items():
        bad = complex_cols(fn(spark, SF))
        if bad:
            offenders[name] = bad
    registry.release_caches(spark)
    spark.catalog.clearCache()
    assert not offenders, (
        f"driver slots with non-scalar columns (driver gate would raise "
        f"TypeError in its pandas sort): {offenders}")


def test_driver_canonicalization_replica_sorts_every_slot(spark):
    """REPLICATE the driver's canonicalization, not just its precondition:
    collect each slot at the smoke sf and pandas-sort ALL columns exactly
    as the driver's _canon does. The r3 failure was a TypeError inside
    this sort; the schema gate above catches the list case, this catches
    anything else pandas' lexsort chokes on (mixed-type object columns,
    unhashable cells) that a schema check cannot see."""
    import pandas as pd

    queries = registry.build_queries()
    failures = {}
    for name, fn in queries.items():
        pdf = pd.DataFrame([r.asDict() for r in
                            fn(spark, "/root/testdata/sf0.001").collect()])
        if pdf.empty:
            continue
        try:
            pdf.sort_values(by=sorted(pdf.columns), inplace=True)
        except TypeError as e:
            failures[name] = str(e)
    registry.release_caches(spark)
    spark.catalog.clearCache()
    assert not failures, f"driver canonicalization would raise: {failures}"


def test_driver_slots_and_oracles_align():
    """Every driver slot has an oracle twin and vice versa — a slot without
    a twin silently downgrades to the driver's weaker rows-only check."""
    q = registry.build_queries()
    o = registry.build_oracle_sql()
    assert set(q) == set(o)
