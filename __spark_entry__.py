"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``omnition_opentelemetry_service_spark`` (SURVEY.md
§2 operator inventory); this file is the thin registry facade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from omnition_opentelemetry_service_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full parse → enrich →
    route → aggregate pipeline over the deterministic token table."""
    return registry.q_pipeline_routed(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data ops: dedup / similarity / text / multimodal)."""
    return registry.build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — every queries() key has one.
    Fixture-backed pipeline queries synthesize their input in deterministic
    CTEs (same arithmetic as the Spark generators)."""
    return registry.build_oracle_sql()
