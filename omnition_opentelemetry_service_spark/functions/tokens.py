"""Token-array helpers. The per-row invariant for the whole pipeline is
token-array equality (BASELINE.json input_hint), so everything here is
loss-free and engine-portable (DuckDB can reproduce each expression)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_str(col: str | Column = "tokens") -> Column:
    """Canonical string form of a token array — the cross-engine equality
    surface (Spark array<int> vs DuckDB list<int> hash differently; their
    comma-joined string forms compare exactly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c.cast("array<string>"), ",")


def tokens_checksum(col: str | Column = "tokens") -> Column:
    """Order-sensitive polynomial checksum of the token array, JVM-side via
    ``aggregate``: acc = (acc*31 + tok) mod M (M < 2^57 so acc*31+t stays < 2^63 under ANSI arithmetic). DuckDB parity:
    list_reduce with the same arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        c,
        F.lit(7).cast("long"),
        lambda acc, t: (acc * 31 + t.cast("long")) % F.lit(144115188075855859),
    ).alias("tokens_checksum")


def tokens_checksum_sql_duck(col: str = "tokens") -> str:
    return (
        f"list_reduce(list_prepend(CAST(7 AS BIGINT), "
        f"list_transform({col}, t -> CAST(t AS BIGINT))), "
        f"(acc, t) -> (acc * 31 + t) % 144115188075855859)"
    )
