"""Enrichment operators — the processor analogs.

- broadcast lookup join  → batch-level Node/Resource/Process values joined
  onto member spans (reference octrace/opencensus.go:156-171 carry of Node
  onto TraceData; kinesis/exporter.go:42-44 process fill) and the
  add-attributes processor (components.go:66).
- attribute add/rename   → add-attributes + attribute-key processors
  (components.go:66-67), over array<struct<key,value>> (MapType avoided for
  Arrow-UDF compatibility, SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_with_dim(
    facts: DataFrame,
    dim: DataFrame,
    key: str = "source",
    how: str = "left",
) -> DataFrame:
    """Broadcast lookup join. The dim side is explicitly broadcast so the
    plan never shuffles the (huge) fact side — at 10^12 rows this must be a
    BroadcastHashJoin, verified in tests via the physical plan."""
    return facts.join(broadcast(dim), on=key, how=how)


def fill_process(facts: DataFrame, span_col: str, batch_col: str, out: str) -> DataFrame:
    """Per-span process fill: span-level value wins, else batch-level
    (kinesis/exporter.go:42-44 `if span.Process == nil { span.Process = p }`)."""
    return facts.withColumn(out, F.coalesce(F.col(span_col), F.col(batch_col)))


def attrs_add(attrs_col: str | Column, kv: dict[str, str]) -> Column:
    """Append static key/values to an array<struct<key,value>> attributes
    column, overwriting existing keys (add-attributes processor semantics:
    adds/overwrites on every span). Overwrite = drop old key then concat.
    Accepts a Column so processors chain (rename → add), like the
    reference's processor chain."""
    c = F.col(attrs_col) if isinstance(attrs_col, str) else attrs_col
    added = F.array(*[
        F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
        for k, v in kv.items()
    ])
    keys = F.array(*[F.lit(k) for k in kv])
    # NULL array (a left-enriched row whose source has no dim entry) must
    # still GAIN the added keys — add-attributes runs "on every span";
    # unguarded, filter(NULL) -> NULL and concat(NULL, added) -> NULL
    # would silently drop the additions. The typed empty-array coalesce
    # normalizes NULL attrs to [] first.
    c = F.coalesce(c, F.array().cast("array<struct<key:string,value:string>>"))
    # coalesce: array_contains(keys, NULL) is NULL and a NULL predicate
    # DROPS the entry from F.filter — a null-keyed attribute must survive
    # (add/overwrite semantics never delete unrelated entries)
    kept = F.filter(
        c, lambda e: F.coalesce(~F.array_contains(keys, e["key"]),
                                F.lit(True)))
    return F.concat(kept, added)


def attrs_rename(attrs_col: str | Column, renames: dict[str, str]) -> Column:
    """Rename attribute keys (attribute-key processor analog,
    components.go:67) via a transform over the entries array."""
    col = F.col(attrs_col) if isinstance(attrs_col, str) else attrs_col
    mapping = F.create_map(*[F.lit(x) for kv in renames.items() for x in kv])
    return F.transform(
        col,
        lambda e: F.struct(
            F.coalesce(mapping[e["key"]], e["key"]).alias("key"),
            e["value"].alias("value"),
        ),
    )


def attrs_to_str(attrs_col: str | Column = "attrs") -> Column:
    """Canonical 'k=v;k=v' string form (sorted by key) — the cross-engine
    comparison surface for attributes."""
    c = F.col(attrs_col) if isinstance(attrs_col, str) else attrs_col
    sorted_entries = F.array_sort(c)
    return F.array_join(
        F.transform(sorted_entries, lambda e: F.concat_ws("=", e["key"], e["value"])),
        ";",
    )
