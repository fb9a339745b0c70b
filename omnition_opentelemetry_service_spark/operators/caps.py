"""Size-cap guards — TruncatableString + oversized-span rejection analogs.

Reference: span names/messages are TruncatableString{value, truncated_byte_
count} (opencensus_test.go:136); the kinesis exporter enforces
MaxBytesPerSpan / MaxBytesPerBatch caps (kinesis/config.go:52-53,
factory.go:58-59) — oversized spans are rejected, not sorted (SURVEY.md §2.5
"truncation caps … length() guards, not sorts").

Both are pure row-local expressions: no shuffle, fully codegen'd, pushdown-
friendly — exactly what a 100 TB scan wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def truncatable(col: str, max_len: int, out_value: str = None,
                out_dropped: str = None) -> list[Column]:
    """TruncatableString projection: (value truncated to max_len,
    <col>_truncated count). Names default to <col>_value / <col>_truncated.

    DELIBERATE divergence from the reference's byte semantics
    (truncated_byte_count): max_len counts CHARACTERS (code points), not
    octets — a byte-exact cut can land mid-codepoint and corrupt the text
    to U+FFFD on re-decode, which a text pipeline must never do. The
    dropped count is likewise in characters. For multi-byte text the
    character cap admits more bytes than the reference would; callers
    enforcing a hard byte budget should pair this with
    reject_oversized on an octet_length size column."""
    c = F.col(col)
    return [
        F.substring(c, 1, max_len).alias(out_value or f"{col}_value"),
        F.greatest(F.length(c) - max_len, F.lit(0))
        .cast("int").alias(out_dropped or f"{col}_truncated"),
    ]


def reject_oversized(df: DataFrame, size_col: str, max_size: int) -> tuple[DataFrame, DataFrame]:
    """(kept, rejected) split on a size cap — MaxBytesPerSpan semantics:
    the oversized row is dropped whole and counted, never truncated.

    A NULL size routes to REJECTED: `keep` is NULL for it, and both
    filter(keep) and filter(~keep) drop NULL-predicate rows, so without the
    coalesce the row would vanish from BOTH outputs — an uncounted loss,
    the exact thing this split exists to prevent."""
    keep = F.coalesce(F.col(size_col) <= F.lit(max_size), F.lit(False))
    return df.filter(keep), df.filter(~keep)
