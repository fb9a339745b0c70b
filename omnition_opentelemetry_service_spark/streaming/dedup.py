"""Bounded-state streaming exact dedup.

The batch engine's exact_dedup (operators/dedup.py) collapses duplicates
with a full-corpus groupBy — correct, but only expressible over data at
rest. The streaming twin must bound its state: a plain
``dropDuplicates(keys)`` on an unbounded stream keeps EVERY key ever seen
(state grows with the corpus — at 10^12 sequences that is the corpus), so
the engine uses ``dropDuplicatesWithinWatermark``: state holds only the
watermark horizon of keys, the exact analog of the reference collector's
bounded buffering (batch timeout / queue caps — nothing is remembered
forever, SURVEY.md §2.2).

Contract split, by duplicate source:
- duplicates WITHIN the horizon (crash-redelivery, at-least-once receivers
  re-sending a quantum — the duplicates a log pipeline actually produces)
  collapse here, exactly once per key per horizon;
- re-occurrences OLDER than the horizon pass through, and the downstream
  batch layer (exact_dedup over the materialized table) owns them. The
  horizon is the knob trading state size against how much the batch layer
  must re-collapse.

Shape at scale: state is hash-partitioned by key across executors (one
shuffle on the dedup keys per micro-batch); RocksDB state store holds the
horizon on disk, so state per executor is horizon-rate × key-width /
executors — independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(stream: DataFrame,
                 key_cols: tuple[str, ...] = ("doc_id",),
                 event_time_col: str = "event_time",
                 delay: str = "2 minutes") -> DataFrame:
    """First occurrence per key passes; duplicates within the watermark
    horizon are dropped; state for a key expires once the watermark passes
    its event time + delay."""
    return (
        stream.withWatermark(event_time_col, delay)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def with_event_time_from_ts(df: DataFrame,
                            ts_col: str = "ts_str",
                            out: str = "event_time") -> DataFrame:
    """ISO-8601 string → TimestampType for watermarking, via the engine's
    ONE timestamp pattern (functions/parse.with_event_time). A bare
    to_timestamp would treat the trailing 'Z' as a UTC offset while every
    other stage parses it as a literal in session time — identical only
    under the pinned UTC session, silently skewed in any other."""
    from ..functions.parse import event_time_expr

    return df.withColumn(out, event_time_expr(ts_col))
