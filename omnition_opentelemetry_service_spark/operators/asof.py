"""As-of join + time-bucketed rollups — custom temporal operators Spark
lacks as built-ins, expressed as compositions of existing DataFrame ops
(no Python in the hot path).

Not present in the reference (its pipeline is forwarding-only); these are
the temporal operators a telemetry/training-data warehouse layers on top:
"which config/rate/model-version was active when this event happened"
(as-of join) and continuous-aggregate-style multi-granularity rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, time_col: str,
              value_cols: list[str] | None = None,
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the latest right row with
    right.time ≤ left.time (direction='backward'; 'forward' = earliest
    right row with right.time ≥ left.time), matching on ``key``.

    Spark-first shape (the union-window technique): tag both sides, union
    on (key, time), carry the right side's values across the merged
    timeline with last(ignorenulls) over (key ORDER BY time, side-rank),
    then keep left rows. ONE shuffle on the join key — never a per-row
    range probe, never a cross product; at 10^12 left rows this is the same
    exchange the join would need anyway. Ties (equal timestamps) resolve to
    the right row (the state is visible to events at the same instant).

    ``value_cols`` defaults to every right column except key/time; a
    value column sharing a name with a left column raises (the output
    would carry two same-named columns and fail far from the call site).

    Determinism: when the RIGHT side has several rows at the same
    (key, time), the carried row is the one whose value struct sorts
    LAST (deterministic total order) — without that final sort key the
    winner would be whichever tied row the shuffle delivered last.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, time_col)]
    clash = sorted(set(value_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"value_cols collide with left columns: {clash} — rename or "
            f"pass explicit value_cols")

    l_tag = left.select(
        key, time_col,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r_tag = right.select(
        key, time_col,
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    merged = l_tag.unionByName(r_tag)

    # the trailing value-struct key makes the order TOTAL over right-side
    # ties (same key, same time): last(ignorenulls) then deterministically
    # carries the max-struct row instead of shuffle-arrival order
    tie = F.struct(*[F.col(f"_r_{c}") for c in value_cols]).asc()
    if direction == "backward":
        # right rows sort BEFORE left rows at the same timestamp → a state
        # change at t is visible to events at t
        w = (Window.partitionBy(key)
             .orderBy(F.col(time_col).asc(), F.col("_is_left").asc(), tie)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(key)
             .orderBy(F.col(time_col).desc(), F.col("_is_left").asc(), tie)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    filled = merged.select(
        "_is_left", "_row",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in value_cols],
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_f_{c}").alias(c) for c in value_cols]
    return filled.filter(F.col("_is_left") == 1).select(*out_cols)


def range_join(left: DataFrame, right: DataFrame, left_time: str,
               right_lo: str, right_hi: str, bucket_width: int,
               key: str | None = None) -> DataFrame:
    """Point-in-interval join: each left row matched to every right interval
    [lo, hi) containing its time (optionally also matching on ``key``).

    Spark's naive plan for `l.t >= r.lo AND l.t < r.hi` is a
    BroadcastNestedLoop (every row × every interval). The scale shape here:
    bucketize time by ``bucket_width``, explode each interval into the
    buckets it covers, equi-join on the bucket (plus key), then refine with
    the exact range predicate. Each left row lives in exactly ONE bucket, so
    no duplicates arise and no distinct is needed. Shuffle cost is keyed on
    (bucket, key) — pick bucket_width near the typical interval length so
    intervals explode into O(1) buckets."""
    lb = left.withColumn(
        "_b", F.floor(F.col(left_time) / bucket_width).cast("long"))
    # Guard degenerate intervals BEFORE the explode: an empty/inverted
    # interval (hi <= lo) can match nothing anyway, but Spark's
    # sequence(a, b) DESCENDS when b < a — one inverted row like [0, -10^9)
    # would otherwise explode into millions of bucket rows before the exact
    # refine throws them all away.
    rb = right.filter(F.col(right_hi) > F.col(right_lo)).withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(right_lo) / bucket_width).cast("long"),
            F.floor((F.col(right_hi) - 1) / bucket_width).cast("long"))))
    on = [lb["_b"] == rb["_b"]]
    if key:
        on.append(lb[key] == rb[key])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    refined = (
        lb.join(rb, cond)
        .filter((lb[left_time] >= rb[right_lo])
                & (lb[left_time] < rb[right_hi]))
    )
    keep = [lb[c] for c in left.columns] + \
        [rb[c] for c in right.columns if c != key]
    return refined.select(*keep)


def rollup_time_grains(df: DataFrame, time_col: str, dims: list[str],
                       aggs: list[F.Column],
                       grains: tuple[str, ...] = ("hour", "day")) -> DataFrame:
    """Continuous-aggregate / hypertable-rollup analog: aggregate once per
    time grain in a SINGLE job via a grain×row explode + one groupBy —
    map-side partial aggregation applies per (grain, bucket, dims), so the
    input is scanned ONCE for all grains (vs one scan per grain).

    Returns (grain, bucket_start, *dims, *aggs).
    """
    grain_col = F.explode(F.array(*[F.lit(g) for g in grains])).alias("grain")
    exploded = df.select("*", grain_col)
    # date_trunc(fmt, ts) takes a literal fmt; build per-grain via CASE
    bucket = F.coalesce(*[
        F.when(F.col("grain") == g, F.date_trunc(g, F.col(time_col)))
        for g in grains
    ]).alias("bucket_start")
    return (
        exploded.select("grain", bucket, *dims, *[c for c in df.columns
                                                  if c not in dims])
        .groupBy("grain", "bucket_start", *dims)
        .agg(*aggs)
    )
