"""Memory-limiter processor analog — load-shed gate with counted drops.

Reference contract (processor/memorylimiter/memorylimiter.go):
- construction validation with exact sentinel errors (lines 39-49)
- while the force-drop flag is set, every batch is dropped and
  ``spans_dropped`` / ``batches_dropped`` counters are recorded
  (lines 114-129; metrics.go:33-59)
- MiB→bytes config conversion (factory.go:57-66)

Spark's unified memory manager + spill makes the *mechanism* unnecessary;
what must survive is the *observable contract*: validation errors, the gate
predicate, and exact drop counters. The gate predicate is injectable
(`readMemStatsFn` test-seam analog, memorylimiter.go:66-67) so the
drop/allow state machine is unit-testable with fake readings.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exact sentinel messages — behavioral parity with memorylimiter.go:35-49.
ERR_FORCED_DROP = "data dropped due to high memory usage"
ERR_NIL_NEXT_CONSUMER = "nil nextConsumer"
ERR_CHECK_INTERVAL = "checkInterval must be greater than zero"
ERR_MEM_ALLOC_LIMIT = "memAllocLimit must be greater than zero"
ERR_MEM_SPIKE_LIMIT = "memSpikeLimit must be smaller than memAllocLimit"

MIB = 1024 * 1024


@dataclass(frozen=True)
class MemoryLimiterConfig:
    """Config in MiB / seconds (factory.go:57-66 converts MiB→bytes)."""

    check_interval_s: float
    mem_alloc_limit_mib: int
    mem_spike_limit_mib: int = 0
    ballast_size_mib: int = 0

    @property
    def mem_alloc_limit_bytes(self) -> int:
        return self.mem_alloc_limit_mib * MIB

    @property
    def mem_spike_limit_bytes(self) -> int:
        return self.mem_spike_limit_mib * MIB

    @property
    def ballast_size_bytes(self) -> int:
        return self.ballast_size_mib * MIB


class MemoryLimiter:
    """Validated gate. ``read_alloc_fn`` injects the memory reading (test
    seam); in production it would sample executor memory metrics."""

    def __init__(
        self,
        name: str,
        next_stage: Callable[[DataFrame], DataFrame] | None,
        config: MemoryLimiterConfig,
        read_alloc_fn: Callable[[], int] | None = None,
    ) -> None:
        if next_stage is None:
            raise ValueError(ERR_NIL_NEXT_CONSUMER)
        if config.check_interval_s <= 0:
            raise ValueError(ERR_CHECK_INTERVAL)
        # <= 0, not == 0: the sentinel's own contract is "greater than
        # zero" (the reference's uint config cannot go negative; ours can).
        if config.mem_alloc_limit_mib <= 0:
            raise ValueError(ERR_MEM_ALLOC_LIMIT)
        if config.mem_spike_limit_mib >= config.mem_alloc_limit_mib:
            raise ValueError(ERR_MEM_SPIKE_LIMIT)
        self.name = name
        self.next_stage = next_stage
        self.config = config
        self.read_alloc_fn = read_alloc_fn or (lambda: 0)
        self.spans_dropped = 0
        self.batches_dropped = 0

    def forcing_drop(self) -> bool:
        """Drop-state machine (memorylimiter.go:162-181): drop when
        alloc-ballast >= limit, or within spike-limit of it."""
        alloc = self.read_alloc_fn() - self.config.ballast_size_bytes
        limit = self.config.mem_alloc_limit_bytes
        return alloc >= limit or (limit - alloc) <= self.config.mem_spike_limit_bytes

    def consume(self, df: DataFrame, n_rows: int | None = None) -> DataFrame:
        """Batch gate: whole-batch drop with counters (memorylimiter.go:
        114-129 drops the entire TraceData, not a subset).

        When ``n_rows`` is not supplied, the drop is counted as one batch
        with spans UNKNOWN (spans_dropped unchanged) — the gate fires
        because memory is critically high, so running df.count() (the full
        upstream job: scans, shuffles — the very work being shed) to size
        the counter would be load-shedding that ADDS load. The reference
        counts the already-materialized batch for free
        (memorylimiter.go:119-127); callers with the row count in hand pass
        it, others get an honest batches_dropped without a fabricated
        spans figure."""
        if self.forcing_drop():
            self.batches_dropped += 1
            if n_rows is not None:
                self.spans_dropped += n_rows
            raise RuntimeError(ERR_FORCED_DROP)
        return self.next_stage(df)


def shed_predicate(max_n_tok: int) -> Column:
    """Declarative per-row shed gate for the batch pipeline: rows above a
    size cap are shed and counted (MaxBytesPerSpan analog,
    kinesis/config.go:52-53 → length guard, not a sort)."""
    return F.col("n_tok") <= F.lit(max_n_tok)
