"""Drop/allow state machine with injected memory readings — the reference's
``readMemStatsFn`` seam test (memorylimiter_test.go:104-157) translated."""

from __future__ import annotations

import pytest

from omnition_opentelemetry_service_spark.operators.memorylimiter import (
    ERR_FORCED_DROP,
    MIB,
    MemoryLimiter,
    MemoryLimiterConfig,
)


class FakeAlloc:
    def __init__(self, value: int = 0) -> None:
        self.value = value

    def __call__(self) -> int:
        return self.value


def make(alloc: FakeAlloc, limit_mib: int = 1024, spike_mib: int = 0,
         ballast_mib: int = 0) -> MemoryLimiter:
    return MemoryLimiter(
        "ml",
        lambda df: df,
        MemoryLimiterConfig(0.25, limit_mib, spike_mib, ballast_mib),
        read_alloc_fn=alloc,
    )


def test_below_limit_passes_through():
    ml = make(FakeAlloc(100 * MIB))
    assert not ml.forcing_drop()
    sentinel = object()
    assert ml.consume(sentinel, n_rows=10) is sentinel
    assert ml.spans_dropped == 0 and ml.batches_dropped == 0


def test_above_limit_drops_whole_batch_with_counters():
    ml = make(FakeAlloc(2048 * MIB))
    assert ml.forcing_drop()
    with pytest.raises(RuntimeError) as ei:
        ml.consume(object(), n_rows=55)
    assert str(ei.value) == ERR_FORCED_DROP
    # whole-batch drop: spans_dropped Sum + batches_dropped Count
    # (metrics.go:33-59 semantics)
    assert ml.spans_dropped == 55
    assert ml.batches_dropped == 1


def test_spike_limit_triggers_before_hard_limit():
    alloc = FakeAlloc(900 * MIB)
    ml = make(alloc, limit_mib=1024, spike_mib=200)
    assert ml.forcing_drop()  # 1024-900=124 <= 200
    alloc.value = 700 * MIB
    assert not ml.forcing_drop()  # 1024-700=324 > 200


def test_ballast_subtracted_from_reading():
    alloc = FakeAlloc(2048 * MIB)
    ml = make(alloc, limit_mib=1024, ballast_mib=1536)
    assert not ml.forcing_drop()  # 2048-1536=512 < 1024


def test_state_machine_recovers_after_gc():
    alloc = FakeAlloc(2048 * MIB)
    ml = make(alloc)
    with pytest.raises(RuntimeError):
        ml.consume(object(), n_rows=5)
    alloc.value = 100 * MIB  # "GC freed memory"
    sentinel = object()
    assert ml.consume(sentinel, n_rows=5) is sentinel
    assert ml.batches_dropped == 1 and ml.spans_dropped == 5


def test_negative_alloc_limit_rejected():
    """The sentinel's own contract is 'greater than zero': a NEGATIVE limit
    must raise ERR_MEM_ALLOC_LIMIT (not slip through and force-drop every
    batch via alloc >= negative_limit)."""
    from omnition_opentelemetry_service_spark.operators.memorylimiter import (
        ERR_MEM_ALLOC_LIMIT)

    cfg = MemoryLimiterConfig(
        check_interval_s=1, mem_alloc_limit_mib=-100, mem_spike_limit_mib=-200)
    with pytest.raises(ValueError, match=ERR_MEM_ALLOC_LIMIT):
        MemoryLimiter("lim", lambda df: df, cfg)
