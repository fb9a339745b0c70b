"""Node carry-forward ("node multiplexing") — last-non-null per stream in
msg_seq order, pinned by the reference's TestExportMultiplexing
(octrace/opencensus.go:149-175)."""

from __future__ import annotations

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.operators.carryforward import carry_forward


def test_fill_forward_small(spark):
    df = spark.createDataFrame(
        [
            (0, 0, "node-A"), (0, 1, None), (0, 2, None),
            (0, 3, "node-B"), (0, 4, None),
            (1, 0, None),  # stream starts with no node → stays null
            (1, 1, "node-C"), (1, 2, None),
        ],
        "stream_id int, msg_seq int, node_host string",
    )
    got = {
        (r.stream_id, r.msg_seq): r.node_host_filled
        for r in carry_forward(df).collect()
    }
    assert got == {
        (0, 0): "node-A", (0, 1): "node-A", (0, 2): "node-A",
        (0, 3): "node-B", (0, 4): "node-B",
        (1, 0): None, (1, 1): "node-C", (1, 2): "node-C",
    }


def test_fill_forward_fixture_every_row_has_node(spark):
    """Fixture sets node_host on every 16th msg per stream starting at 0, so
    after fill EVERY row has a node (first-message-carries-Node contract)."""
    n = fx.STREAMS * fx.NODE_EVERY * 2
    filled = carry_forward(fx.raw_payloads(spark, n))
    assert filled.filter(filled.node_host_filled.isNull()).count() == 0


def test_fill_is_per_stream(spark):
    n = fx.STREAMS * fx.NODE_EVERY
    rows = carry_forward(fx.raw_payloads(spark, n)).collect()
    for r in rows:
        assert r.node_host_filled.startswith(f"host-{r.stream_id}-")


def _fills(df_out):
    return sorted(
        (r.stream_id, r.msg_seq, r.node_host_filled) for r in df_out.collect())


def test_scalable_equals_window_fill(spark):
    """carry_forward_scalable must be value-identical to the plain window
    fill — including when partition boundaries split streams (many more
    partitions than streams forces intra-stream splits)."""
    from omnition_opentelemetry_service_spark.operators.carryforward import (
        carry_forward_scalable,
    )

    n = fx.STREAMS * fx.NODE_EVERY * 3
    pay = fx.raw_payloads(spark, n)
    expect = _fills(carry_forward(pay))
    # slice sizes below NODE_EVERY force slices with no non-null value and
    # intra-stream splits everywhere
    for slice_rows in (4, 16, 1 << 16):
        got = _fills(carry_forward_scalable(pay, slice_rows=slice_rows))
        assert got == expect, f"mismatch at slice_rows={slice_rows}"


def test_scalable_handles_leading_and_allnull_slices(spark):
    """Streams that start null and partitions whose slice is entirely null
    must still carry values across partition boundaries."""
    from omnition_opentelemetry_service_spark.operators.carryforward import (
        carry_forward_scalable,
    )

    rows = [(0, i, "A" if i == 3 else None) for i in range(200)] + \
           [(1, i, None) for i in range(200)]
    df = spark.createDataFrame(
        rows, "stream_id int, msg_seq int, node_host string")
    got = {(r.stream_id, r.msg_seq): r.node_host_filled
           for r in carry_forward_scalable(df, slice_rows=16).collect()}
    for i in range(200):
        assert got[(0, i)] == (None if i < 3 else "A")
        assert got[(1, i)] is None


def test_property_both_forms_match_python_fill(spark):
    """Window form == sliced scalable form == pure-python fill on arbitrary
    (stream, order, value) shapes — tiny slice_rows forces many boundary
    carries, interleaved NULL runs stress the carry-in coalesce."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from omnition_opentelemetry_service_spark.operators.carryforward import (
        carry_forward, carry_forward_scalable)

    SET = settings(max_examples=5, deadline=None, derandomize=True,
                   suppress_health_check=[HealthCheck.function_scoped_fixture])

    @SET
    @given(st.lists(
        st.tuples(st.integers(0, 3),            # stream
                  st.one_of(st.none(),
                            st.sampled_from(["a", "b", "c"]))),  # value
        min_size=1, max_size=60))
    def run(rows):
        data = [(s, i, v) for i, (s, v) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "stream_id int, msg_seq int, node_host string")
        a = sorted((r.stream_id, r.msg_seq, r.node_host_filled)
                   for r in carry_forward(df).collect())
        b = sorted((r.stream_id, r.msg_seq, r.node_host_filled)
                   for r in carry_forward_scalable(
                       df, slice_rows=4).collect())
        # python model: last non-null per stream in msg_seq order
        want = []
        last: dict[int, str | None] = {}
        for s, i, v in sorted(data, key=lambda t: (t[0], t[1])):
            if v is not None:
                last[s] = v
            want.append((s, i, last.get(s)))
        assert a == sorted(want)
        assert b == sorted(want)

    run()
