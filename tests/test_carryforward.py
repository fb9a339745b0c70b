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
