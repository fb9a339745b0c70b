"""Size-cap guards (TruncatableString / MaxBytesPerSpan analogs) and
sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.operators import caps
from omnition_opentelemetry_service_spark.operators import packing as pk


def test_truncatable_value_and_count(spark):
    df = spark.createDataFrame(
        [("short",), ("exactly-10",), ("this one is too long",)],
        "s string")
    rows = df.select(*caps.truncatable("s", 10)).collect()
    got = {(r.s_value, r.s_truncated) for r in rows}
    assert got == {("short", 0), ("exactly-10", 0), ("this one i", 10)}


def test_reject_oversized_split_counts(spark):
    seqs = fx.sequences(spark, 300)
    kept, rejected = caps.reject_oversized(seqs, "n_tok", 100)
    n_over = sum(1 for i in range(300) if fx.N_TOK_MIN + i % fx.N_TOK_MOD > 100)
    assert rejected.count() == n_over
    assert kept.count() == 300 - n_over
    assert rejected.filter(F.col("n_tok") <= 100).count() == 0


def test_pack_ids_monotone_and_bounded(spark):
    budget = 512
    packed = pk.with_pack_id(fx.sequences(spark, 500), budget=budget)
    rows = sorted(
        ((r.source, r.seq_no, r.pack_id, r.n_tok)
         for r in packed.collect()))
    # per source: pack_id non-decreasing in seq_no; bin totals can exceed the
    # budget only by the last sequence placed (offset binning contract)
    by_src: dict[str, list] = {}
    for src, seq_no, pid, n_tok in rows:
        by_src.setdefault(src, []).append((seq_no, pid, n_tok))
    for src, lst in by_src.items():
        lst.sort()
        pids = [p for _, p, _ in lst]
        assert pids == sorted(pids), f"pack_id not monotone for {src}"
        # recompute via running offset
        off = 0
        for seq_no, pid, n_tok in lst:
            assert pid == off // budget
            off += n_tok


def test_pack_stats_totals(spark):
    packed = pk.with_pack_id(fx.sequences(spark, 500), budget=512)
    stats = pk.pack_stats(packed)
    total = stats.agg(F.sum("n_seqs"), F.sum("pack_tokens")).collect()[0]
    expect_tokens = sum(fx.N_TOK_MIN + i % fx.N_TOK_MOD for i in range(500))
    assert total[0] == 500 and total[1] == expect_tokens


def test_json_gateway_matches_grok_fields(spark):
    """JSON branch and grok branch agree on the shared fields for the same
    row index (the HTTP-JSON→proto equality test pattern,
    opencensusreceiver/opencensus_test.go:49-158)."""
    from omnition_opentelemetry_service_spark.functions import parse as p

    n = 100
    grok = (p.parse_payload_native(fx.raw_payloads(spark, n))
            .filter(F.col("valid")).select("doc_id", "ts_str", "src", "n_tok", "msg"))
    js = (p.parse_json_gateway(fx.raw_json_payloads(spark, n))
          .select("doc_id", "ts_str", "src", "n_tok", "msg"))
    g = {r.doc_id: tuple(r)[1:] for r in grok.collect()}
    j = {r.doc_id: tuple(r)[1:] for r in js.collect()}
    for doc_id, vals in g.items():  # grok side excludes malformed rows
        assert j[doc_id] == vals


def test_ffd_packing_no_overflow_and_better_fill(spark):
    """FFD contract: no bin exceeds the budget (unlike cumsum binning, which
    may overflow by one sequence), and mean fill is at least as good."""
    from omnition_opentelemetry_service_spark import fixtures as fx
    from omnition_opentelemetry_service_spark.operators import packing as pk

    seqs = fx.sequences(spark, 2000)
    budget = 512

    ffd = pk.with_pack_id_ffd(seqs, budget=budget, shard_rows=500)
    ffd_stats = pk.pack_stats(ffd).collect()
    assert all(r.pack_tokens <= budget for r in ffd_stats)  # hard cap
    assert ffd.count() == 2000  # lossless

    cum = pk.with_pack_id(seqs, budget=budget)
    cum_stats = pk.pack_stats(cum).collect()
    assert any(r.pack_tokens > budget for r in cum_stats)  # cumsum overflows

    # fill quality: FFD's bins (excluding each (key,shard)'s tail bin) are
    # well filled
    fills = [r.pack_tokens / budget for r in ffd_stats]
    assert sum(fills) / len(fills) > 0.6
