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


def test_chunk_sequences_matches_python_replica(spark):
    """Sliding-window chunking equals an independent Python replica on the
    real fixture (window boundaries, overlap, tail handling), and every
    chunk respects the window bound."""
    W, S = 96, 64
    seqs = fx.sequences(spark, 400)
    got = {}
    for r in pk.chunk_sequences(seqs, window=W, stride=S).collect():
        got.setdefault(r.doc_id, {})[r.chunk_no] = list(r.chunk_tokens)
        assert r.chunk_len == len(r.chunk_tokens) <= W
    want = {}
    for r in seqs.select("doc_id", "tokens").collect():
        toks = list(r.tokens)
        n = len(toks)
        import math
        last = max(0, math.ceil((n - W) / S)) * S
        chunks = [toks[s:s + W] for s in range(0, last + 1, S)]
        want[r.doc_id] = {i: c for i, c in enumerate(chunks) if c}
    assert got == want


def test_chunk_sequences_reconstructs_original(spark):
    """Dropping each chunk's leading overlap and concatenating in chunk
    order reproduces the original token array exactly — chunking loses no
    token and duplicates only the declared overlap."""
    W, S = 96, 64
    seqs = fx.sequences(spark, 200)
    chunks = {}
    for r in pk.chunk_sequences(seqs, window=W, stride=S).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_no] = list(r.chunk_tokens)
    originals = {r.doc_id: list(r.tokens)
                 for r in seqs.select("doc_id", "tokens").collect()}
    overlap = W - S
    assert any(len(v) > 1 for v in chunks.values())  # non-vacuous: long docs exist
    for doc_id, by_no in chunks.items():
        rebuilt = []
        for i in sorted(by_no):
            c = by_no[i]
            rebuilt.extend(c if i == 0 else c[overlap:])
        assert rebuilt == originals[doc_id], doc_id


def test_chunk_sequences_is_shuffle_free(spark):
    plan = pk.chunk_sequences(fx.sequences(spark, 200))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ffd_tie_assignments_identical_across_orderings(spark):
    """n_tok ties must not make FFD assignments depend on the incoming row
    order (shuffle/parallelism artifact): the grouped kernel breaks ties on
    the order column, so the doc→pack mapping is identical however the
    input arrives."""
    rows = [(i, "s", i % 7, 100 + (i % 3) * 50) for i in range(60)]
    # doc_id, source, seq_no-ish order values collide → craft unique order
    rows = [(i, "s", i, 100 + (i % 3) * 50) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, seq_no long, n_tok int")
    a = pk.with_pack_id_ffd(df.repartition(1), budget=512, shard_rows=1000)
    b = pk.with_pack_id_ffd(
        df.orderBy(F.desc("doc_id")).repartition(8), budget=512,
        shard_rows=1000)
    ma = {r.doc_id: r.pack_id for r in a.collect()}
    mb = {r.doc_id: r.pack_id for r in b.collect()}
    assert ma == mb
    assert len(set(ma.values())) > 1  # nonvacuous: multiple bins exist


def test_assemble_packs_reconstruction_and_boundaries(spark):
    """assemble_packs invariants: concatenated tokens reconstruct exactly
    the per-doc token arrays in seq_no order; starts/lens are a valid
    partition of the pack (contiguous, start 0, sum = pack_len); every
    doc appears in exactly one pack."""
    budget = 512
    seqs = fx.sequences(spark, 400)
    packed = pk.with_pack_id(seqs, budget=budget)
    out = pk.assemble_packs(packed).collect()

    src = {(r.doc_id): (r.seq_no, r.tokens, r.n_tok)
           for r in seqs.collect()}
    seen_docs = []
    for r in out:
        assert r.n_docs == len(r.doc_ids) == len(r.starts) == len(r.lens)
        assert r.pack_len == sum(r.lens) == len(r.pack_tokens)
        # contiguous boundary partition
        assert r.starts[0] == 0
        for i in range(1, r.n_docs):
            assert r.starts[i] == r.starts[i - 1] + r.lens[i - 1]
        # in-pack order is seq_no order and slices reconstruct each doc
        seq_nos = [src[d][0] for d in r.doc_ids]
        assert seq_nos == sorted(seq_nos)
        for d, s, ln in zip(r.doc_ids, r.starts, r.lens):
            assert r.pack_tokens[s:s + ln] == src[d][1]
            assert ln == src[d][2]
        seen_docs.extend(r.doc_ids)
    assert sorted(seen_docs) == sorted(src)  # exactly-once coverage


def test_finalize_packs_padding_positions_lossmask(spark):
    """finalize_packs invariants: all three arrays share the padded length;
    pads carry pad_id / position 0 / mask 0; positions reset to 0 at every
    doc boundary and count 0..len-1 within each doc; overflow packs keep
    natural length (n_pad = 0)."""
    budget = 512
    seqs = fx.sequences(spark, 300)
    packs = pk.assemble_packs(pk.with_pack_id(seqs, budget=budget))
    raw = {(r.source, r.pack_id): list(r.pack_tokens) for r in packs.collect()}
    out = pk.finalize_packs(packs, budget=budget, pad_id=-7).collect()
    assert out
    saw_pad = saw_overflow = False
    for r in out:
        L = max(budget, r.pack_len)
        assert len(r.padded_tokens) == len(r.position_ids) == \
            len(r.loss_mask) == L
        assert r.n_pad == L - r.pack_len
        if r.n_pad:
            saw_pad = True
            assert set(r.padded_tokens[r.pack_len:]) == {-7}
            assert set(r.position_ids[r.pack_len:]) == {0}
            assert set(r.loss_mask[r.pack_len:]) == {0}
        if r.pack_len > budget:
            saw_overflow = True
        assert all(m == 1 for m in r.loss_mask[:r.pack_len])
        # per-doc position reset
        expect = [p for ln in r.lens for p in range(ln)]
        assert r.position_ids[:r.pack_len] == expect
        assert r.padded_tokens[:r.pack_len] == raw[(r.source, r.pack_id)]
    assert saw_pad  # nonvacuous: padding actually exercised
    assert saw_overflow  # cumsum binning produced at least one spill pack


def test_unpack_roundtrip(spark):
    """unpack(assemble(x)) == x at the (doc_id, tokens) grain — both over
    the raw assembly and over the padded finalize output (pads never leak
    into a doc slice)."""
    seqs = fx.sequences(spark, 350)
    packed = pk.with_pack_id(seqs, budget=512)
    packs = pk.assemble_packs(packed).persist()
    src = {r.doc_id: list(r.tokens) for r in seqs.collect()}

    back = pk.unpack_packs(packs).collect()
    assert len(back) == len(src)
    assert {r.doc_id: list(r.tokens) for r in back} == src
    for r in back:
        assert r.n_tok == len(r.tokens)

    fin = pk.finalize_packs(packs, budget=512, pad_id=-9)
    back2 = pk.unpack_packs(fin, tok_col="padded_tokens").collect()
    assert {r.doc_id: list(r.tokens) for r in back2} == src
    packs.unpersist()
