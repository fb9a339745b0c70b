"""Router fan-out — the TestExportMultiplexing analog
(octrace/opencensus_test.go:172-304): per-sink aggregate-count equality AND
exact routed-row content equality, checked against an independent pure-Python
replica of the fixture arithmetic (the "reference" oracle in-process)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.functions.tokens import tokens_str
from omnition_opentelemetry_service_spark.operators.router import route, sink_counts
from omnition_opentelemetry_service_spark.plans import pipeline as pl

N = 400


# --- pure-Python replica of the fixture + routing arithmetic -----------------
def py_source(i: int) -> str:
    if i % 10 < 6:
        return "web"
    if i % 10 < 8:
        return "books"
    return ["code", "wiki", "news", "forums"][i % 4]


def py_n_tok(i: int) -> int:
    return fx.N_TOK_MIN + i % fx.N_TOK_MOD


def py_tokens(i: int) -> list[int]:
    return [(i * fx.TOKEN_A + k * fx.TOKEN_B) % fx.VOCAB for k in range(py_n_tok(i))]


def py_valid(i: int) -> bool:
    return i % fx.MALFORMED_MOD != fx.MALFORMED_RESIDUE


def py_sample_pass(seq: int, rule_id: int, pct: float) -> bool:
    h = ((seq + rule_id * fx.RULE_SALT) * fx.SAMPLE_A + fx.SAMPLE_B) % fx.SAMPLE_MOD
    return h < int(pct * 100)


def py_routed(n: int) -> list[tuple[str, int, str]]:
    """(doc_id, rule_id, sink) for every routed row."""
    out = []
    for i in range(n):
        if not py_valid(i):
            continue
        src, ntok = py_source(i), py_n_tok(i)
        for rid, psrc, mnt, sink, pct in fx.ROUTE_RULES:
            if (psrc == "*" or psrc == src) and ntok >= mnt and py_sample_pass(i, rid, pct):
                out.append((f"doc-{i:012d}", rid, sink))
    return out


def test_route_fanout_rows_match_replica(spark):
    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=N))
    got = sorted(
        (r.doc_id, r.rule_id, r.sink)
        for r in st["routed"].select("doc_id", "rule_id", "sink").collect()
    )
    assert got == sorted(py_routed(N))


def test_per_sink_counts_match_replica(spark):
    """Per-sink aggregate-count equality — the per-node {1,3,5} span-count
    assertion pattern."""
    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=N))
    got = {r.sink: r.n_rows for r in sink_counts(st["routed"]).collect()}
    expected: dict[str, int] = {}
    for _, _, sink in py_routed(N):
        expected[sink] = expected.get(sink, 0) + 1
    assert got == expected


def test_routed_token_arrays_exact(spark):
    """The BASELINE.json per-row invariant: token-array equality per routed
    row, against the independent Python recompute."""
    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=N))
    rows = (
        st["routed"]
        .filter(F.col("sink") == "sink_kinesis")
        .select("doc_id", tokens_str().alias("ts"))
        .collect()
    )
    assert rows, "kinesis sink should receive rows"
    for r in rows:
        i = int(r.doc_id.split("-")[1])
        assert r.ts == ",".join(map(str, py_tokens(i))), f"token mismatch doc {i}"


def test_rules_are_broadcast(spark):
    """The rules join must be a broadcast (map-side) join — no shuffle of the
    fact side for a 5-row build side."""
    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=N))
    plan = st["routed"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_sampler_deterministic(spark):
    seqs = fx.sequences(spark, 100)
    rules = fx.route_rules(spark)
    a = sorted(r.doc_id for r in route(seqs, rules).select("doc_id").collect())
    b = sorted(r.doc_id for r in route(seqs, rules).select("doc_id").collect())
    assert a == b


def test_envelope_payload_matches_typed_translation(spark):
    """The single-pass envelope's kinesis payloads must carry exactly the
    fields the typed per-sink translation produces — the two surfaces are
    one format, serialized vs typed."""
    from pyspark.sql import functions as F

    from omnition_opentelemetry_service_spark.operators.translate import (
        encode_envelope, translate_for_sink,
    )
    from omnition_opentelemetry_service_spark.plans import pipeline as pl

    st = pl.build_routed(spark, pl.PipelineConfig(n_rows=400))
    typed = {r.doc_id: (r.trace_id, r.span_id, r.operation, r.process,
                        r.start_ts, r.n_tok, r.tenant)
             for r in translate_for_sink(st["routed"], "sink_kinesis").collect()}
    env = encode_envelope(st["routed"]).filter(F.col("sink") == "sink_kinesis")
    got = {r.doc_id: (r.trace_id, r.span_id, r.operation, r.process,
                      r.start_ts, int(r.n_tok), r.tenant)
           for r in env.select(
               "doc_id",
               F.get_json_object("payload", "$.trace_id").alias("trace_id"),
               F.get_json_object("payload", "$.span_id").alias("span_id"),
               F.get_json_object("payload", "$.operation").alias("operation"),
               F.get_json_object("payload", "$.process").alias("process"),
               F.get_json_object("payload", "$.start_ts").alias("start_ts"),
               F.get_json_object("payload", "$.n_tok").alias("n_tok"),
               # tenant included: EVERY typed field is compared — the r2
               # review found the envelope silently dropping tenant while
               # this guard compared everything except it
               F.get_json_object("payload", "$.tenant").alias("tenant"),
           ).collect()}
    assert got == typed


def test_sample_hash_survives_1e12_scale_and_matches_both_engines(spark):
    """The sampler hash must not overflow int64 at the 10^12-sequence design
    scale (the unreduced LCG form overflowed at seq_no ≳ 8.4e9 — ANSI
    ArithmeticException in Spark 4). The reduced form must equal the
    mathematical LCG ((x*A+B) mod m computed with Python big ints) and agree
    bit-for-bit between Spark and DuckDB at every magnitude."""
    import duckdb

    seqs = [0, 1, 9999, 10_000, 8_400_000_000, 10**12, 10**12 + 7919]
    rules = [0, 1, 5]
    cases = [(s, r) for s in seqs for r in rules]
    expr = fx.sample_hash_sql("seq_no", "rule_id")

    df = spark.createDataFrame(cases, "seq_no long, rule_id long")
    got_spark = {(r.seq_no, r.rule_id): r.h
                 for r in df.select("seq_no", "rule_id",
                                    F.expr(expr).alias("h")).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({s}, {r})" for s, r in cases)
    got_duck = {(s, r): h for s, r, h in con.execute(
        f"SELECT seq_no, rule_id, {expr} AS h "
        f"FROM (VALUES {vals}) AS t(seq_no, rule_id)").fetchall()}

    for s, r in cases:
        want = ((s + r * fx.RULE_SALT) * fx.SAMPLE_A + fx.SAMPLE_B) \
            % fx.SAMPLE_MOD  # Python big ints: the unreduced mathematical form
        assert got_spark[(s, r)] == want, (s, r)
        assert got_duck[(s, r)] == want, (s, r)
