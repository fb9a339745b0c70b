"""The per-row invariant (BASELINE.json input_hint): token arrays survive
every path — Arrow/pandas round-trip, parquet round-trip, checksum — exactly,
as int32, no upcast/nullability drift (SURVEY.md §7 hard part (a))."""

from __future__ import annotations

from collections.abc import Iterator

from omnition_opentelemetry_service_spark import fixtures as fx
from omnition_opentelemetry_service_spark.functions.tokens import (
    tokens_checksum,
    tokens_str,
)

N = 300


def _py_tokens(i: int) -> list[int]:
    n = fx.N_TOK_MIN + i % fx.N_TOK_MOD
    return [(i * fx.TOKEN_A + k * fx.TOKEN_B) % fx.VOCAB for k in range(n)]


def test_generator_matches_python_replica(spark):
    rows = fx.sequences(spark, N).select("seq_no", "tokens", "n_tok").collect()
    assert len(rows) == N
    for r in rows:
        expect = _py_tokens(r.seq_no)
        assert list(r.tokens) == expect
        assert r.n_tok == len(expect)


def test_tokens_survive_arrow_roundtrip_as_int32(spark):
    """mapInPandas identity: tokens must come back bit-identical and typed
    array<int> (pandas upcasts int32→int64/float unless pinned)."""
    seqs = fx.sequences(spark, N)

    def identity(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in it:
            pdf["tokens"] = pdf["tokens"].map(
                lambda a: np.asarray(a, dtype=np.int32))
            yield pdf

    schema = "doc_id string, tokens array<int>, n_tok int, source string, seq_no long"
    back = seqs.select("doc_id", "tokens", "n_tok", "source", "seq_no") \
        .mapInPandas(identity, schema=schema)
    assert back.schema["tokens"].dataType.simpleString() == "array<int>"
    got = {r.seq_no: list(r.tokens) for r in back.collect()}
    for i in range(N):
        assert got[i] == _py_tokens(i)


def test_tokens_survive_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "seqs")
    fx.sequences(spark, N).write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema["tokens"].dataType.simpleString() == "array<int>"
    got = {r.seq_no: list(r.tokens) for r in back.collect()}
    assert all(got[i] == _py_tokens(i) for i in range(N))


def test_checksum_matches_python(spark):
    rows = fx.sequences(spark, 50).select(
        "seq_no", tokens_checksum().alias("cs")).collect()
    M = 144115188075855859
    for r in rows:
        acc = 7
        for t in _py_tokens(r.seq_no):
            acc = (acc * 31 + t) % M
        assert r.cs == acc


def test_tokens_str_canonical(spark):
    rows = fx.sequences(spark, 10).select(
        "seq_no", tokens_str().alias("s")).collect()
    for r in rows:
        assert r.s == ",".join(map(str, _py_tokens(r.seq_no)))


def test_token_group_cols_partition_exactly_like_md5(spark):
    """The native array-hash grouping key (token_group_cols) must induce
    EXACTLY the md5-of-canonical-string partition on the fixture — same
    groups → same (keep_id, dup_cnt) output (the surface the oracle
    compares). Also pins that the key sees ORDER (reversed arrays differ)
    and LENGTH (prefix arrays differ)."""
    from pyspark.sql import functions as F

    from omnition_opentelemetry_service_spark.functions.tokens import (
        token_group_cols, tokens_str)

    seqs = fx.sequences(spark, 20_000)
    native = sorted(map(tuple, (
        seqs.groupBy(*token_group_cols())
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_cnt"))
        .select("keep_id", "dup_cnt")).collect()))
    md5_form = sorted(map(tuple, (
        seqs.groupBy(F.md5(tokens_str()).alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_cnt"))
        .select("keep_id", "dup_cnt")).collect()))
    assert native == md5_form

    tricky = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [3, 2, 1]), (3, [1, 2]), (4, [1, 2, 3]),
         (5, []), (6, [0]), (7, None)],
        "doc_id long, tokens array<int>")
    groups = (tricky.groupBy(*token_group_cols())
              .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
              .collect())
    sets = sorted(tuple(r.ids) for r in groups)
    assert sets == [(1, 4), (2,), (3,), (5,), (6,), (7,)]
