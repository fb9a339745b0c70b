"""Deterministic pipeline fixtures (FIXTURES.md F1-F4).

One row = one pre-tokenized training sequence — the rebuild's analog of a
span inside a ``consumerdata.TraceData`` batch (reference
receiver/opencensusreceiver/octrace/opencensus.go:166-171). Every column is a
pure function of the row index ``i`` (seed-free, partition-independent), so
generation is embarrassingly parallel: at sandbox scale it is
``spark.range(n)`` + column expressions; at 10^12-sequence scale the same
expressions run over a partitioned ``spark.range`` or an Iceberg scan.

Parity contract: each fixture has BOTH a Spark generator and a DuckDB SQL
CTE built from the *same* arithmetic, so the driver's oracle compare is
exact. Where Spark SQL and DuckDB SQL share syntax, the fragment is a single
shared string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared deterministic constants (change = breaking the oracle; don't).
# ---------------------------------------------------------------------------
TOKEN_A = 2654435761  # Knuth multiplicative-hash constant
TOKEN_B = 40503
VOCAB = 50257  # GPT-2-ish vocab size
# Token expressions reduce i mod VOCAB BEFORE the multiply — identical
# values ((i*A)%V == ((i%V)*A)%V) but (V-1)*A ≈ 1.3e14 never overflows
# int64, where the unreduced product does at i ≥ ~3.47e9 (ANSI raises in
# BOTH engines). The trace-id hex(i*A+17) keeps the full product (its hex
# IS the value, so no value-preserving reduction exists): generator ids
# are valid to that same ~3.47e9 bound and fail LOUDLY past it — the
# at-scale job reads materialized tables, never generates at 10^12.
N_TOK_MIN = 16
N_TOK_MOD = 241
SAMPLE_A = 1103515245  # glibc LCG constants — deterministic sampler hash
SAMPLE_B = 12345
SAMPLE_MOD = 10000
RULE_SALT = 7919
STREAMS = 64  # gRPC-stream analog count (node carry-forward, F2)
NODE_EVERY = 16  # node_host set every 16th msg per stream
MALFORMED_MOD = 20
MALFORMED_RESIDUE = 13  # i % 20 == 13 → truncated payload (~5%)
EPOCH0 = 1767225600  # 2026-01-01T00:00:00Z
N_HOSTS = 8

SOURCES = ["web", "books", "code", "wiki", "news", "forums"]
PRIORITY = {"web": 1, "books": 2, "code": 3, "wiki": 4, "news": 5, "forums": 6}
LEVELS = ["INFO", "WARN", "ERROR", "DEBUG", "TRACE"]

ROUTE_RULES = [
    # (rule_id, predicate_source, min_n_tok, sink, sample_pct)
    (1, "*", 0, "sink_archive", 100.0),
    (2, "web", 64, "sink_kinesis", 100.0),
    (3, "books", 0, "sink_oc", 100.0),
    (4, "*", 128, "sink_metrics", 100.0),
    (5, "web", 0, "sink_logging", 25.0),
]

# --- SQL fragments valid in BOTH Spark SQL and DuckDB (keyed on column i) ---
SOURCE_CASE_SQL = (
    "CASE WHEN i % 10 < 6 THEN 'web' WHEN i % 10 < 8 THEN 'books' "
    "ELSE CASE CAST(i % 4 AS INT) WHEN 0 THEN 'code' WHEN 1 THEN 'wiki' "
    "WHEN 2 THEN 'news' ELSE 'forums' END END"
)
N_TOK_SQL = f"CAST({N_TOK_MIN} + i % {N_TOK_MOD} AS INT)"
DOC_ID_SQL = "concat('doc-', lpad(CAST(i AS STRING), 12, '0'))"
DOC_ID_SQL_DUCK = "concat('doc-', lpad(CAST(i AS VARCHAR), 12, '0'))"
LEVEL_CASE_SQL = (
    "CASE CAST(i % 5 AS INT) WHEN 0 THEN 'INFO' WHEN 1 THEN 'WARN' "
    "WHEN 2 THEN 'ERROR' WHEN 3 THEN 'DEBUG' ELSE 'TRACE' END"
)


def _indexed_range(spark: SparkSession, n: int,
                   num_partitions: int | None = None,
                   start: int = 0) -> DataFrame:
    """The shared generator prologue: an `i` index column over
    [start, n) at the requested (default: session) parallelism — one
    definition for every fixture generator."""
    df = spark.range(start, n, 1,
                     num_partitions or spark.sparkContext.defaultParallelism)
    return df.withColumnRenamed("id", "i")


# ---------------------------------------------------------------------------
# Materialized-fixture redirect (bench-only). Fixture generation inside the
# timed query conflates generator cost with operator cost — a generator-side
# change (e.g. r2's overflow-safe token arithmetic) then reads as an operator
# regression in the per-query deltas (VERDICT r2 "What's wrong" #3). bench.py
# materializes each generator's output to parquet ONCE per run and flips this
# switch; the correctness gate never sets it, so oracle parity always runs
# against the generators themselves.
# ---------------------------------------------------------------------------
_MATERIALIZED_DIR: str | None = None


def set_materialized_fixtures(path: str | None) -> None:
    """Redirect the default-shaped F1/F2 generator calls (start=0, default
    partitioning) to parquet written by :func:`materialize_fixture_tables`
    under ``path``; ``None`` restores generation."""
    global _MATERIALIZED_DIR
    _MATERIALIZED_DIR = path


def _materialized(spark: SparkSession, name: str, n: int) -> DataFrame | None:
    if _MATERIALIZED_DIR is None:
        return None
    import os

    p = os.path.join(_MATERIALIZED_DIR, f"{name}_{n}")
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        return None
    return spark.read.parquet(p)


def _source_fingerprint() -> str:
    """md5 prefix of THIS module's source — the generators are pure
    functions of (n, this file), so the cache key must include the file:
    a persistent /tmp cache keyed on n alone would silently feed stale
    data into bench after any generator change."""
    import hashlib

    with open(__file__, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()[:10]


def materialize_fixture_tables(spark: SparkSession, n: int,
                               path: str) -> str:
    """Write each redirectable generator's output once under
    ``{path}_{source-fingerprint}`` (skips tables whose _SUCCESS marker
    already exists — valid because the fingerprinted dir pins the
    generator version). Returns the fingerprinted dir; pass THAT to
    set_materialized_fixtures."""
    import os

    path = f"{path}_{_source_fingerprint()}"
    for name, gen in _REDIRECTABLE.items():
        p = os.path.join(path, f"{name}_{n}")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            gen(spark, n).write.mode("overwrite").parquet(p)
    return path


def raw_json_payloads(spark: SparkSession, n: int,
                      num_partitions: int | None = None) -> DataFrame:
    """(doc_id, payload) — JSON-encoded rows, the HTTP/JSON gateway analog
    (reference POST /v1/trace JSON bodies, opencensusreceiver/opencensus.go:
    261-268; field shapes opencensus_test.go:75-92). Built by string concat
    (not to_json) so both engines produce byte-identical payloads."""
    if num_partitions is None:
        m = _materialized(spark, "json_payloads", n)
        if m is not None:
            return m
    df = _indexed_range(spark, n, num_partitions)
    ts = (f"date_format(timestamp_seconds({EPOCH0} + i), "
          "\"yyyy-MM-dd'T'HH:mm:ss'Z'\")")
    payload = (
        "concat('{\"ts\":\"', " + ts + ", '\",\"src\":\"', "
        f"({SOURCE_CASE_SQL}), '\",\"n\":', CAST({N_TOK_SQL} AS STRING), "
        "',\"msg\":\"seq ', CAST(i AS STRING), '\"}')"
    )
    return df.select(
        F.expr(DOC_ID_SQL).alias("doc_id"),
        F.expr(payload).alias("payload"),
    )


def raw_json_payloads_sql_duck(n: int) -> str:
    ts = ("strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(i), "
          "'%Y-%m-%dT%H:%M:%SZ')")
    return f"""
    SELECT
      {DOC_ID_SQL_DUCK} AS doc_id,
      concat('{{"ts":"', {ts}, '","src":"', ({SOURCE_CASE_SQL}),
             '","n":', CAST({N_TOK_SQL} AS VARCHAR),
             ',"msg":"seq ', CAST(i AS VARCHAR), '"}}') AS payload
    FROM (SELECT range AS i FROM range(0, {n}))
    """


def raw_zipkin_payloads(spark: SparkSession, n: int,
                        num_partitions: int | None = None) -> DataFrame:
    """(doc_id, payload) — Zipkin-v2-style JSON spans, the zipkin receiver
    analog (reference components.go:48): nested localEndpoint object, string
    tag map, epoch-micros timestamp — a structurally different wire shape
    from both the grok lines and the flat JSON gateway. Built by string
    concat so both engines produce byte-identical payloads."""
    if num_partitions is None:
        m = _materialized(spark, "zipkin_payloads", n)
        if m is not None:
            return m
    df = _indexed_range(spark, n, num_partitions)
    ts_us = f"CAST(({EPOCH0} + i) AS BIGINT) * 1000000"
    payload = (
        "concat('{\"traceId\":\"', lpad(lower(hex(i * " + str(TOKEN_A) + " + 17)), 32, '0'), "
        "'\",\"name\":\"seq ', CAST(i AS STRING), "
        f"'\", \"timestamp\":', CAST({ts_us} AS STRING), "
        f"',\"localEndpoint\":{{\"serviceName\":\"', ({SOURCE_CASE_SQL}), "
        f"'\"}}, \"tags\":{{\"n_tok\":\"', CAST({N_TOK_SQL} AS STRING), '\"}}}}')"
    )
    return df.select(
        F.expr(DOC_ID_SQL).alias("doc_id"),
        F.expr(payload).alias("payload"),
    )


def raw_zipkin_payloads_sql_duck(n: int) -> str:
    ts_us = f"CAST(({EPOCH0} + i) AS BIGINT) * 1000000"
    return f"""
    SELECT
      {DOC_ID_SQL_DUCK} AS doc_id,
      concat('{{"traceId":"', lpad(lower(hex(i * {TOKEN_A} + 17)), 32, '0'),
             '","name":"seq ', CAST(i AS VARCHAR),
             '", "timestamp":', CAST({ts_us} AS VARCHAR),
             ',"localEndpoint":{{"serviceName":"', ({SOURCE_CASE_SQL}),
             '"}}, "tags":{{"n_tok":"', CAST({N_TOK_SQL} AS VARCHAR), '"}}}}') AS payload
    FROM (SELECT range AS i FROM range(0, {n}))
    """


def raw_jaeger_payloads(spark: SparkSession, n: int,
                        num_partitions: int | None = None) -> DataFrame:
    """(doc_id, payload) — Jaeger-JSON-style spans, the jaeger receiver
    analog (reference components.go:47): process.serviceName and tags as an
    ARRAY OF STRUCTS {key, vType, vStr} — the fourth wire shape, structurally
    distinct from grok lines, flat JSON, and Zipkin's string tag MAP. A
    decoy first tag forces decoders to SEARCH the array (positional
    extraction reads the wrong tag). Built by string concat so both engines
    produce byte-identical payloads."""
    if num_partitions is None:
        m = _materialized(spark, "jaeger_payloads", n)
        if m is not None:
            return m
    df = _indexed_range(spark, n, num_partitions)
    ts_us = f"CAST(({EPOCH0} + i) AS BIGINT) * 1000000"
    payload = (
        "concat('{\"traceID\":\"', lpad(lower(hex(i * " + str(TOKEN_A) + " + 17)), 32, '0'), "
        "'\",\"operationName\":\"seq ', CAST(i AS STRING), "
        f"'\",\"startTime\":', CAST({ts_us} AS STRING), "
        f"',\"process\":{{\"serviceName\":\"', ({SOURCE_CASE_SQL}), "
        f"'\",\"tags\":[{{\"key\":\"lvl\",\"vType\":\"string\",\"vStr\":\"', ({LEVEL_CASE_SQL}), "
        f"'\"}}, {{\"key\":\"n_tok\",\"vType\":\"string\",\"vStr\":\"', CAST({N_TOK_SQL} AS STRING), "
        "'\"}]}}')"
    )
    return df.select(
        F.expr(DOC_ID_SQL).alias("doc_id"),
        F.expr(payload).alias("payload"),
    )


def raw_jaeger_payloads_sql_duck(n: int) -> str:
    ts_us = f"CAST(({EPOCH0} + i) AS BIGINT) * 1000000"
    return f"""
    SELECT
      {DOC_ID_SQL_DUCK} AS doc_id,
      concat('{{"traceID":"', lpad(lower(hex(i * {TOKEN_A} + 17)), 32, '0'),
             '","operationName":"seq ', CAST(i AS VARCHAR),
             '","startTime":', CAST({ts_us} AS VARCHAR),
             ',"process":{{"serviceName":"', ({SOURCE_CASE_SQL}),
             '","tags":[{{"key":"lvl","vType":"string","vStr":"', ({LEVEL_CASE_SQL}),
             '"}}, {{"key":"n_tok","vType":"string","vStr":"', CAST({N_TOK_SQL} AS VARCHAR),
             '"}}]}}}}') AS payload
    FROM (SELECT range AS i FROM range(0, {n}))
    """


def materialize_input(spark: SparkSession, n: int, out_dir: str,
                      num_partitions: int | None = None) -> None:
    """Write the F1/F2 fixture tables to parquet — the sandbox stand-in for
    the 10^12-row Iceberg token table (BASELINE.json input_hint). Benchmarks
    read THIS, so the measured job is scan→parse→join→route, not on-the-fly
    generation."""
    raw_payloads(spark, n, num_partitions).write.mode("overwrite").parquet(
        f"{out_dir}/payloads")
    sequences(spark, n, num_partitions).write.mode("overwrite").parquet(
        f"{out_dir}/sequences")


def materialize_input_bucketed(spark: SparkSession, n: int, db: str = "bench",
                               buckets: int = 16,
                               num_partitions: int | None = None) -> None:
    """Write the token tables BUCKETED by the join key (doc_id) — the 100 TB
    layout: payloads ⨝ sequences becomes a co-located join with NO exchange
    on either (huge) side. This is the Iceberg `bucket(N, doc_id)` partition
    transform expressed through the session catalog; the shuffle the plain
    parquet layout pays (2 exchanges + sort of 10^12 rows) disappears.

    The repartition BEFORE bucketBy is load-bearing: each writer task emits
    one file per bucket it holds, so writing from M>buckets partitions
    leaves M files per bucket — and Spark only trusts the sortBy order for
    ONE-file buckets, silently re-SORTING both join sides in-task otherwise
    (measured 2.3× the CPU of the merge-only plan). Repartitioning on the
    bucket key first (same hash family as bucketBy) gives exactly one
    sorted file per bucket: the join is then a pure streaming merge — no
    exchange, no sort, no broadcast build."""
    import os

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for name, df in (("payloads", raw_payloads(spark, n, num_partitions)),
                     ("sequences", sequences(spark, n, num_partitions))):
        (df.repartition(buckets, "doc_id").write.mode("overwrite")
         .bucketBy(buckets, "doc_id").sortBy("doc_id")
         .format("parquet").saveAsTable(f"{db}.{name}"))
    # persist the bucket count next to the data: a fresh session that
    # re-registers these tables MUST declare the same count — a mismatch
    # makes bucket-pruned scans read the wrong files silently
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    with open(os.path.join(wh, f"{db}.db", "_BUCKETS"), "w") as f:
        f.write(str(buckets))


BUCKETED_SCHEMAS = {
    "payloads": ("doc_id string, payload string, stream_id int, "
                 "msg_seq int, node_host string"),
    "sequences": ("doc_id string, tokens array<int>, n_tok int, "
                  "source string, seq_no bigint"),
}


def register_bucketed_input(spark: SparkSession, db: str = "bench",
                            buckets: int | None = None) -> None:
    """Re-register the bucketed tables written by materialize_input_bucketed
    in a NEW session's catalog (the default in-memory catalog does not
    persist table metadata across processes; the files + bucket layout do).
    No-op if the tables already exist in this session.

    The bucket count comes from the _BUCKETS marker the materializer wrote
    beside the tables — declaring a DIFFERENT count than the files were
    hashed with would make bucket-pruned scans read the wrong bucket and
    silently drop rows. An explicit ``buckets`` overrides (for layouts
    produced by other writers); with neither, registration fails loudly."""
    import os

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if buckets is None:
        marker = os.path.join(wh.removeprefix("file:"), f"{db}.db",
                              "_BUCKETS")
        try:
            with open(marker) as f:
                buckets = int(f.read().strip())
        except (FileNotFoundError, ValueError) as e:
            raise ValueError(
                f"register_bucketed_input: no _BUCKETS marker under "
                f"{marker} and no explicit buckets= given — declaring a "
                "guessed count would silently mis-prune bucketed scans"
            ) from e
    for name, schema in BUCKETED_SCHEMAS.items():
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{name} ({schema}) "
            f"USING parquet CLUSTERED BY (doc_id) SORTED BY (doc_id) "
            f"INTO {buckets} BUCKETS LOCATION '{wh}/{db}.db/{name}'"
        )


def n_rows_for_sf_dir(sf_dir: str, per_sf: int = 2_000_000) -> int:
    """Fixture row count for a testdata dir: sf0.001→2k, sf0.01→20k, sf0.1→200k."""
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.01
    return max(int(per_sf * sf), 100)


# ---------------------------------------------------------------------------
# F1. sequences — primary input (BASELINE.json input_hint shape)
# ---------------------------------------------------------------------------
def sequences(spark: SparkSession, n: int, num_partitions: int | None = None,
              start: int = 0) -> DataFrame:
    """(doc_id string, tokens array<int>, n_tok int, source string, seq_no bigint).

    ``seq_no`` (= row index i) rides along as the deterministic identity used
    by the sampler hash; at 10^12 scale it is the Iceberg-supplied row id.
    ``start`` lets two generator branches cover disjoint index ranges (the
    multi-receiver union analog).
    """
    if start == 0 and num_partitions is None:
        m = _materialized(spark, "sequences", n)
        if m is not None:
            return m
    df = _indexed_range(spark, n, num_partitions, start)
    return df.select(
        F.expr(DOC_ID_SQL).alias("doc_id"),
        F.expr(
            f"transform(sequence(0, {N_TOK_SQL} - 1), "
            f"k -> CAST(((i % {VOCAB}) * {TOKEN_A} + k * {TOKEN_B}) % {VOCAB} AS INT))"
        ).alias("tokens"),
        F.expr(N_TOK_SQL).alias("n_tok"),
        F.expr(SOURCE_CASE_SQL).alias("source"),
        F.col("i").alias("seq_no"),
    )


def sequences_sql_duck(n: int) -> str:
    """DuckDB CTE body producing the identical F1 table."""
    return f"""
    SELECT
      {DOC_ID_SQL_DUCK} AS doc_id,
      list_transform(range({N_TOK_SQL}),
                     k -> CAST(((i % {VOCAB}) * {TOKEN_A} + k * {TOKEN_B}) % {VOCAB} AS INTEGER)) AS tokens,
      {N_TOK_SQL} AS n_tok,
      {SOURCE_CASE_SQL} AS source,
      i AS seq_no
    FROM (SELECT range AS i FROM range(0, {n}))
    """


# ---------------------------------------------------------------------------
# F2. raw_payloads — parse-stage input (receiver analog)
# ---------------------------------------------------------------------------
_PAYLOAD_SPARK = (
    "concat(date_format(timestamp_seconds({epoch} + i), \"yyyy-MM-dd'T'HH:mm:ss'Z'\"), "
    "' host=h', CAST(i % {hosts} AS STRING), "
    "' lvl=', {lvl}, "
    "' src=', {src}, "
    "' n=', CAST({ntok} AS STRING), "
    "' trace=', lpad(lower(hex(i * {ta} + 17)), 32, '0'), "
    "' msg=\"seq ', CAST(i AS STRING), '\"')"
)
_PAYLOAD_DUCK = (
    "concat(strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(i), '%Y-%m-%dT%H:%M:%SZ'), "
    "' host=h', CAST(i % {hosts} AS VARCHAR), "
    "' lvl=', {lvl}, "
    "' src=', {src}, "
    "' n=', CAST({ntok} AS VARCHAR), "
    "' trace=', lpad(lower(hex(i * {ta} + 17)), 32, '0'), "
    "' msg=\"seq ', CAST(i AS VARCHAR), '\"')"
)


def raw_payloads(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, payload, stream_id, msg_seq, node_host) — grok-able log lines.

    ~5% of rows are truncated (malformed) to exercise the
    protocol-violation/quarantine path (reference
    octrace/opencensus.go:119-121: missing Node → error + drop counters).
    ``node_host`` is NULL except every 16th message per stream — the Node
    carry-forward ("node multiplexing") input, octrace/opencensus.go:149-175.
    """
    if num_partitions is None:
        m = _materialized(spark, "payloads", n)
        if m is not None:
            return m
    df = _indexed_range(spark, n, num_partitions)
    payload_full = _PAYLOAD_SPARK.format(
        epoch=EPOCH0, hosts=N_HOSTS, lvl=f"({LEVEL_CASE_SQL})",
        src=f"({SOURCE_CASE_SQL})", ntok=N_TOK_SQL, ta=TOKEN_A,
    )
    return df.select(
        F.expr(DOC_ID_SQL).alias("doc_id"),
        F.expr(
            f"CASE WHEN i % {MALFORMED_MOD} = {MALFORMED_RESIDUE} "
            f"THEN substring({payload_full}, 1, 25) ELSE {payload_full} END"
        ).alias("payload"),
        F.expr(f"CAST(i % {STREAMS} AS INT)").alias("stream_id"),
        F.expr(f"CAST(i DIV {STREAMS} AS INT)").alias("msg_seq"),
        F.expr(
            f"CASE WHEN (i DIV {STREAMS}) % {NODE_EVERY} = 0 THEN "
            f"concat('host-', CAST(i % {STREAMS} AS STRING), '-', "
            f"CAST((i DIV {STREAMS}) DIV {NODE_EVERY} AS STRING)) END"
        ).alias("node_host"),
    )


def raw_payloads_sql_duck(n: int) -> str:
    payload_full = _PAYLOAD_DUCK.format(
        hosts=N_HOSTS, lvl=f"({LEVEL_CASE_SQL})",
        src=f"({SOURCE_CASE_SQL})", ntok=N_TOK_SQL, ta=TOKEN_A,
    )
    return f"""
    SELECT
      {DOC_ID_SQL_DUCK} AS doc_id,
      CASE WHEN i % {MALFORMED_MOD} = {MALFORMED_RESIDUE}
           THEN substring({payload_full}, 1, 25) ELSE {payload_full} END AS payload,
      CAST(i % {STREAMS} AS INTEGER) AS stream_id,
      CAST(i // {STREAMS} AS INTEGER) AS msg_seq,
      CASE WHEN (i // {STREAMS}) % {NODE_EVERY} = 0 THEN
        concat('host-', CAST(i % {STREAMS} AS VARCHAR), '-',
               CAST((i // {STREAMS}) // {NODE_EVERY} AS VARCHAR)) END AS node_host
    FROM (SELECT range AS i FROM range(0, {n}))
    """


# ---------------------------------------------------------------------------
# F3. source_dim — broadcast enrichment lookup (attributes/resource analog)
# ---------------------------------------------------------------------------
def source_dim(spark: SparkSession) -> DataFrame:
    """6-row dimension: (source, tenant, priority, attrs array<struct<key,value>>).

    array<struct> instead of MapType for Arrow/pandas-UDF compatibility
    (SURVEY.md §1.3).
    """
    # SQL VALUES, not createDataFrame(list): a Python-list DataFrame is
    # RDD-backed, so EVERY broadcast build of this dim spawns a Python-runner
    # job (~1s serial per pipeline execution — measured as a fixed serial
    # tax on the scaling probe's high leg). VALUES folds to a JVM
    # LocalRelation: broadcast builds are instant and Python-free.
    rows_sql = ", ".join(
        f"('{s}', 'tenant-{PRIORITY[s] % 4}', {PRIORITY[s]})" for s in SOURCES)
    return spark.sql(
        "SELECT source, tenant, priority, array("
        "named_struct('key', 'team', 'value', concat('team-', source)), "
        "named_struct('key', 'tier', 'value', CAST(priority AS STRING))"
        ") AS attrs "
        f"FROM (VALUES {rows_sql}) AS t(source, tenant, priority)")


def source_dim_sql_duck() -> str:
    rows = ", ".join(
        f"('{s}', 'tenant-{PRIORITY[s] % 4}', {PRIORITY[s]}, "
        f"'team=team-{s};tier={PRIORITY[s]}')"
        for s in SOURCES
    )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(source, tenant, priority, attrs_str)"
    )


# ---------------------------------------------------------------------------
# F4. route_rules — tag-driven fan-out rules (exporter pipelines analog)
# ---------------------------------------------------------------------------
def route_rules(spark: SparkSession) -> DataFrame:
    # VALUES (not createDataFrame) for the same Python-free-broadcast reason
    # as source_dim. sample_pct is CAST: a bare decimal literal parses as
    # DECIMAL in Spark SQL, not DOUBLE.
    rows_sql = ", ".join(
        f"({rid}, '{src}', {mnt}, '{sink}', CAST({pct!r} AS DOUBLE))"
        for rid, src, mnt, sink, pct in ROUTE_RULES
    )
    return spark.sql(
        "SELECT * FROM (VALUES "
        f"{rows_sql}) AS t(rule_id, predicate_source, min_n_tok, sink, "
        "sample_pct)")


def route_rules_sql_duck() -> str:
    rows = ", ".join(
        f"({rid}, '{src}', {mnt}, '{sink}', {pct})"
        for rid, src, mnt, sink, pct in ROUTE_RULES
    )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(rule_id, predicate_source, min_n_tok, sink, sample_pct)"
    )


# Deterministic per-(row, rule) sampler hash — valid in both dialects.
# Mirrors the probabilistic sampler's hash-of-traceid semantics
# (upstream registration components.go:70) without engine-specific hashes.
# The seed is reduced mod SAMPLE_MOD BEFORE the LCG multiply:
# (x*A + B) mod m == ((x mod m)*A + B) mod m for nonnegative x, so results
# are identical — but the unreduced form overflows int64 at seq_no ≳ 8.4e9
# (ANSI ArithmeticException in Spark 4, overflow error in DuckDB), i.e. long
# before the 10^12-sequence design scale. Reduced, the intermediate peaks at
# (SAMPLE_MOD-1)*SAMPLE_A + SAMPLE_B ≈ 1.1e13.
def sample_hash_sql(seq_col: str = "seq_no", rule_col: str = "rule_id") -> str:
    return (
        f"((({seq_col} + {rule_col} * {RULE_SALT}) % {SAMPLE_MOD}) "
        f"* {SAMPLE_A} + {SAMPLE_B}) % {SAMPLE_MOD}"
    )


# Generators the bench redirect can materialize (name → generator). Defined
# last so the functions exist; keys are the parquet dir prefixes under the
# materialized-fixture dir.
_REDIRECTABLE = {
    "sequences": sequences,
    "payloads": raw_payloads,
    "json_payloads": raw_json_payloads,
    "zipkin_payloads": raw_zipkin_payloads,
    "jaeger_payloads": raw_jaeger_payloads,
}
