"""Corpus-hygiene operators (operators/corpus.py) verified VALUE-level
against DuckDB — the same cross-engine contract the driver's oracle gate
applies to the 50 registry slots, run here in-suite for the extras."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import corpus
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"
DOCS = f"'{SF}/documents.parquet'"


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {DOCS}")
    return con.execute(sql).fetch_df()


def _match(spark_df, duck_pdf, sort_cols):
    s = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    d = duck_pdf.sort_values(sort_cols).reset_index(drop=True)
    assert list(s.columns) == list(d.columns)
    assert len(s) == len(d)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f":
            assert (sv - dv).abs().max() < 1e-9, c
        else:
            assert (sv.astype(str) == dv.astype(str)).all(), c


def test_repetition_stats_matches_duckdb(spark):
    docs = load(spark, SF, "documents")
    out = corpus.repetition_stats(docs)
    oracle = _duck(corpus.repetition_stats_sql_duck())
    _match(out, oracle, ["doc_id"])


def test_repetition_stats_nonvacuous(spark):
    """The fixture corpus genuinely repeats words — the metric must show it
    (guards against the vacuous-pass trap: a 0==0 comparison proves nothing)."""
    docs = load(spark, SF, "documents")
    out = corpus.repetition_stats(docs).agg(
        F.max("dup_unit_frac").alias("mx"),
        F.max("max_unit_repeat").alias("mr")).collect()[0]
    assert out.mx > 0.0 and out.mr > 1


def test_repetition_stats_line_mode(spark):
    """Gopher's duplicate-LINE fraction on a synthesized multi-line doc."""
    df = spark.createDataFrame(
        [(1, "alpha\nbeta\nalpha\n\ngamma"), (2, "one\ntwo")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            corpus.repetition_stats(df, sep="\n").collect()}
    assert rows[1].n_units == 4 and rows[1].n_distinct_units == 3
    assert rows[1].max_unit_repeat == 2
    assert rows[2].dup_unit_frac == 0.0


def test_top_ngram_fraction_matches_duckdb(spark):
    docs = load(spark, SF, "documents")
    out = corpus.top_ngram_fraction(docs, n=2)
    oracle = _duck(corpus.top_ngram_fraction_sql_duck(n=2))
    _match(out, oracle, ["doc_id"])


def test_top_ngram_short_doc_degenerates_to_whole_text(spark):
    df = spark.createDataFrame([(1, "lone")], "doc_id long, text string")
    r = corpus.top_ngram_fraction(df, n=3).collect()[0]
    assert r.n_ngrams == 1 and r.top_ngram_frac == 1.0


def test_top_ngram_empty_doc_yields_zero_grams_both_engines(spark):
    """Empty/whitespace-only docs have ZERO n-grams in both engines. The
    naive forms diverged here: Spark array_join([]) produced the '' gram
    (count 1, frac 1.0) while DuckDB list_aggregate([]) produced [NULL]."""
    import duckdb

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b c")], "doc_id long, text string")
    rows = {r.doc_id: r for r in corpus.top_ngram_fraction(df, n=2).collect()}
    assert rows[1].n_ngrams == 0 and rows[1].top_ngram_count is None
    assert rows[2].n_ngrams == 0 and rows[2].top_ngram_frac is None
    assert rows[3].n_ngrams == 2
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(1, ''), (2, '   '), (3, 'a b c')) t(doc_id, text)")
    d = {int(r[0]): r for r in con.execute(
        corpus.top_ngram_fraction_sql_duck(n=2)).fetchall()}
    for i in (1, 2, 3):
        assert d[i][1] == rows[i].n_ngrams
        assert (d[i][2] is None) == (rows[i].top_ngram_count is None)
    # and word_ngrams emits no rows for the empty docs (no '' gram, so two
    # empty docs are no longer mutually "contaminated")
    grams = corpus.word_ngrams(df, n=2).collect()
    assert {r.id for r in grams} == {3}


def test_contamination_matches_duckdb(spark):
    docs = load(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = corpus.contamination_check(docs, bench, n=3)
    oracle = _duck(corpus.contamination_check_sql_duck(
        bench_pred="doc_id % 97 = 0", n=3))
    _match(out, oracle, ["doc_id"])


def test_contamination_nonvacuous_and_self_flagged(spark):
    docs = load(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = corpus.contamination_check(docs, bench, n=3)
    flagged = out.filter(F.col("n_contaminated") > 0)
    n_bench = bench.count()
    assert n_bench > 0
    # benchmark members must flag themselves 100% contaminated
    self_rows = flagged.join(bench.select("doc_id"), "doc_id").collect()
    assert len(self_rows) == n_bench
    assert all(r.contamination_frac == 1.0 for r in self_rows)
    # every scored doc appears exactly once (left join keeps clean docs)
    assert out.count() == docs.count()


def test_contamination_plan_broadcasts_benchmark(spark):
    docs = load(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plan = corpus.contamination_check(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_matches_duckdb(spark):
    rates = {"src0": 0.5, "src1": 0.1}
    docs = load(spark, SF, "documents")
    out = corpus.stratified_sample(docs, "source", rates).select(
        "doc_id", "source")
    pred = corpus.stratified_sample_pred_duck("source", rates)
    oracle = _duck(f"SELECT doc_id, source FROM documents WHERE {pred}")
    _match(out, oracle, ["doc_id"])


def test_stratified_sample_rates_and_determinism(spark):
    docs = load(spark, SF, "documents")
    rates = {s.source: 0.3 for s in docs.select("source").distinct().collect()}
    a = corpus.stratified_sample(docs, "source", rates)
    n, total = a.count(), docs.count()
    assert 0.15 * total < n < 0.45 * total  # ~30% within loose bounds
    # same sample at a different parallelism (the resume guarantee)
    b = corpus.stratified_sample(docs.repartition(3), "source", rates)
    assert a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0


def test_stratified_sample_fractional_threshold_matches_duckdb(spark):
    """A rate whose rate*1e6 has fractional part >= 0.5 (0.1234565 →
    123456.5): Spark CAST truncates, DuckDB CAST rounds half-up — both
    sides now floor, so the kept set is identical."""
    rates = {"src0": 0.1234565, "src1": 0.7654325}
    docs = load(spark, SF, "documents")
    out = corpus.stratified_sample(docs, "source", rates).select(
        "doc_id", "source")
    pred = corpus.stratified_sample_pred_duck("source", rates)
    oracle = _duck(f"SELECT doc_id, source FROM documents WHERE {pred}")
    _match(out, oracle, ["doc_id"])


def test_stratified_sample_default_rate_zero(spark):
    docs = load(spark, SF, "documents")
    out = corpus.stratified_sample(docs, "source", {"nonexistent": 1.0})
    assert out.count() == 0


def test_scrub_pii_matches_duckdb_and_redacts(spark):
    from omnition_opentelemetry_service_spark.functions import text as tx

    rows = [
        (1, "contact alice.smith+x@example.co.uk or bob@test.io today"),
        (2, "server at 192.168.1.200 answered"),
        (3, "call +1 (415) 555-0133 or 020 7946 0958 now"),
        (4, "mixed: a@b.com then 10.0.0.1 then +44 7700 900123 end"),
        (5, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean for r in
           df.select("doc_id", tx.scrub_pii("text").alias("clean")).collect()}
    assert got[1] == "contact <EMAIL> or <EMAIL> today"
    assert got[2] == "server at <IP> answered"
    assert got[3] == "call <PHONE> or <PHONE> now"
    assert got[4] == "mixed: <EMAIL> then <IP> then <PHONE> end"
    assert got[5] == rows[4][1]

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    oracle = dict(con.execute(
        f"SELECT doc_id, {tx.scrub_pii_sql_duck('text')} AS clean "
        f"FROM (VALUES {vals}) AS t(doc_id, text)").fetchall())
    assert got == oracle


def test_token_vocab_stats_match_duckdb(spark):
    from omnition_opentelemetry_service_spark import fixtures as fx

    n = 400
    seqs = fx.sequences(spark, n)
    out = corpus.token_vocab_stats(seqs)
    con = duckdb.connect()
    oracle = con.execute(corpus.token_vocab_stats_sql_duck(
        fx.sequences_sql_duck(n))).fetch_df()
    _match(out, oracle.astype({"token": "int32"}), ["token"])


def test_token_vocab_stats_invariants(spark):
    from omnition_opentelemetry_service_spark import fixtures as fx

    seqs = fx.sequences(spark, 300)
    stats = corpus.token_vocab_stats(seqs)
    # occurrences across the histogram == total token positions
    total = stats.agg(F.sum("freq")).collect()[0][0]
    positions = seqs.agg(F.sum("n_tok")).collect()[0][0]
    assert total == positions
    # a token can't appear in more sequences than it has occurrences
    assert stats.filter(F.col("n_seqs") > F.col("freq")).count() == 0


# ---------------------------------------------------------------------------
# The composed end-to-end cleaning pass (corpus_filter_full)
# ---------------------------------------------------------------------------


def test_corpus_filter_full_matches_duckdb(spark):
    """Full composed pass (gates → exact collapse → LSH near-dup cluster
    collapse) value-matches the recursive-CTE DuckDB twin."""
    docs = load(spark, SF, "documents")
    out = corpus.corpus_filter_full(docs)
    oracle = _duck(corpus.corpus_filter_full_sql_duck())
    _match(out, oracle, ["doc_id"])
    spark.catalog.clearCache()  # caller-owned caches from the composed stages


def test_corpus_filter_full_collapses_near_dups(spark):
    """Non-vacuity: the near-dup stage must actually remove documents beyond
    what the exact-fingerprint collapse already removed — i.e. the fixture
    contains verified near-dup pairs among gate survivors and exactly one
    keeper per cluster remains."""
    from omnition_opentelemetry_service_spark.functions import text as tx
    from omnition_opentelemetry_service_spark.operators import dedup as dd

    docs = load(spark, SF, "documents")
    full = corpus.corpus_filter_full(docs)
    # exact-only stage count (same gates, no near-dup collapse)
    scored = docs.select(
        "doc_id",
        tx.quality_score("text").alias("quality"),
        tx.lang_id("text").alias("lang"),
        tx.fingerprint("text").alias("fp"))
    gated = scored.filter((F.col("quality") >= 0.5) & (F.col("lang") != "und"))
    exact_n = gated.groupBy("fp").count().count()
    full_n = full.count()
    assert full_n < exact_n, (full_n, exact_n)
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# Span-level (substring) duplication — Lee et al. 2021 repeated-span signal.
# ---------------------------------------------------------------------------


def test_duplicated_spans_match_duckdb(spark):
    docs = load(spark, SF, "documents")
    out = corpus.duplicated_spans(docs, n=3, min_docs=2)
    oracle = _duck(corpus.duplicated_spans_sql_duck(n=3, min_docs=2))
    _match(out, oracle, ["gram"])


def test_span_dedup_stats_match_duckdb(spark):
    docs = load(spark, SF, "documents")
    out = corpus.span_dedup_stats(docs, n=3, min_docs=2)
    oracle = _duck(corpus.span_dedup_stats_sql_duck(n=3, min_docs=2))
    _match(out, oracle, ["doc_id"])


def test_span_dedup_nonvacuous_and_consistent(spark):
    """The fixture corpus genuinely shares spans across documents (it
    contains near-dup pairs), so the hot-span inventory must be non-empty
    and some doc must carry a positive duplicated fraction; planting an
    exact boilerplate sentence in two synthetic docs must drive their
    dup_span_frac to 1.0 while a unique doc stays at 0.0."""
    docs = load(spark, SF, "documents")
    hot = corpus.duplicated_spans(docs, n=3, min_docs=2)
    assert hot.count() > 0
    stats = corpus.span_dedup_stats(docs, n=3, min_docs=2)
    assert stats.filter(F.col("dup_span_frac") > 0).count() > 0
    # every doc's dup occurrences are bounded by its total occurrences
    assert stats.filter(F.col("n_dup_occ") > F.col("n_gram_occ")).count() == 0

    planted = spark.createDataFrame(
        [(1, "the same shared boilerplate footer text"),
         (2, "the same shared boilerplate footer text"),
         (3, "a completely unique sentence nothing repeats here")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            corpus.span_dedup_stats(planted, n=3, min_docs=2).collect()}
    assert rows[1].dup_span_frac == 1.0 and rows[2].dup_span_frac == 1.0
    assert rows[3].dup_span_frac == 0.0


def test_span_dedup_plan_shape(spark):
    """No cartesian product anywhere; the per-(doc, gram) count happens
    doc-locally — the ONLY exchanges in duplicated_spans are the gram
    groupBy's partial/final pair (no exchange keyed by the doc id)."""
    docs = load(spark, SF, "documents")
    plan = corpus.duplicated_spans(docs, n=3, min_docs=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(gram" in plan
    assert "hashpartitioning(id" not in plan and \
        "hashpartitioning(doc_id" not in plan
    stats_plan = corpus.span_dedup_stats(docs, n=3, min_docs=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in stats_plan


def test_token_span_dedup_matches_duckdb(spark):
    """Token-level (k-window) span duplication over the north-star sequence
    shape, both the corpus inventory and the per-sequence stats, against
    the paired DuckDB fixture."""
    from omnition_opentelemetry_service_spark import fixtures as fx

    n = 300
    seqs = fx.sequences(spark, n)
    cte = fx.sequences_sql_duck(n)
    con = duckdb.connect()

    hot = corpus.duplicated_token_spans(seqs, k=4, min_docs=2)
    oracle_hot = con.execute(
        corpus.duplicated_token_spans_sql_duck(cte, k=4, min_docs=2)).fetch_df()
    _match(hot, oracle_hot, ["gram"])

    stats = corpus.token_span_dedup_stats(seqs, k=4, min_docs=2)
    oracle_stats = con.execute(
        corpus.token_span_dedup_stats_sql_duck(cte, k=4, min_docs=2)).fetch_df()
    _match(stats, oracle_stats, ["doc_id"])


def test_token_span_semantics(spark):
    """Short sequences yield no windows; planted shared windows are found
    with exact positions-count accounting; sub-k overlap is invisible."""
    df = spark.createDataFrame(
        [(1, [7, 8, 9, 10, 11]),     # shares window [8,9,10,11] with doc 2
         (2, [8, 9, 10, 11]),
         (3, [1, 2, 3]),             # len < k → no windows
         (4, [5, 5, 5, 5, 5])],      # internal repeat only: 2 windows, same gram
        "doc_id long, tokens array<int>")
    hot = {r.gram: (r.n_docs, r.n_occurrences) for r in
           corpus.duplicated_token_spans(df, k=4, min_docs=2).collect()}
    assert hot == {"8 9 10 11": (2, 2)}
    stats = {r.doc_id: r for r in
             corpus.token_span_dedup_stats(df, k=4, min_docs=2).collect()}
    assert 3 not in stats  # no windows → no row
    assert stats[1].n_span_occ == 2 and stats[1].n_dup_occ == 1
    assert stats[2].dup_span_frac == 1.0
    assert stats[4].n_span_occ == 2 and stats[4].n_dup_occ == 0


def test_doc_gram_counts_exploded_parity(spark):
    """The linear long-doc twin must equal the doc-local form exactly."""
    docs = load(spark, SF, "documents")
    a = sorted(map(tuple, corpus.doc_gram_counts(docs, n=3).collect()))
    b = sorted(map(tuple,
                   corpus.doc_gram_counts_exploded(docs, n=3).collect()))
    assert a == b and len(a) > 0


def test_scrub_pii_preserves_dates(spark):
    """The phone heuristic must not eat ISO dates or short digit runs
    (8 digits), must still catch 9-15-digit phone shapes, and must not
    join digit runs across newlines."""
    from omnition_opentelemetry_service_spark.functions import text as tx

    rows = [
        (1, "released on 2026-01-01 to users"),
        (2, "order 1234567 shipped"),              # 7 digits: not a phone
        (3, "line one 123\nline two 456-789"),      # newline must split runs
        (4, "dial 555-123-4567 now"),               # 10 digits: phone
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean for r in
           df.select("doc_id", tx.scrub_pii("text").alias("clean")).collect()}
    assert got[1] == rows[0][1]
    assert got[2] == rows[1][1]
    assert got[3] == rows[2][1]
    assert got[4] == "dial <PHONE> now"

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in
                     [(i, t.replace("\n", "' || chr(10) || '"))
                      for i, t in rows])
    oracle = dict(con.execute(
        f"SELECT doc_id, {tx.scrub_pii_sql_duck('text')} AS clean "
        f"FROM (VALUES {vals}) AS t(doc_id, text)").fetchall())
    assert got == oracle


def test_char_entropy_matches_duckdb_and_model(spark):
    """char_entropy: EXACT cross-engine equality on the fixture corpus
    (value-sorted fold — collation-independent), closed-form values on
    crafted inputs, NULL on empty/NULL text, python-model agreement."""
    import math
    from collections import Counter

    from omnition_opentelemetry_service_spark.functions import text as tx

    docs = load(spark, SF, "documents")
    s = {r.doc_id: r.e for r in docs.select(
        "doc_id", tx.char_entropy("text").alias("e")).collect()}
    d = dict(_duck(f"SELECT doc_id, {tx.char_entropy_sql_duck('text')} AS e "
                   "FROM documents").itertuples(index=False))
    assert s == d  # exact, not approx: same rounded fold both engines

    cases = ["aaaa", "ab", "abcd", "x", "aab", "", None, "héllo wörld"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "doc_id int, text string")
    got = {r.doc_id: r.e for r in df.select(
        "doc_id", tx.char_entropy("text").alias("e")).collect()}
    assert got[0] == 0.0            # single symbol → zero entropy
    assert got[1] == 1.0            # two equiprobable → 1 bit
    assert got[2] == 2.0
    assert got[3] == 0.0
    assert got[5] is None and got[6] is None
    for i, t in enumerate(cases):
        if not t:
            continue
        n = len(t)
        want = round(-sum((c / n) * math.log2(c / n)
                          for c in Counter(t).values()), 6)
        assert got[i] is not None and abs(got[i] - want) < 2e-6, t


# ---------------------------------------------------------------------------
# token-grain decontamination (token_contamination_check): value parity is
# pinned by the extras gate (test_consolidated_ops at sf0.01); here the
# semantics — self-flagging, row coverage, broadcast plan — on fixtures.
# ---------------------------------------------------------------------------
def test_token_contamination_self_flagged_and_covered(spark):
    from omnition_opentelemetry_service_spark import fixtures as fx

    seqs = fx.sequences(spark, 400)
    bench = seqs.filter(F.col("seq_no") % 97 == 0)
    out = corpus.token_contamination_check(seqs, bench, k=8)
    # every sequence has n_tok >= 16 >= k, so every row is scored
    assert out.count() == 400
    self_rows = (out.join(bench.select("doc_id"), "doc_id")
                 .select("contamination_frac").collect())
    assert len(self_rows) == bench.count() > 0
    assert all(r.contamination_frac == 1.0 for r in self_rows)
    # fractions are well-formed
    bad = out.filter("contamination_frac < 0 OR contamination_frac > 1 "
                     "OR n_contaminated > n_grams").count()
    assert bad == 0


def test_token_contamination_short_seqs_unscored(spark):
    df = spark.createDataFrame(
        [("a", list(range(4))), ("b", list(range(12)))],
        "doc_id string, tokens array<int>")
    out = corpus.token_contamination_check(df, df.limit(0), k=8)
    got = {r.doc_id for r in out.collect()}
    assert got == {"b"}  # 4 < k: no windows, no row (cannot be contaminated)


def test_token_contamination_plan_broadcasts_benchmark(spark):
    from omnition_opentelemetry_service_spark import fixtures as fx

    seqs = fx.sequences(spark, 400)
    bench = seqs.filter(F.col("seq_no") % 97 == 0)
    plan = (corpus.token_contamination_check(seqs, bench, k=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_null_strata_dropped_both_engines(spark):
    """PARITY trap 25 regression: DuckDB's concat ignores NULL args, so a
    NULL-stratum row would be sampled at its rate there while Spark drops
    it — both engines must DROP (the quota_per_stratum rule)."""
    import duckdb

    rows = ([(i, None) for i in range(50)]
            + [(50 + i, "web") for i in range(50)]
            + [(999, None)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.stratified_sample(df, "source", {"web": 0.5},
                                   default_rate=0.4)
    got = {r.doc_id for r in out.collect()}
    assert got and all(50 <= i < 100 for i in got), "NULL strata dropped"

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = corpus.stratified_sample_pred_duck("source", {"web": 0.5},
                                              default_rate=0.4)
    duck = {r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {pred}").fetchall()}
    assert duck == got
