"""Text→token ingest (operators/tokenize.py): cross-engine value parity on
the real documents fixture plus the NULL/empty/unicode edge matrix, and the
output-shape contract (the BASELINE.json input-table schema)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import packing, tokenize
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"
DOCS = f"'{SF}/documents.parquet'"


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {DOCS}")
    return con.execute(sql).fetch_df()


def _tok_lists_equal(s_col, d_col):
    for a, b in zip(s_col, d_col):
        a_l = None if a is None else [int(x) for x in a]
        b_l = None if b is None or (not isinstance(b, (list,)) and
                                    not hasattr(b, "tolist") and pd.isna(b)) \
            else [int(x) for x in (b.tolist() if hasattr(b, "tolist") else b)]
        assert a_l == b_l


def test_tokenize_matches_duckdb_on_fixture(spark):
    docs = load(spark, SF, "documents")
    s = (tokenize.tokenize_documents(docs).orderBy("doc_id")
         .toPandas().reset_index(drop=True))
    d = _duck(tokenize.tokenize_documents_sql_duck() + " ORDER BY doc_id"
              ).reset_index(drop=True)
    assert list(s.columns) == ["doc_id", "tokens", "n_tok", "source"]
    assert s["doc_id"].tolist() == d["doc_id"].tolist()
    assert s["n_tok"].tolist() == d["n_tok"].tolist()
    assert s["source"].tolist() == d["source"].tolist()
    _tok_lists_equal(s["tokens"], d["tokens"])
    # non-vacuous: real docs produce real tokens in the vocab range
    assert int(s["n_tok"].max()) > 10
    flat = [t for row in s["tokens"] if row is not None for t in row]
    assert all(0 <= t < tokenize.VOCAB_SIZE for t in flat)


def test_tokenize_edge_matrix_matches_duckdb(spark):
    rows = [(1, "Hello, world! 42 times."), (2, ""), (3, "   \t\n "),
            (4, None), (5, "naïve café — ünïcode 3.14"),
            (6, "a" * 500), (7, "!!!???...")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    s = (sdf.select("doc_id", tokenize.tokens_expr("text").alias("tokens"))
         .orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    d = con.execute(
        f"SELECT doc_id, {tokenize.tokens_sql_duck('text')} AS tokens "
        f"FROM t ORDER BY doc_id").fetch_df()
    _tok_lists_equal(s["tokens"], d["tokens"])
    by_id = {r.doc_id: r.tokens for r in
             sdf.select("doc_id", tokenize.tokens_expr("text").alias("tokens"))
             .collect()}
    assert by_id[2] == [] and by_id[3] == []   # empty/whitespace → empty seq
    assert by_id[4] is None                    # NULL → NULL (quarantine row)
    assert len(by_id[6]) == 1                  # one long word = one piece


def test_tokenized_table_feeds_packing(spark):
    """The produced shape is the north-star table: with_pack_id consumes it
    unchanged and conservation holds (every token lands in exactly one
    pack)."""
    docs = load(spark, SF, "documents")
    seqs = tokenize.tokenize_documents(docs).withColumn(
        "seq_no", F.col("doc_id"))
    packed = packing.with_pack_id(seqs, budget=256)
    total_in = seqs.agg(F.sum("n_tok")).collect()[0][0]
    total_out = packed.agg(F.sum("n_tok")).collect()[0][0]
    assert total_in == total_out
    st = packing.pack_stats(packed)
    # cumsum binning: every bin except possibly each source's last is
    # filled past budget - max_n_tok; just assert bins exist and are bounded
    mx = seqs.agg(F.max("n_tok")).collect()[0][0]
    over = st.filter(F.col("pack_tokens") > 256 + mx).count()
    assert over == 0 and st.count() > 1


def test_docs_release_cli_end_to_end(spark, tmp_path):
    """jobs/make_release.py --input-docs: raw text → tokenize → full
    release, the complete ingest-to-trainer path in one command."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "make_release.py"),
         "--input-docs", os.path.join(SF, "documents.parquet"),
         "--out", str(tmp_path / "rel"), "--budget", "512",
         "--shards", "4", "--parallelism", "4"],
        capture_output=True, text=True, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    splits = rep["per_split"]
    assert set(splits) <= {"train", "val", "test"} and "train" in splits
    assert sum(v[0] for v in splits.values()) > 0


def test_docs_release_cli_with_dsir_selection(spark, tmp_path):
    """--dsir-target/--dsir-keep: the release keeps exactly the k docs the
    Gumbel-top-k importance resample selected (selected docs carry >= 1
    n-gram, hence non-NULL tokens, so none drop at the quarantine gate)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "make_release.py"),
         "--input-docs", os.path.join(SF, "documents.parquet"),
         "--dsir-target", "lang = 'en'", "--dsir-keep", "100",
         "--out", str(tmp_path / "rel"), "--budget", "512",
         "--shards", "4", "--parallelism", "4"],
        capture_output=True, text=True, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert sum(v[0] for v in rep["per_split"].values()) == 100
    # flag validation: --dsir-keep without --dsir-target is rejected
    bad = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "make_release.py"),
         "--input-docs", os.path.join(SF, "documents.parquet"),
         "--dsir-keep", "10", "--out", str(tmp_path / "rel2")],
        capture_output=True, text=True, cwd=repo)
    assert bad.returncode != 0 and "go together" in bad.stderr
