"""Composed web-ingest front half (jobs/web_ingest.py): end-to-end DuckDB
value parity (each stage's own twin chained through temp views), stage
semantics (blocklist, URL collapse, boilerplate removal, quota), counter
reconciliation, and the CLI subprocess e2e."""

from __future__ import annotations

import json
import subprocess
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

from jobs.web_ingest import web_ingest
from omnition_opentelemetry_service_spark.functions import html as hh
from omnition_opentelemetry_service_spark.functions import text as tx
from omnition_opentelemetry_service_spark.metrics import StageCounters
from omnition_opentelemetry_service_spark.operators import corpus as cp
from omnition_opentelemetry_service_spark.operators import urls as ur
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"
BLOCKED = ["site3.example.com", "site7.example.com"]


def _raw(spark):
    """Deterministic crawl table: documents + url fixture + html wrapper.
    The html fixture gives every page an identical footer line and its
    own title/h1 lines — real per-host boilerplate for the line stage."""
    docs = load(spark, SF, "documents")
    return docs.select(
        "doc_id",
        F.expr(ur.url_fixture_sql("doc_id")).alias("url"),
        F.expr(hh.html_fixture_sql()).alias("html"),
        "source")


def _duck_pipeline(con, quality_min=0.5, line_min_count=2):
    """The SAME stage chain, engine-independently, from each stage's own
    DuckDB twin, materialized as temp views."""
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"""CREATE TEMP VIEW raw AS
      SELECT doc_id, {ur.url_fixture_sql('doc_id')} AS url,
             {hh.html_fixture_sql()} AS html, source FROM documents""")
    con.execute(f"""CREATE TEMP VIEW ann AS
      SELECT *, {ur.canonical_url_sql_duck('url')} AS canon_url,
             {ur.url_host_sql_duck('url')} AS host FROM raw""")
    con.execute(f"""CREATE TEMP VIEW unb AS
      SELECT * FROM ann
      WHERE {ur.host_blocklist_pred_duck(BLOCKED)}""")
    con.execute("""CREATE TEMP VIEW ud AS
      SELECT r['doc_id'] AS doc_id, r['url'] AS url, r['html'] AS html,
             r['source'] AS source, r['host'] AS host
      FROM (SELECT min_by(struct_pack(doc_id := doc_id, url := url,
                                      html := html, source := source,
                                      host := host), doc_id) AS r
            FROM unb
            GROUP BY canon_url,
                     CASE WHEN canon_url IS NULL THEN doc_id ELSE 0 END)""")
    con.execute(f"""CREATE TEMP VIEW st AS
      SELECT doc_id, url, host, source,
             {hh.strip_html_sql_duck('html')} AS text
      FROM ud
      WHERE {hh.strip_html_sql_duck('html')} IS NOT NULL
        AND {hh.strip_html_sql_duck('html')} <> ''""")
    ld = cp.line_dedup_grouped_sql_duck(
        table="st", group_col="host", min_count=line_min_count)
    con.execute(f"""CREATE TEMP VIEW ln AS
      SELECT l.doc_id, s.url, s.host, s.source, l.clean_text AS text
      FROM ({ld}) l JOIN st s USING (doc_id)""")
    con.execute(f"""CREATE TEMP VIEW gated AS
      SELECT * FROM ln
      WHERE NOT ({tx.quality_score_sql_duck('text')} < {quality_min}
                 OR {tx.lang_id_sql_duck('text')} = 'und')""")
    return con.execute(f"""
      SELECT r['doc_id'] AS doc_id, r['url'] AS url, r['host'] AS host,
             r['source'] AS source, r['text'] AS text
      FROM (SELECT min_by(struct_pack(doc_id := doc_id, url := url,
                                      host := host, source := source,
                                      text := text), doc_id) AS r
            FROM gated GROUP BY {tx.fingerprint_sql_duck('text')})
    """).fetchall()


def test_end_to_end_matches_chained_duckdb_twins(spark):
    out = web_ingest(_raw(spark), blocked_hosts=BLOCKED)
    got = {tuple(r) for r in out.collect()}
    want = set(map(tuple, _duck_pipeline(duckdb.connect())))
    assert got == want
    assert len(got) > 50  # survivors, not a vacuous pipeline


def test_stage_semantics(spark):
    counters = StageCounters()
    out = web_ingest(_raw(spark), blocked_hosts=BLOCKED,
                     counters=counters)
    rows = out.collect()
    counts = {f"{s}:{t}": (rec, drop)
              for s, t, rec, drop in counters.harvest()}
    # blocklist: fixture hosts cycle over 20 ids; the two blocked hosts
    # must drop a nonzero slice, and no survivor carries them
    assert counts["web_ingest:blocklist"][1] > 0
    assert all(r.host not in BLOCKED for r in rows)
    # URL dedup: url variants congruent mod 100 collide — strictly fewer
    # rows enter strip than pass the blocklist
    n_unblocked = (counts["web_ingest:blocklist"][0]
                   - counts["web_ingest:blocklist"][1])
    assert counts["web_ingest:strip"][0] < n_unblocked
    # ids unique, text is real extracted content: no markup survivors
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert all("color: red" not in r.text and "<p" not in r.text
               for r in rows)
    # boilerplate removal: the shared footer line is gone from every doc
    assert all("&copy; 2026" not in r.text for r in rows)
    # written counter reconciles with the actual output
    assert counts["web_ingest:written"][0] == len(rows)


def test_null_url_docs_survive_url_dedup(spark):
    out = web_ingest(_raw(spark), blocked_hosts=BLOCKED)
    null_ids = {r.doc_id for r in out.filter(F.col("url").isNull())
                .collect()}
    # fixture: doc_id % 97 == 0 has NULL url; those docs must not be
    # collapsed into one group (distinct texts -> several survive)
    assert len(null_ids) >= 3


def test_host_cap_binds(spark):
    out = web_ingest(_raw(spark), blocked_hosts=BLOCKED, host_cap=3)
    per_host = (out.filter(F.col("host").isNotNull())
                .groupBy("host").count().collect())
    assert per_host and all(r["count"] <= 3 for r in per_host)


def test_cli_subprocess_e2e(spark, tmp_path):
    inp, outp = str(tmp_path / "raw"), str(tmp_path / "clean")
    rep = str(tmp_path / "report.json")
    _raw(spark).limit(200).write.parquet(inp)
    r = subprocess.run(
        [sys.executable, "jobs/web_ingest.py", "--input", inp,
         "--out", outp, "--block-hosts", ",".join(BLOCKED),
         "--host-cap", "5", "--report", rep, "--parallelism", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(open(rep).read())
    assert set(report) == {"web_ingest:blocklist", "web_ingest:strip",
                           "web_ingest:gates", "web_ingest:written"}
    cleaned = spark.read.parquet(outp)
    assert cleaned.columns == ["doc_id", "url", "host", "source", "text"]
    assert cleaned.count() == report["web_ingest:written"]["received"]


def test_host_quality_min_stage(spark):
    loose = web_ingest(_raw(spark), blocked_hosts=BLOCKED)
    strict = web_ingest(_raw(spark), blocked_hosts=BLOCKED,
                        host_quality_min=0.77)
    loose_ids = {r.doc_id for r in loose.collect()}
    strict_rows = strict.collect()
    strict_ids = {r.doc_id for r in strict_rows}
    # the domain gate only ever removes; NULL-host docs are exempt
    assert strict_ids < loose_ids
    kept_hosts = {r.host for r in strict_rows if r.host is not None}
    dropped_hosts = {r.host for r in loose.collect()
                     if r.host is not None and r.doc_id not in strict_ids}
    assert kept_hosts and dropped_hosts
    assert not (kept_hosts & dropped_hosts)  # verdicts are per-host
    assert any(r.host is None for r in strict_rows)


def test_crawl_to_release_full_path(spark, tmp_path):
    """The COMPLETE story in two commands: raw crawl → web_ingest
    (blocklist/URL dedup/strip/boilerplate/gates/exact dedup) → cleaned
    parquet → make_release --input-docs (tokenize → dedup → split → mix →
    pack → shard) → trainer-ready shards."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp, clean = str(tmp_path / "raw"), str(tmp_path / "clean")
    _raw(spark).write.parquet(inp)
    r1 = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "web_ingest.py"),
         "--input", inp, "--out", clean,
         "--block-hosts", ",".join(BLOCKED), "--parallelism", "4"],
        capture_output=True, text=True, cwd=repo, timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "make_release.py"),
         "--input-docs", clean, "--out", str(tmp_path / "rel"),
         "--budget", "512", "--shards", "4", "--parallelism", "4"],
        capture_output=True, text=True, cwd=repo, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep = json.loads(r2.stdout.strip().splitlines()[-1])
    assert sum(v[0] for v in rep["per_split"].values()) > 0
    rel = spark.read.parquet(str(tmp_path / "rel"))
    assert {"tokens", "pack_id"} <= set(rel.columns)
    assert rel.count() > 0
