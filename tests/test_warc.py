"""WARC container codec + Spark source (operators/warc.py): byte-level
roundtrips for both layouts, strict-parse failure modes, HTTP framing, and
the Spark end-to-end file→records→docs path against the in-process model
(the same ground truth the warc_docs DuckDB twin recomputes in SQL)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import warc as wc


def _rec(i: int, body: bytes | None = None) -> bytes:
    b = body if body is not None else f"<html>doc {i}</html>".encode()
    return wc.encode_warc_record(
        f"http://site{i}.example.com/p{i}", f"urn:doc:{i}",
        wc.encode_http_response(b))


# -- codec roundtrips ----------------------------------------------------------
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_multi_record(gz):
    buf = wc.encode_warc([_rec(i) for i in range(5)], gzip_records=gz)
    recs = wc.decode_warc(buf)
    assert len(recs) == 5
    for i, r in enumerate(recs):
        assert r["warc_type"] == "response"
        assert r["rec_id"] == f"urn:doc:{i}"
        assert r["target_uri"] == f"http://site{i}.example.com/p{i}"
        status, hdrs, body = wc.split_http_response(r["payload"])
        assert status == 200
        assert hdrs["content-type"] == "text/html"
        assert body == f"<html>doc {i}</html>".encode()


def test_gzip_offsets_are_member_offsets_and_deterministic():
    recs = [_rec(i) for i in range(3)]
    buf1 = wc.encode_warc(recs, gzip_records=True)
    buf2 = wc.encode_warc(recs, gzip_records=True)
    assert buf1 == buf2  # mtime=0 deflate wrapper: byte-stable
    offs = [r["offset"] for r in wc.decode_warc(buf1)]
    assert offs[0] == 0 and offs == sorted(offs) and len(set(offs)) == 3
    # each offset is seekable: a member-aligned slice re-parses alone
    assert wc.decode_warc(buf1[offs[1]:offs[2]])[0]["rec_id"] == "urn:doc:1"


def test_payload_may_contain_record_separator_bytes():
    """Content-Length framing, not separator scanning: a body embedding
    CRLFCRLF must not split the record."""
    tricky = b"a\r\n\r\nWARC/1.0\r\n\r\nb"
    buf = wc.encode_warc([_rec(0, body=tricky)])
    recs = wc.decode_warc(buf)
    assert len(recs) == 1
    assert wc.split_http_response(recs[0]["payload"])[2] == tricky


# -- strict failure modes ------------------------------------------------------
def test_bad_version_line_raises():
    with pytest.raises(ValueError, match="version line"):
        wc.decode_warc(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")


def test_truncated_payload_raises():
    buf = wc.encode_warc([_rec(0)])
    with pytest.raises(ValueError, match="truncated payload|separator"):
        wc.decode_warc(buf[:-6])


def test_missing_content_length_raises():
    raw = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        wc.decode_warc(raw)


def test_truncated_gzip_member_raises():
    buf = wc.encode_warc([_rec(0)], gzip_records=True)
    with pytest.raises(ValueError, match="truncated gzip"):
        wc.decode_warc(buf[:-4])


def test_multi_record_gzip_member_rejected():
    member = wc._gzip_member(_rec(0) + _rec(1))
    with pytest.raises(ValueError, match="more than one"):
        wc.decode_warc(member)


def test_header_unsafe_uri_rejected():
    with pytest.raises(ValueError, match="header-safe"):
        wc.encode_warc_record("http://x/\r\nWARC-Type: evil", "urn:doc:0",
                              b"")


def test_http_content_length_mismatch_raises():
    payload = b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort"
    with pytest.raises(ValueError, match="Content-Length"):
        wc.split_http_response(payload)


# -- Spark end-to-end ----------------------------------------------------------
@pytest.mark.parametrize("gz", [False, True])
def test_spark_files_to_docs_roundtrip(spark, gz):
    rows = [(i, f"http://site{i % 4}.example.com/p{i}",
             f"<html><body>doc {i} body</body></html>", )
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, html string")
    files = wc.warc_fixture_files(docs, n_files=4, gzip_records=gz)
    fnames = [r["warc_file"] for r in files.select("warc_file").collect()]
    assert len(fnames) == 4 and len(set(fnames)) == 4

    parsed = wc.parse_warc(files)
    out = wc.warc_to_docs(parsed, source="crawl")
    got = {r["doc_id"]: (r["url"], r["html"], r["source"])
           for r in out.collect()}
    assert got == {i: (u, h, "crawl") for i, u, h in rows}


def test_parse_warc_is_zero_shuffle(spark):
    docs = spark.createDataFrame(
        [(1, "http://a.example.com/", "<p>x</p>")],
        "doc_id long, url string, html string")
    files = wc.warc_fixture_files(docs, n_files=1).localCheckpoint()
    plan = (wc.parse_warc(files)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_warc_to_docs_hash_fallback_for_foreign_ids(spark):
    rec = wc.encode_warc_record(
        "http://x.example.com/", "<urn:uuid:abc>",
        wc.encode_http_response(b"<p>hi</p>"))
    files = spark.createDataFrame([("f.warc", bytearray(wc.encode_warc([rec])))],
                                  "warc_file string, data binary")
    out = wc.warc_to_docs(wc.parse_warc(files)).collect()
    assert len(out) == 1 and out[0]["doc_id"] is not None
    assert out[0]["html"] == "<p>hi</p>"


def test_cli_input_warc_e2e(spark, tmp_path):
    """Crawl story from the FILE layer: real .warc.gz archives on disk →
    web_ingest --input-warc (binaryFile → parse → fetch counter → the
    normal stage chain) ≡ web_ingest over the equivalent doc table."""
    import json
    import os
    import subprocess
    import sys as _sys

    from jobs.web_ingest import web_ingest

    # text must pass BOTH gates (stopword-vote lang-ID needs en
    # stopwords; quality needs ≥5 tokens, low punct, ≥5% stopwords) so
    # the final set comparison is non-vacuous
    rows = [(i, f"http://site{i % 6}.example.com/p{i}",
             f"<html><body><p>Document {i} is the body of a page and "
             f"it is full of the words that count.</p></body></html>")
            for i in range(45)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, html string")
    wdir = tmp_path / "warc"
    wdir.mkdir()
    for r in wc.warc_fixture_files(docs, n_files=3,
                                   gzip_records=True).collect():
        (wdir / r["warc_file"]).write_bytes(bytes(r["data"]))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outp, rep = str(tmp_path / "clean"), str(tmp_path / "report.json")
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "jobs", "web_ingest.py"),
         "--input-warc", str(wdir), "--out", outp, "--report", rep,
         "--quality-min", "0.0", "--parallelism", "4"],
        capture_output=True, text=True, cwd=repo, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(open(rep).read())
    assert report["web_ingest:fetch"] == {"received": 45, "dropped": 0}

    expect = web_ingest(
        docs.withColumn("source", F.lit("warc")), quality_min=0.0)
    got = {tuple(x) for x in spark.read.parquet(outp).collect()}
    assert got == {tuple(x) for x in expect.collect()}
    assert got  # gates must not have emptied the corpus (vacuous ==)
    spark.catalog.clearCache()


def test_non_response_records_kept_in_parse_dropped_in_docs(spark):
    info = wc.encode_warc_record(
        "http://x.example.com/", "urn:doc:7", b"software: test",
        warc_type="warcinfo", content_type="application/warc-fields")
    resp = _rec(8)
    files = spark.createDataFrame(
        [("f.warc", bytearray(wc.encode_warc([info, resp])))],
        "warc_file string, data binary")
    parsed = wc.parse_warc(files)
    assert parsed.count() == 2
    assert (parsed.filter(F.col("warc_type") == "warcinfo")
            .select("http_status").collect()[0][0] is None)
    assert wc.warc_to_docs(parsed).count() == 1
