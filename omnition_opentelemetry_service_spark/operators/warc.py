"""WARC (ISO 28500) container codec + Spark source — the crawl pipeline's
FILE layer, upstream of jobs/web_ingest.py's (doc_id, url, html) input.

Web-scale corpora arrive as WARC: concatenated records, each a header
block (``WARC/1.0`` version line + colon headers + blank line) followed by
exactly ``Content-Length`` payload bytes and a ``\\r\\n\\r\\n`` record
separator. Response records wrap a full HTTP response (status line +
headers + body). Archives ship with each record as its OWN gzip member so
readers can seek to a record without inflating the file — both layouts
(plain, per-record-gzip) are supported on encode and auto-detected on
decode.

Shape at scale: one WARC file = one input row = one task. ``parse_warc``
is a single zero-shuffle mapInPandas pass (plain Python per opaque binary
buffer — the layer tests/test_no_per_row_python.py carves out); on a real
cluster the input comes from ``spark.read.format("binaryFile")`` over the
archive bucket, where the standard ~1 GiB-per-file layout gives natural
task granularity and needs no repartition. No shuffle exists anywhere in
file→records→docs; downstream identity/dedup stages (operators/web.py)
introduce the first exchanges.

Determinism: encoders take the date as an argument (no clock reads), gzip
members are produced by zlib's deflate wrapper (mtime=0 — byte-stable, so
fixtures can pin checksums), and fixture record order is sorted inside
each file. Everything is strict-parse: a truncated payload, a missing
Content-Length or a malformed version line raises with the file offset
rather than yielding silently-short corpora.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_FIXED_DATE = "2026-01-01T00:00:00Z"  # fixtures pin the clock


# -- record / archive encode --------------------------------------------------
def encode_http_response(body: bytes, status: int = 200,
                         reason: str = "OK",
                         content_type: str = "text/html") -> bytes:
    """Minimal deterministic HTTP/1.1 response framing around a body."""
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body


def encode_warc_record(target_uri: str, rec_id: str, payload: bytes,
                       warc_type: str = "response",
                       content_type: str = "application/http; msgtype=response",
                       date: str = _FIXED_DATE) -> bytes:
    """One WARC/1.0 record: version line, headers, blank line, exactly
    Content-Length payload bytes, then the two-CRLF record separator."""
    for v, name in ((target_uri, "WARC-Target-URI"), (rec_id, "WARC-Record-ID")):
        if v is None or "\r" in v or "\n" in v:
            raise ValueError(f"{name} must be a single header-safe line: {v!r}")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {warc_type}\r\n"
            f"WARC-Record-ID: {rec_id}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {target_uri}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
    return head + payload + _SEP


def _gzip_member(raw: bytes) -> bytes:
    # deflate's gzip wrapper (wbits=16+MAX_WBITS) writes mtime=0 —
    # byte-deterministic, unlike the gzip module's default clock stamp
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def encode_warc(records: list[bytes], gzip_records: bool = False) -> bytes:
    """Concatenate encoded records into one archive buffer; with
    ``gzip_records`` each record becomes its own gzip member (the
    seekable layout real crawl archives use)."""
    if gzip_records:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


# -- strict decode -------------------------------------------------------------
def _split_members(buf: bytes) -> list[tuple[int, bytes]]:
    """(member_offset, inflated_bytes) per gzip member via unused_data
    chaining; raises on trailing garbage."""
    out, pos = [], 0
    while pos < len(buf):
        if buf[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError(f"not a gzip member at offset {pos}")
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        data = do.decompress(buf[pos:])
        if not do.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        out.append((pos, data))
        pos = len(buf) - len(do.unused_data)
    return out


def _decode_one(buf: bytes, pos: int, offset_label: int) -> tuple[dict, int]:
    """Parse one record starting at ``pos``; returns (record, next_pos).
    ``offset_label`` is what to report as the record's archive offset."""
    head_end = buf.find(_SEP, pos)
    if head_end < 0:
        raise ValueError(f"no header terminator after offset {offset_label}")
    lines = buf[pos:head_end].decode("utf-8").split("\r\n")
    if lines[0] not in ("WARC/1.0", "WARC/1.1"):
        raise ValueError(
            f"bad WARC version line at offset {offset_label}: {lines[0]!r}")
    hdrs: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(":")
        if not sep:
            raise ValueError(
                f"malformed header at offset {offset_label}: {ln!r}")
        hdrs[k.strip().lower()] = v.strip()
    if "content-length" not in hdrs:
        raise ValueError(f"missing Content-Length at offset {offset_label}")
    clen = int(hdrs["content-length"])
    body_start = head_end + len(_SEP)
    body_end = body_start + clen
    if buf[body_end:body_end + len(_SEP)] != _SEP or body_end > len(buf):
        raise ValueError(
            f"truncated payload or missing record separator at offset "
            f"{offset_label} (Content-Length {clen})")
    rec = {
        "offset": offset_label,
        "warc_type": hdrs.get("warc-type", ""),
        "rec_id": hdrs.get("warc-record-id", ""),
        "target_uri": hdrs.get("warc-target-uri"),
        "date": hdrs.get("warc-date", ""),
        "content_type": hdrs.get("content-type", ""),
        "payload": buf[body_start:body_end],
    }
    return rec, body_end + len(_SEP)


def decode_warc(buf: bytes) -> list[dict]:
    """Strict archive → records. Gzip layout auto-detected from the magic;
    offsets are archive offsets (member offsets in the gzip layout, so a
    reader could seek straight back to any record)."""
    records = []
    if buf[:2] == b"\x1f\x8b":
        for moff, raw in _split_members(buf):
            rec, nxt = _decode_one(raw, 0, moff)
            if nxt != len(raw):
                raise ValueError(
                    f"gzip member at offset {moff} holds more than one "
                    f"record — per-record members required")
            records.append(rec)
        return records
    pos = 0
    while pos < len(buf):
        rec, pos = _decode_one(buf, pos, pos)
        records.append(rec)
    return records


def split_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """(status, headers, body) from an HTTP response payload; strict on
    the status line and the Content-Length/body agreement."""
    head_end = payload.find(_SEP)
    if head_end < 0:
        raise ValueError("no HTTP header terminator in payload")
    lines = payload[:head_end].decode("utf-8").split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line: {lines[0]!r}")
    status = int(parts[1])
    hdrs = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        hdrs[k.strip().lower()] = v.strip()
    body = payload[head_end + len(_SEP):]
    if "content-length" in hdrs and int(hdrs["content-length"]) != len(body):
        raise ValueError("HTTP Content-Length does not match body size")
    return status, hdrs, body


# -- Spark source --------------------------------------------------------------
_PARSE_SCHEMA = ("warc_file string, rec_offset bigint, warc_type string, "
                 "rec_id string, url string, http_status int, "
                 "mime string, body binary")


def parse_warc(files: DataFrame, file_col: str = "warc_file",
               data_col: str = "data") -> DataFrame:
    """Archive files → one row per WARC record. Response records get
    their HTTP framing split (http_status + body); non-response records
    (warcinfo, request, metadata) pass through with NULL status and the
    raw payload as body. ONE zero-shuffle mapInPandas pass — file rows in,
    record rows out, no exchange (the binaryFile task layout is kept)."""

    def parse(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for fname, data in zip(pdf[file_col], pdf[data_col]):
                for rec in decode_warc(bytes(data)):
                    status, body = None, rec["payload"]
                    # mime = the PAYLOAD's media type: for responses the
                    # HTTP Content-Type header (the envelope type is the
                    # constant 'application/http; msgtype=response' for
                    # every response record — carrying it instead threw
                    # the actual media type away; review finding).
                    mime = rec["content_type"]
                    if rec["warc_type"] == "response":
                        status, hdrs, body = split_http_response(
                            rec["payload"])
                        mime = hdrs.get("content-type", mime)
                    rows.append({
                        "warc_file": fname, "rec_offset": rec["offset"],
                        "warc_type": rec["warc_type"],
                        "rec_id": rec["rec_id"], "url": rec["target_uri"],
                        "http_status": status,
                        "mime": mime, "body": body,
                    })
            yield pd.DataFrame(rows, columns=[
                "warc_file", "rec_offset", "warc_type", "rec_id", "url",
                "http_status", "mime", "body"])

    return files.mapInPandas(parse, schema=_PARSE_SCHEMA)


def warc_to_docs(parsed: DataFrame, source: str = "warc") -> DataFrame:
    """Parsed response records → the (doc_id, url, html, source) shape
    jobs/web_ingest.py ingests. doc_id comes from the ``urn:doc:<n>``
    record-id convention when present (fixtures; replayable corpora),
    else a deterministic xxhash64 of (file, offset) — stable across
    reruns, unique per record. Pure projection, zero shuffle."""
    doc_from_urn = F.regexp_extract("rec_id", r"^urn:doc:(\d+)$", 1)
    return (parsed
            .filter(~fetch_drop_pred())
            .select(
                F.when(doc_from_urn != "", doc_from_urn.cast("bigint"))
                .otherwise(F.xxhash64("warc_file", "rec_offset"))
                .alias("doc_id"),
                "url",
                F.col("body").cast("string").alias("html"),
                F.lit(source).alias("source")))


def fetch_drop_pred() -> "F.Column":
    """The predicate warc_to_docs filters on, exposed so jobs can hang a
    received/dropped Observation on the parse output (obsreport
    discipline: counters ride the pass, they don't add one)."""
    # text/* only now that mime is the real HTTP Content-Type: a 200
    # image/png body cast to "html" would feed binary bytes into the HTML
    # strip (mime was formerly the constant WARC envelope type, making a
    # media-type gate impossible — review finding)
    return ~((F.col("warc_type") == "response")
             & (F.col("http_status") == 200)
             & F.col("mime").startswith("text/"))


def load_warc_docs(spark, path: str, source: str = "warc",
                   counters=None) -> DataFrame:
    """Archive directory → web_ingest's (doc_id, url, html, source) input:
    ``binaryFile`` scan (one file = one row = one task; Spark splits the
    listing across executors, so a million-file bucket lists in parallel)
    → parse_warc → warc_to_docs. ``counters`` (metrics.StageCounters)
    gets a 'fetch' stage Observation counting non-response / non-200
    records dropped — fired on the same pass as the downstream consumer."""
    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path").alias("warc_file"),
                     F.col("content").alias("data")))
    parsed = parse_warc(files)
    if counters is not None:
        parsed = counters.observe_stage(
            parsed, "web_ingest", "fetch", drop_predicate=fetch_drop_pred())
    return warc_to_docs(parsed, source=source)


# -- deterministic fixture ------------------------------------------------------
def warc_fixture_files(docs: DataFrame, n_files: int = 8,
                       gzip_records: bool = False,
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url, html) → (warc_file, data): docs bucketed by
    doc_id % n_files, each bucket encoded (sorted by doc_id — order is
    part of the byte contract) into one archive. One exchange on the
    file key, then a grouped Arrow kernel; output rows = n_files."""

    def build(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        recs = [
            encode_warc_record(
                u, f"urn:doc:{int(d)}",
                encode_http_response(h.encode("utf-8")))
            for d, u, h in zip(pdf[id_col], pdf["url"], pdf["html"])]
        return pd.DataFrame([{
            "warc_file": f"fixture-{int(key[0]):05d}.warc"
                         + (".gz" if gzip_records else ""),
            "data": encode_warc(recs, gzip_records=gzip_records)}])

    return (docs.filter(F.col("url").isNotNull()
                        & F.col("html").isNotNull())
            .groupBy((F.col(id_col) % n_files).alias("_f"))
            .applyInPandas(build, schema="warc_file string, data binary"))
