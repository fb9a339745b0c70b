"""Multimodal plumbing: chunk/frame explode, deterministic frame sampling,
and the stubbed decode/resize stages (schema, batching, and determinism are
the real contract — the decode itself is an honestly-disclosed stub)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import multimodal as mm
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _media(spark):
    return mm.with_fake_media(load(spark, SF, "documents"))


def test_sample_frames_is_modular_subset(spark):
    """Sampling keeps exactly the chunk ids ≡ offset (mod k) — verified
    against an independent pandas replica of the full chunk table."""
    chunks = mm.media_chunks(_media(spark), chunk_chars=32)
    sampled = mm.sample_frames(chunks, every_k=3, offset=1)
    full = chunks.toPandas()
    got = sampled.toPandas()
    want = full[full["chunk_id"] % 3 == 1]
    assert len(got) == len(want) > 0
    assert set(map(tuple, got[["doc_id", "chunk_id"]].values)) == \
        set(map(tuple, want[["doc_id", "chunk_id"]].values))


def test_sample_frames_filter_is_jvm_side(spark):
    """The sampling predicate runs in the JVM plan (a Filter over the
    Python explode's output), not as a second Python stage."""
    sampled = mm.sample_frames(mm.media_chunks(_media(spark)), every_k=4)
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Filter" in plan


def test_resize_media_deterministic_and_bounded(spark):
    out = mm.resize_media(_media(spark), out_width=16, out_height=16).toPandas()
    assert (out["out_width"] <= 16).all() and (out["out_height"] <= 16).all()
    assert (out["out_width"] <= out["width"]).all()
    # checksum binds payload + target dims: recompute one row independently
    row = out.iloc[0]
    docs = load(spark, SF, "documents")
    text = docs.filter(F.col("doc_id") == int(row.doc_id)) \
        .select("text").collect()[0][0]
    want = hashlib.md5(
        text.encode() + f":{row.out_width}x{row.out_height}".encode()
    ).hexdigest()
    assert row.resized_md5 == want
    # same input twice → identical output (no hidden nondeterminism)
    again = mm.resize_media(_media(spark), out_width=16, out_height=16).toPandas()
    assert sorted(out["resized_md5"]) == sorted(again["resized_md5"])


def test_decode_stub_raises_without_fake(spark):
    """The non-fake path fails loudly (disclosed environment limitation),
    never silently fabricates features."""
    with pytest.raises(Exception) as ei:
        mm.resize_media(_media(spark), fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_fake_decode_dims_are_codepoints_not_bytes(spark):
    """The fake decoder's dims must come from Unicode CODEPOINTS of the
    payload text, matching what the DuckDB oracle (ascii/substr — character
    semantics) can express: a doc starting/ending with a multi-byte char
    must not silently diverge (é: first UTF-8 byte 0xC3=195 vs codepoint
    233)."""
    import duckdb

    text = "é multi-byte bookends é"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = mm.extract_media_features(mm.with_fake_media(docs)).collect()[0]
    want_w = ord("é") % 64 + 1
    assert (out.width, out.height) == (want_w, want_w)
    # cross-engine: the oracle formula computes the same dims
    con = duckdb.connect()
    w, h = con.execute(
        "SELECT CAST(ascii(substr(t, 1, 1)) % 64 + 1 AS INTEGER), "
        "CAST(ascii(substr(t, length(t), 1)) % 64 + 1 AS INTEGER) "
        "FROM (VALUES (?)) AS v(t)", [text]).fetchone()
    assert (w, h) == (out.width, out.height)
