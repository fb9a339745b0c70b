"""Corpus-monitor job contracts: identical snapshots raise no alarms,
planted drift / dup / quality regressions each trip exactly their alarm,
and the report's numbers match independently computed values."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))
from corpus_monitor import monitor_corpus, snapshot_stats  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    df.count()
    yield df
    df.unpersist()


def test_identical_snapshots_no_alarms(docs):
    r = monitor_corpus(docs, docs, n_buckets=512)
    assert r["alarms"]["drift"] is False
    assert r["alarms"]["quality_drop"] is False
    assert r["alarms"]["new_source"] == []
    assert r["alarms"]["lost_source"] == []
    assert r["drift"]["kl_ab"] == pytest.approx(0.0, abs=1e-9)
    assert r["drift"]["tvd"] == pytest.approx(0.0, abs=1e-9)
    assert r["prev"] == r["cur"]


def test_snapshot_stats_independent_values(docs):
    s = snapshot_stats(docs)
    assert s["docs"] == docs.count()
    assert s["by_source"] == {
        r.source: r.cnt for r in
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
        .collect()}
    assert 0 <= s["quality_rate"] <= 1
    assert 0 <= s["lang_rate"] <= 1
    assert 0 <= s["dup_rate"] < 1


def test_planted_drift_trips_drift_alarm(spark, docs):
    shifted = docs.withColumn(
        "text", F.concat(F.lit("zzqx wwvk zzqx wwvk zzqx wwvk "),
                         F.col("text")))
    r = monitor_corpus(docs, shifted, n_buckets=512, kl_alarm=0.05)
    assert r["alarms"]["drift"] is True
    # the planted grams dominate the interpretable view
    top_grams = {t["gram"] for t in r["drift"]["top_grams"]}
    assert "zzqx" in top_grams and "wwvk" in top_grams
    assert r["alarms"]["quality_drop"] is False


def test_planted_dup_trips_dup_alarm(spark, docs):
    dup_blob = docs.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
        "source", "n_chars")
    dups = docs.unionByName(
        dup_blob.crossJoin(spark.range(200).select(
            F.col("id").alias("rep")))
        .select((F.col("doc_id") + F.col("rep")).alias("doc_id"), "text",
                "lang", "source", "n_chars"))
    r = monitor_corpus(docs, dups, n_buckets=512, dup_alarm=0.2)
    assert r["alarms"]["dup"] is True
    assert r["cur"]["dup_rate"] > 0.2


def test_null_source_and_null_text_are_monitored_not_crashes(spark, docs):
    """A crawl with missing metadata must be monitored, not kill the
    monitor: NULL sources count under '(null source)' (mixed None/str
    would TypeError in sorted()/json.dumps), and NULL-text docs are NOT
    duplicates of each other (countDistinct ignoring NULL fps would
    report n-1 phantom dups and false-page the dup alarm)."""
    import json

    holey = docs.withColumn(
        "source", F.when(F.col("doc_id") % 4 == 0, F.lit(None))
        .otherwise(F.col("source"))).withColumn(
        "text", F.when(F.col("doc_id") % 4 == 0, F.lit(None))
        .otherwise(F.col("text")))
    s = snapshot_stats(holey)
    assert s["docs"] == docs.count()
    assert "(null source)" in s["by_source"]
    # the unique docs stay unique: NULL texts carry per-doc sentinels
    assert s["dup_rate"] == 0.0
    r = monitor_corpus(docs, holey, n_buckets=256)
    json.dumps(r, sort_keys=True)  # report must serialize
    assert r["alarms"]["dup"] is False
    assert "(null source)" in r["alarms"]["new_source"]


def test_planted_quality_drop_and_source_change(spark, docs):
    bad = docs.withColumn(
        "text", F.lit("!!! ??? !!! ??? !!!")).withColumn(
        "source", F.concat(F.lit("new_"), F.col("source")))
    r = monitor_corpus(docs, bad, n_buckets=512)
    assert r["alarms"]["quality_drop"] is True
    assert r["alarms"]["new_source"] != []
    assert r["alarms"]["lost_source"] != []
