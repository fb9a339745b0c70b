"""Snapshot commit protocol — versioning, atomic CURRENT pointer, stage
resume check (Iceberg-snapshot-model contract over parquet+manifest)."""

from __future__ import annotations

import os

from omnition_opentelemetry_service_spark.sinks.snapshot import SnapshotTable


def test_empty_table_has_no_version(tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    assert t.current_version() is None
    assert not t.has_stage("anything")


def test_write_commits_and_reads_back(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(10).withColumnRenamed("id", "x")
    m = t.write(df, stage="s1")
    assert m["version"] == 1 and m["stage"] == "s1"
    assert t.current_version() == 1
    assert t.has_stage("s1")
    assert sorted(r.x for r in t.read(spark).collect()) == list(range(10))


def test_versions_accumulate_and_old_readable(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(3).withColumnRenamed("id", "x"), stage="a")
    t.write(spark.range(5).withColumnRenamed("id", "x"), stage="b")
    assert t.current_version() == 2
    assert t.read(spark).count() == 5  # current
    assert t.read(spark, version=1).count() == 3  # time travel
    assert t.has_stage("a") and t.has_stage("b") and not t.has_stage("c")


def test_commit_is_atomic_no_tmp_left(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    t.write(spark.range(2).withColumnRenamed("id", "x"), stage="s")
    leftovers = [f for f in os.listdir(root) if f.endswith(".tmp")]
    assert leftovers == []


def test_partitioned_snapshot(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "k string, v int")
    t.write(df, stage="s", partition_by=["k"])
    data_dir = os.path.join(str(tmp_path / "t"), "v_1")
    assert any(d.startswith("k=") for d in os.listdir(data_dir))
    assert t.read(spark).count() == 3
