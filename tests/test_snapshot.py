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


# -- Iceberg-model contract tests (earning the snapshot substitute) ----------
def test_concurrent_commit_one_winner(spark, tmp_path):
    """Optimistic concurrency: two writers racing on the same version — the
    second manifest publish must FAIL (O_EXCL commit token), never silently
    overwrite the winner (Iceberg's commit-conflict contract)."""
    import pytest

    t1 = SnapshotTable(str(tmp_path / "t"))
    t2 = SnapshotTable(str(tmp_path / "t"))  # second writer, same table
    df = spark.range(4).withColumnRenamed("id", "x")
    # both writers observe current_version()==None → both target v_1
    t1.write(df, stage="a")
    # simulate the loser: its data write succeeded but the v_1 commit token
    # is taken — replay the commit step it would perform
    with pytest.raises(FileExistsError):
        fd = os.open(os.path.join(str(tmp_path / "t"), "v_1.manifest.json"),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    # the loser retries at a fresh version and succeeds
    m = t2.write(df, stage="a")
    assert m["version"] == 2
    assert t1.manifest(1)["stage"] == "a"  # winner's commit intact


def test_crash_between_manifest_and_current_recovers(spark, tmp_path):
    """Kill-window recovery: a process that dies AFTER the O_EXCL manifest
    create but BEFORE the CURRENT advance leaves an orphan manifest at
    CURRENT+1. A re-run must not collide with it forever — it allocates
    past every manifest on disk and commits; the orphan (above CURRENT)
    stays invisible to readers."""
    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    df = spark.range(4).withColumnRenamed("id", "x")
    t.write(df, stage="a")  # v_1 committed, CURRENT=1
    # simulate the crash: v_2 manifest exists, CURRENT never advanced
    with open(os.path.join(root, "v_2.manifest.json"), "w") as f:
        f.write('{"version": 2, "stage": "b"}')
    assert t.current_version() == 1
    assert not t.has_stage("b")  # orphan above CURRENT is never consulted
    m = t.write(df, stage="b")  # re-run of the killed stage
    assert m["version"] == 3  # allocated PAST the orphan, no collision
    assert t.current_version() == 3
    assert t.has_stage("b")
    assert t.read(spark).count() == 4


def test_snapshot_read_prunes_partitions(spark, tmp_path):
    """Partition pruning on read: a sink-filtered scan of a snapshot
    partitioned by sink must push the filter into PartitionFilters — reading
    one sink of a 10^12-row snapshot must not list the other sinks' files."""
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("s1", i) for i in range(10)] + [("s2", i) for i in range(5)],
        "sink string, v int")
    t.write(df, stage="routed", partition_by=["sink"])
    scan = t.read(spark).filter("sink = 's1'")
    assert scan.count() == 10
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the sink predicate must appear in PartitionFilters, not as a post-scan
    # data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "sink" in pf


def test_fingerprint_mismatch_hides_stage(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(3).withColumnRenamed("id", "x")
    t.write(df, stage="parsed", meta={"fingerprint": "abc"})
    assert t.has_stage("parsed")                      # no fp asked → visible
    assert t.has_stage("parsed", fingerprint="abc")   # matching fp → visible
    assert not t.has_stage("parsed", fingerprint="zzz")  # changed cfg → hidden


def test_meta_callable_evaluated_after_write(spark, tmp_path):
    """meta as a callable runs AFTER the data write — the hook that lets
    Observation-harvested counters commit with the manifest."""
    t = SnapshotTable(str(tmp_path / "t"))
    seen = []

    def late_meta():
        # by now the write ACTION has run: the parquet files exist in the
        # writer-private staging dir (they enter v_<n> via the later rename)
        root = str(tmp_path / "t")
        seen.append(any(n.startswith(".staged-") and
                        os.listdir(os.path.join(root, n))
                        for n in os.listdir(root)))
        return {"counters": [["parse", "tag", 3, 1]]}

    m = t.write(spark.range(3).withColumnRenamed("id", "x"),
                stage="parsed", meta=late_meta)
    assert seen == [True]
    assert m["counters"] == [["parse", "tag", 3, 1]]
    assert t.stage_manifest("parsed")["counters"] == [["parse", "tag", 3, 1]]


def test_crash_between_data_rename_and_manifest_recovers(spark, tmp_path):
    """Kill-window recovery for the FIRST commit step: a process that dies
    after claiming the v_<n> data dir but before the manifest create leaves
    an orphan DATA dir with no manifest. A re-run must allocate past it
    (colliding renames would loop) and the orphan must stay invisible."""
    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    df = spark.range(4).withColumnRenamed("id", "x")
    t.write(df, stage="a")  # v_1 committed, CURRENT=1
    os.makedirs(os.path.join(root, "v_2", "data"))  # orphan claim, no manifest
    assert t.current_version() == 1
    m = t.write(df, stage="b")
    assert m["version"] == 3  # allocated PAST the orphan data dir
    assert t.current_version() == 3
    assert t.read(spark).count() == 4


def test_writers_stage_in_private_dirs_and_clean_up(spark, tmp_path):
    """Concurrent-writer isolation: data files are written to a
    writer-unique staging dir and only enter v_<n> via an atomic rename —
    so a racing writer can never overwrite another's uncommitted files
    (Iceberg writes data to writer-unique paths for the same reason).
    After a successful commit no staging dir remains."""
    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    df = spark.range(4).withColumnRenamed("id", "x")
    t.write(df, stage="a")
    t.write(df, stage="b")
    leftovers = [n for n in os.listdir(root) if n.startswith(".staged-")]
    assert leftovers == []
    assert {t.manifest(1)["stage"], t.manifest(2)["stage"]} == {"a", "b"}


def test_read_version_pins_past_concurrent_commits(spark, tmp_path):
    """Resume must read the MATCHED manifest's version, not CURRENT: after a
    run under a different fingerprint commits (advancing CURRENT), the
    fingerprint-matched manifest still points at its own data."""
    t = SnapshotTable(str(tmp_path / "t"))
    a = spark.createDataFrame([(1, "A")], "id long, tag string")
    b = spark.createDataFrame([(2, "B")], "id long, tag string")
    t.write(a, stage="parsed", meta={"fingerprint": "fpA"})
    t.write(b, stage="parsed", meta={"fingerprint": "fpB"})  # CURRENT → B

    m = t.stage_manifest("parsed", "fpA")
    assert m is not None
    rows = t.read(spark, m["version"]).collect()
    assert [(r.id, r.tag) for r in rows] == [(1, "A")]
    # unpinned read sees CURRENT (B) — the trap the version arg closes
    assert t.read(spark).collect()[0].tag == "B"


def test_read_honors_manifest_format(spark, tmp_path):
    """A snapshot committed with fmt != parquet must read back through the
    format its manifest records."""
    t = SnapshotTable(str(tmp_path / "fmt"))
    df = spark.createDataFrame([(1, "x")], "id long, tag string")
    m = t.write(df, stage="s", fmt="json")
    back = t.read(spark, m["version"])
    assert [(r.id, r.tag) for r in back.select("id", "tag").collect()] \
        == [(1, "x")]


def test_expire_keeps_newest_and_sweeps_orphans(spark, tmp_path):
    import os
    import shutil

    from omnition_opentelemetry_service_spark.sinks.snapshot import (
        SnapshotTable)

    t = SnapshotTable(str(tmp_path / "snap"))
    for i in range(4):
        t.write(spark.range(10 + i).toDF("v"), stage=f"s{i}")
    cur = t.current_version()
    assert cur == 4

    expired = t.expire(keep_last=2)
    assert expired == [1, 2]
    # expired versions: manifest AND data gone; survivors readable
    for v in expired:
        assert t.manifest(v) is None
        assert not os.path.isdir(os.path.join(t.root, f"v_{v}"))
    assert t.read(spark, 3).count() == 12
    assert t.read(spark, 4).count() == 13
    # resume walk still finds the newest surviving stage
    assert t.stage_manifest("s3")["version"] == 4
    assert t.stage_manifest("s1") is None  # expired resume point is gone
    # version allocation never reuses an expired number
    t.write(spark.range(1).toDF("v"), stage="s5")
    assert t.current_version() == 5

    # crash window: manifest removed but data dir left → invisible to
    # readers, swept by the next expire
    os.makedirs(os.path.join(t.root, "v_2"), exist_ok=True)
    t.expire(keep_last=2)
    assert not os.path.isdir(os.path.join(t.root, "v_2"))

    # CURRENT itself never expires even with keep_last=1
    t.expire(keep_last=1)
    assert t.read(spark).count() == 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.expire(keep_last=0)
