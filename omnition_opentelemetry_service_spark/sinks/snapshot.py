"""Snapshot-committed table writes — the checkpoint/resume substrate.

Reference analog: the queued-retry processor (components.go:68) gives the
collector at-least-once delivery with replay; in batch Spark the idiomatic
equivalent is *idempotent stage commits*: each stage writes to a versioned
location and atomically publishes a manifest. Resume = skip stages whose
manifest exists (kill mid-pipeline → re-run → byte-identical outputs).

This is exactly Iceberg's snapshot model; the sandbox has no Iceberg runtime
jar, so the same contract is implemented over parquet + a JSON manifest
written via atomic rename. Switching to real Iceberg is a format string +
``saveAsTable`` swap (kept behind ``fmt``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """A directory of versioned snapshots with an atomically-published
    `current` pointer:

        <root>/v_<n>/...parquet        (data, written by Spark)
        <root>/v_<n>.manifest.json     (commit record, atomic rename)
        <root>/CURRENT                 (points at latest committed version)
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- commit protocol -----------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def manifest(self, version: int) -> dict | None:
        p = os.path.join(self.root, f"v_{version}.manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def write(self, df: DataFrame, stage: str, partition_by: list[str] | None = None,
              fmt: str = "parquet") -> dict:
        """Write a new snapshot and commit it. The data write is to a
        version-private dir; the commit is two atomic renames (manifest then
        CURRENT), so readers never observe a half-written snapshot."""
        version = (self.current_version() or 0) + 1
        data_dir = os.path.join(self.root, f"v_{version}")
        writer = df.write.mode("overwrite").format(fmt)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(data_dir)

        manifest = {
            "version": version,
            "stage": stage,
            "committed_at": time.time(),
            "partition_by": partition_by or [],
            "format": fmt,
        }
        tmp = os.path.join(self.root, f".v_{version}.manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, f"v_{version}.manifest.json"))

        tmp_cur = os.path.join(self.root, ".CURRENT.tmp")
        with open(tmp_cur, "w") as f:
            f.write(str(version))
        os.replace(tmp_cur, self._current_path())
        return manifest

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return spark.read.parquet(os.path.join(self.root, f"v_{v}"))

    def has_stage(self, stage: str) -> bool:
        """True if any committed snapshot was produced by ``stage`` (the
        resume-skip check)."""
        v = self.current_version()
        while v:
            m = self.manifest(v)
            if m and m.get("stage") == stage:
                return True
            v -= 1
        return False
