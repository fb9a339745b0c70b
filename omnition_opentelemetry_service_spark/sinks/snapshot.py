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
import re
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

    def _next_version(self) -> int:
        """First version with no manifest file on disk. Scanning manifests —
        not just CURRENT — matters for crash recovery: a process killed
        between the O_EXCL manifest create and the CURRENT advance leaves an
        ORPHAN manifest at CURRENT+1; allocating from CURRENT alone would
        collide with it on every re-run and brick the table (the orphan is
        harmless otherwise — readers walk manifests downward from CURRENT,
        so an uncommitted version above CURRENT is never consulted)."""
        vs = [int(m.group(1)) for m in
              (re.match(r"v_(\d+)\.manifest\.json$", n)
               for n in os.listdir(self.root)) if m]
        return max([self.current_version() or 0, *vs], default=0) + 1

    def write(self, df: DataFrame, stage: str, partition_by: list[str] | None = None,
              fmt: str = "parquet", meta=None) -> dict:
        """Write a new snapshot and commit it. The data write is to a
        version-private dir; the commit publishes the manifest with an
        EXCLUSIVE create (O_EXCL — two concurrent writers racing on the same
        version: exactly one commit wins, the loser gets FileExistsError and
        must retry at a fresh version — Iceberg's optimistic-concurrency
        contract), then atomically advances CURRENT.

        ``meta`` (dict, or a zero-arg callable evaluated AFTER the data write
        — e.g. to harvest Observation counters the write action just filled)
        rides in the manifest, so resume can validate the config fingerprint
        and restore driver-side state without re-running the stage."""
        for _ in range(64):  # re-allocate on commit loss; never same-version
            version = self._next_version()
            data_dir = os.path.join(self.root, f"v_{version}")
            writer = df.write.mode("overwrite").format(fmt)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.save(data_dir)

            m = meta() if callable(meta) else meta
            manifest = {
                "version": version,
                "stage": stage,
                "committed_at": time.time(),
                "partition_by": partition_by or [],
                "format": fmt,
                **(m or {}),
            }
            # O_EXCL commit: the manifest path is the commit token. A
            # concurrent writer that committed this version between our
            # allocation and here makes this raise — optimistic concurrency,
            # never a silent overwrite; the loser RETRIES AT A FRESH VERSION
            # (_next_version skips every manifest on disk, committed or
            # orphaned), exactly Iceberg's contract.
            manifest_path = os.path.join(self.root, f"v_{version}.manifest.json")
            try:
                fd = os.open(manifest_path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)

            tmp_cur = os.path.join(self.root, f".CURRENT.{version}.tmp")
            with open(tmp_cur, "w") as f:
                f.write(str(version))
            os.replace(tmp_cur, self._current_path())
            return manifest
        raise RuntimeError(
            f"could not commit stage {stage!r} under {self.root}: lost the "
            "version race 64 times")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return spark.read.parquet(os.path.join(self.root, f"v_{v}"))

    def stage_manifest(self, stage: str,
                       fingerprint: str | None = None) -> dict | None:
        """Latest committed manifest for ``stage`` — or None. When a
        ``fingerprint`` is given, a snapshot committed under a DIFFERENT
        config/input fingerprint does not count: resuming it against a
        changed config would silently join stale data with fresh inputs."""
        v = self.current_version()
        while v:
            m = self.manifest(v)
            if m and m.get("stage") == stage:
                if fingerprint is not None and m.get("fingerprint") != fingerprint:
                    return None
                return m
            v -= 1
        return None

    def has_stage(self, stage: str, fingerprint: str | None = None) -> bool:
        """True if a committed snapshot for ``stage`` exists (and matches the
        config fingerprint, when given) — the resume-skip check."""
        return self.stage_manifest(stage, fingerprint) is not None
