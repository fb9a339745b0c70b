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

    def _advance_current(self, tmp_cur: str, version: int) -> None:
        """Publish CURRENT MONOTONICALLY: a slower concurrent writer must
        never move CURRENT backwards past a newer committed version (the
        last-writer-wins os.replace alone allows exactly that — writer A
        claims v_10, stalls, writer B commits and publishes 11, A resumes
        and would set CURRENT back to 10, hiding B's committed snapshot
        from read()/stage_manifest()/expire()). The read-compare-replace
        runs under a short O_EXCL lock; a lock left by a crashed writer is
        stolen after 60 s, so the worst case is a bounded publish delay,
        never a lost commit. The retry budget STRICTLY exceeds the steal
        threshold (ADVICE r3: a 30 s budget vs a 60 s steal age meant a
        lock from a writer crashed <60 s ago exhausted every waiter's
        retries — RuntimeError after the snapshot data was already
        committed), so a stale lock is always eventually stolen."""
        lock = self._current_path() + ".lock"
        steal_age = 60.0
        deadline = time.monotonic() + steal_age + 30.0
        fd = None
        while time.monotonic() < deadline:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > steal_age:
                        os.remove(lock)
                        continue
                except OSError:
                    pass
                time.sleep(0.05)
        if fd is None:
            raise RuntimeError(
                f"could not acquire CURRENT publish lock {lock}")
        try:
            cur = self.current_version()
            if cur is None or cur < version:
                os.replace(tmp_cur, self._current_path())
            else:  # a newer commit already published — ours stays readable
                os.remove(tmp_cur)  # by version; do not move CURRENT back
        finally:
            os.close(fd)
            try:
                os.remove(lock)
            except OSError:
                pass

    def manifest(self, version: int) -> dict | None:
        p = os.path.join(self.root, f"v_{version}.manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _next_version(self) -> int:
        """First version with neither a manifest nor a data dir on disk.
        Scanning BOTH — not just CURRENT — matters for crash recovery:
        a process killed between the data-dir rename and the manifest
        create leaves an orphan v_<n> data dir; one killed between the
        manifest create and the CURRENT advance leaves an orphan manifest.
        Allocating from CURRENT alone would collide with either on every
        re-run and brick the table (orphans are harmless otherwise —
        readers walk manifests downward from CURRENT, so an uncommitted
        version above CURRENT is never consulted)."""
        vs = [int(m.group(1)) for m in
              (re.match(r"v_(\d+)(\.manifest\.json)?$", n)
               for n in os.listdir(self.root)) if m]
        return max([self.current_version() or 0, *vs], default=0) + 1

    def write(self, df: DataFrame, stage: str, partition_by: list[str] | None = None,
              fmt: str = "parquet", meta=None) -> dict:
        """Write a new snapshot and commit it. The data write goes to a
        WRITER-UNIQUE staging dir (Iceberg writes data files to
        writer-unique paths for the same reason: two concurrent writers
        racing on one version number must never touch each other's files);
        the version is then claimed by an atomic directory rename
        staging → v_<n> (exactly one rename wins a contested version — the
        loser retries at a fresh number), the manifest publishes with an
        EXCLUSIVE create (O_EXCL), and CURRENT advances atomically last.
        Crash between any two steps leaves only orphans that
        ``_next_version`` skips and readers (who walk manifests downward
        from CURRENT) never consult.

        ``meta`` (dict, or a zero-arg callable evaluated AFTER the data write
        — e.g. to harvest Observation counters the write action just filled)
        rides in the manifest, so resume can validate the config fingerprint
        and restore driver-side state without re-running the stage."""
        staged = os.path.join(
            self.root, f".staged-{os.getpid()}-{os.urandom(4).hex()}")
        writer = df.write.mode("overwrite").format(fmt)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(staged)
        m = meta() if callable(meta) else meta

        import errno
        import shutil

        for _ in range(64):  # re-allocate on version loss; never same-version
            version = self._next_version()
            data_dir = os.path.join(self.root, f"v_{version}")
            try:
                # The version claim: atomic on one filesystem; fails with
                # the target present (a concurrent winner or a crash
                # orphan) — retry at the next free number.
                os.rename(staged, data_dir)
            except OSError as e:
                # ONLY target-exists errors mean "lost the race"; anything
                # else (EXDEV staging/root on different filesystems, perms)
                # is persistent — retrying 64 times would blame concurrency
                # for an environment fault and leak the staged data dir.
                if e.errno in (errno.EEXIST, errno.ENOTEMPTY, errno.EISDIR):
                    continue
                shutil.rmtree(staged, ignore_errors=True)
                raise

            manifest = {
                "version": version,
                "stage": stage,
                "committed_at": time.time(),
                "partition_by": partition_by or [],
                "format": fmt,
                **(m or {}),
            }
            # The commit token. With data-rename-first ordering this create
            # cannot lose a race (a competing writer's rename onto our
            # claimed dir already failed); O_EXCL still guards against a
            # stray manifest from a foreign/older process — surfaced as an
            # error, never a silent overwrite.
            manifest_path = os.path.join(self.root, f"v_{version}.manifest.json")
            fd = os.open(manifest_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)

            tmp_cur = os.path.join(self.root, f".CURRENT.{version}.tmp")
            with open(tmp_cur, "w") as f:
                f.write(str(version))
            self._advance_current(tmp_cur, version)
            return manifest
        shutil.rmtree(staged, ignore_errors=True)
        raise RuntimeError(
            f"could not commit stage {stage!r} under {self.root}: lost the "
            "version race 64 times")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a committed snapshot. Pass the ``version`` from the manifest
        your resume check matched — CURRENT may have advanced past it (e.g.
        a concurrent run under a different fingerprint committed later), and
        reading CURRENT then would bypass the fingerprint guard entirely.
        The data format comes from that version's manifest (write() records
        ``fmt``), not an assumption of parquet."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        m = self.manifest(v) or {}
        return (spark.read.format(m.get("format", "parquet"))
                .load(os.path.join(self.root, f"v_{v}")))

    def stage_manifest(self, stage: str,
                       fingerprint: str | None = None) -> dict | None:
        """Latest committed manifest for ``stage`` (and, when given, the
        exact ``fingerprint``) — or None. A snapshot committed under a
        DIFFERENT config/input fingerprint never matches (resuming it
        against a changed config would silently join stale data with fresh
        inputs), but the walk CONTINUES below it: two configs alternating
        over one checkpoint dir each resume their own latest version.
        Pair the returned manifest's ``version`` with ``read(version=...)``
        — CURRENT may advance between the match and the read."""
        v = self.current_version()
        while v:
            m = self.manifest(v)
            if m and m.get("stage") == stage and (
                    fingerprint is None
                    or m.get("fingerprint") == fingerprint):
                return m
            v -= 1
        return None

    def has_stage(self, stage: str, fingerprint: str | None = None) -> bool:
        """True if a committed snapshot for ``stage`` exists (and matches the
        config fingerprint, when given) — the resume-skip check."""
        return self.stage_manifest(stage, fingerprint) is not None

    def expire(self, keep_last: int = 1) -> list[int]:
        """Retention (Iceberg ``expire_snapshots`` analog): drop committed
        versions below CURRENT beyond the newest ``keep_last``, so a
        long-lived checkpoint table doesn't accumulate one data dir per
        rerun forever. Returns the expired version numbers.

        Deletion order mirrors the commit protocol in reverse: the MANIFEST
        goes first (readers walk manifests downward from CURRENT, so the
        version becomes invisible atomically), then the data dir — a crash
        in between leaves an orphan data dir that ``_next_version`` already
        skips and a later expire() sweeps. Versions ABOVE current are never
        touched: one could be a concurrent writer's claimed-but-uncommitted
        dir. NOTE: expiring removes resume points for ALTERNATE config
        fingerprints sharing this table (stage_manifest's below-CURRENT
        walk) — retention policy is the caller's call, exactly as with
        Iceberg snapshot expiration."""
        import re as _re
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (CURRENT never expires)")
        cur = self.current_version()
        if cur is None:
            return []
        committed = sorted(
            int(m.group(1)) for m in
            (_re.match(r"v_(\d+)\.manifest\.json$", n)
             for n in os.listdir(self.root)) if m)
        committed = [v for v in committed if v <= cur]
        keep = set(committed[-keep_last:]) | {cur}
        expired = []
        for v in committed:
            if v in keep:
                continue
            os.remove(os.path.join(self.root, f"v_{v}.manifest.json"))
            shutil.rmtree(os.path.join(self.root, f"v_{v}"),
                          ignore_errors=True)
            expired.append(v)
        # sweep manifest-less orphan data dirs below CURRENT (dead by
        # construction: claims only ever land above the CURRENT they saw)
        for n in os.listdir(self.root):
            m = _re.match(r"v_(\d+)$", n)
            if (m and int(m.group(1)) < cur and int(m.group(1)) not in keep
                    and not os.path.exists(os.path.join(
                        self.root, f"{n}.manifest.json"))):
                shutil.rmtree(os.path.join(self.root, n), ignore_errors=True)
        return expired
