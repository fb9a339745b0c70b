"""jobs/process_drop.py CLI: bootstrap the store, process a drop, verify
the JSON report and the reprocess fixpoint (same drop again → 0 survivors).
Runs in-process (subprocess JVM spin-up is covered by the packaging smoke)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_docs(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(path)


@pytest.mark.slow
def test_process_drop_cli_end_to_end(spark, tmp_path):
    corpus = [(i, f"retained corpus doc {i} about topic {i % 5}")
              for i in range(30)]
    drop = ([(100 + i, f"retained corpus doc {i} about topic {i % 5}")
             for i in range(3)]          # exact dups of history
            + [(200, "retained corpus doc 7 about topic 2 zz")]  # near-dup
            + [(300 + i, f"genuinely new content {i} in this drop {i * 13}")
               for i in range(4)])       # fresh
    corpus_path = str(tmp_path / "corpus.parquet")
    drop_path = str(tmp_path / "drop.parquet")
    store = str(tmp_path / "store")
    _write_docs(spark, corpus, corpus_path)
    _write_docs(spark, drop, drop_path)

    def run():
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "process_drop.py"),
             "--store", store, "--batch", drop_path,
             "--init-from", corpus_path, "--parallelism", "4"],
            capture_output=True, text=True, cwd=REPO)
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    rep = run()
    assert rep["batch_rows"] == 8
    assert rep["survivors"] == 4          # 3 exact + 1 near dropped
    assert rep["dropped_exact_or_near"] == 4
    assert rep["near_dup_pairs"] >= 1
    assert 0 < rep["pruned_buckets"] <= 256
    assert rep["appended"] is True

    # fixpoint: the survivors are now history — reprocessing the same drop
    # keeps nothing (exact fps all present).
    rep2 = run()
    assert rep2["survivors"] == 0
