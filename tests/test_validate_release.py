"""Release validator: green on fresh releases of both emits; RED (the
right check, nonzero exit) on tampered data — the audit must actually
catch corruption, not just bless its own recomputation."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

from jobs.make_release import (assemble_release, build_release,
                               write_manifest, write_packs_release,
                               write_release)
from jobs.validate_release import validate
from omnition_opentelemetry_service_spark import fixtures as fx

N = 1200
BUDGET = 512


def _manifest(spark, out, emit):
    from pyspark.sql import functions as F

    df = spark.read.parquet(out)
    tok = "pack_len" if emit == "packs" else "n_tok"
    per_split = {r["split"]: [r["rows"], r["toks"]] for r in
                 df.groupBy("split").agg(
                     F.count(F.lit(1)).alias("rows"),
                     F.sum(tok).alias("toks")).collect()}
    write_manifest(out, {"emit": emit, "budget": BUDGET, "n_shards": 4,
                         "epoch_weights": {}, "max_dup_frac": None,
                         "input": f"n={N}", "per_split": per_split,
                         "counters": []})


def _fresh(spark, tmp_path, emit):
    rel = build_release(fx.sequences(spark, N), budget=BUDGET, n_shards=4)
    out = str(tmp_path / f"rel_{emit}")
    if emit == "packs":
        write_packs_release(assemble_release(rel, BUDGET), out, 4)
    else:
        write_release(rel, out, 4)
    _manifest(spark, out, emit)
    return out


def test_validator_green_both_emits(spark, tmp_path):
    for emit in ("rows", "packs"):
        rep = validate(spark, _fresh(spark, tmp_path, emit))
        assert rep["ok"], rep
        assert rep["emit"] == emit


def test_validator_catches_tampered_pack_id(spark, tmp_path):
    """Flip pack ids in one shard file: pack_id_recompute (rows) must go
    red — and only deterministic-identity checks, not the row counts."""
    from pyspark.sql import functions as F

    out = _fresh(spark, tmp_path, "rows")
    f = sorted(glob.glob(f"{out}/split=train/shard=*/*.parquet"))[0]
    part_dir = os.path.dirname(f)
    # read the file standalone, corrupt, and swap it in-place
    broken = (spark.read.parquet(f)
              .withColumn("pack_id", F.col("pack_id") + 1))
    tmp_out = str(tmp_path / "broken_part")
    broken.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    os.remove(f)
    crc = os.path.join(part_dir, f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):  # stale checksum would fail the re-read
        os.remove(crc)
    src = glob.glob(f"{tmp_out}/*.parquet")[0]
    os.rename(src, os.path.join(part_dir, os.path.basename(f)))

    rep = validate(spark, out)
    assert not rep["ok"]
    assert not rep["checks"]["pack_id_recompute"]["ok"]
    assert not rep["checks"]["shuffle_identity"]["ok"]  # pid changed too
    assert rep["checks"]["manifest_totals"]["ok"]  # counts untouched


def test_validator_catches_missing_rows(spark, tmp_path):
    """Delete one shard's file: the manifest recount must go red."""
    out = _fresh(spark, tmp_path, "packs")
    f = sorted(glob.glob(f"{out}/split=train/shard=*/*.parquet"))[0]
    os.remove(f)
    rep = validate(spark, out)
    assert not rep["ok"]
    assert not rep["checks"]["manifest_totals"]["ok"]


def test_validator_cli_exit_codes(spark, tmp_path):
    out = _fresh(spark, tmp_path, "packs")
    env = dict(os.environ, PYTHONPATH=".")
    r = subprocess.run(
        [sys.executable, "jobs/validate_release.py", "--dir", out,
         "--parallelism", "4"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-800:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["ok"]
