"""Elastic reshard (jobs/reshard_release.py): the resharded release
revalidates under the consumer audit, the GLOBAL data order is invariant
across shard counts (the world-size-change contract), packs stay atomic,
and the rewrite is byte-identically reproducible."""

from __future__ import annotations

import glob

from jobs.make_release import (assemble_release, build_release,
                               read_manifest, write_manifest,
                               write_packs_release, write_release)
from jobs.reshard_release import reshard_release
from jobs.validate_release import validate
from omnition_opentelemetry_service_spark import fixtures as fx

N = 1200
BUDGET = 512
ORDER_ROWS = ["shuffle_ord", "pack_key", "pack_id", "seq_no"]
ORDER_PACKS = ["shuffle_ord", "pack_key", "pack_id"]


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


def _global_order(spark, path, order, cols):
    return (spark.read.parquet(path).orderBy(*order)
            .select(*cols).toPandas())


def test_reshard_rows_revalidates_and_order_invariant(spark, tmp_path):
    src = _fresh(spark, tmp_path, "rows")
    want = _global_order(spark, src, ORDER_ROWS, ["doc_id", "seq_no"])
    for n in (8, 2):
        out = str(tmp_path / f"rows_{n}")
        meta = reshard_release(spark, src, out, n)
        assert meta["n_shards"] == n and meta["resharded_from"] == 4
        report = validate(spark, out)
        assert report["ok"], report
        got = _global_order(spark, out, ORDER_ROWS, ["doc_id", "seq_no"])
        assert got.equals(want), "global data order must survive resharding"
        # shard values actually rebucketed to the new modulus
        shards = {r.shard for r in
                  spark.read.parquet(out).select("shard").distinct().collect()}
        assert shards <= set(range(n))
        if n > 1:
            assert len(shards) > 1


def test_reshard_rows_content_identical(spark, tmp_path):
    src = _fresh(spark, tmp_path, "rows")
    out = str(tmp_path / "rows_16")
    reshard_release(spark, src, out, 16)
    a = (spark.read.parquet(src).drop("shard")
         .orderBy(*ORDER_ROWS).toPandas())
    b = (spark.read.parquet(out).drop("shard")
         .orderBy(*ORDER_ROWS).toPandas())
    assert list(a.columns) == list(b.columns)
    assert a.equals(b)


def test_reshard_packs_revalidates_and_atomic(spark, tmp_path):
    src = _fresh(spark, tmp_path, "packs")
    out = str(tmp_path / "packs_2")
    reshard_release(spark, src, out, 2)
    report = validate(spark, out)
    assert report["ok"], report
    df = spark.read.parquet(out)
    assert df.count() == spark.read.parquet(src).count()
    want = _global_order(spark, src, ORDER_PACKS,
                         ["pack_key", "pack_id", "pack_len"])
    got = _global_order(spark, out, ORDER_PACKS,
                        ["pack_key", "pack_id", "pack_len"])
    assert got.equals(want)


def test_reshard_rerun_byte_identical(spark, tmp_path):
    import pyarrow.parquet as pq

    src = _fresh(spark, tmp_path, "rows")
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        reshard_release(spark, src, out, 8)
        outs.append(out)

    def file_rows(base):
        rows = {}
        for f in sorted(glob.glob(f"{base}/split=*/shard=*/*.parquet")):
            key = "/".join(f[len(base):].split("/")[1:3])
            rows.setdefault(key, []).append(pq.read_table(f).to_pydict())
        return rows

    a, b = file_rows(outs[0]), file_rows(outs[1])
    assert a.keys() == b.keys() and len(a) > 0
    assert a == b


def test_reshard_manifest_provenance_chain(spark, tmp_path):
    src = _fresh(spark, tmp_path, "rows")
    out = str(tmp_path / "prov")
    reshard_release(spark, src, out, 8)
    src_meta, got = read_manifest(src), read_manifest(out)
    assert got["resharded_from"] == 4 and got["n_shards"] == 8
    assert got["reshard_history"] == [4]
    assert got["per_split"] == src_meta["per_split"]
    assert got["budget"] == src_meta["budget"]
    # chained reshard keeps the FULL chain, not just the immediate parent
    out2 = str(tmp_path / "prov2")
    reshard_release(spark, out, out2, 2)
    got2 = read_manifest(out2)
    assert got2["n_shards"] == 2 and got2["resharded_from"] == 8
    assert got2["reshard_history"] == [4, 8]
    assert validate(spark, out2)["ok"]
