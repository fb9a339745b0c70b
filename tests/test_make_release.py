"""The composed trainer-facing release job (jobs/make_release.py):
dedup → gate → split → epoch mix → pack → shard shuffle → write. The whole
chain must be a deterministic pure function of the input rows, and each
stage's contract must survive the composition."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from jobs.make_release import build_release, write_release  # noqa: E402
from omnition_opentelemetry_service_spark import fixtures as fx  # noqa: E402

N = 2000
WEIGHTS = {"web": 2.5, "code": 0.5}


def _release(spark):
    return build_release(fx.sequences(spark, N), budget=1024,
                         n_shards=8, epoch_weights=WEIGHTS)


def test_release_invariants(spark):
    rel = _release(spark).persist()
    rows = rel.count()
    assert rows > 0

    # no doc crosses splits
    assert rel.groupBy("doc_id").agg(
        F.countDistinct("split").alias("k")).filter("k > 1").count() == 0

    # epoch copies: contiguous 0..n-1 per (doc, split); web docs in train get
    # 2 or 3 copies (weight 2.5), code docs 0 or 1 (0.5), others exactly 1;
    # val/test are never resampled.
    per_doc = rel.groupBy("doc_id", "split", "source").agg(
        F.count(F.lit(1)).alias("n"), F.max("epoch").alias("mx"))
    assert per_doc.filter(F.col("mx") != F.col("n") - 1).count() == 0
    bad_web = per_doc.filter(
        (F.col("split") == "train") & (F.col("source") == "web")
        & ~F.col("n").isin(2, 3)).count()
    bad_other = per_doc.filter(
        (F.col("split") == "train")
        & ~F.col("source").isin("web", "code") & (F.col("n") != 1)).count()
    bad_eval = per_doc.filter(
        (F.col("split") != "train") & (F.col("n") != 1)).count()
    assert bad_web == 0 and bad_other == 0 and bad_eval == 0

    # resample rates converge near the weights (hash-uniformity sanity)
    web = per_doc.filter((F.col("split") == "train")
                         & (F.col("source") == "web"))
    mean_copies = web.agg(F.avg("n")).collect()[0][0]
    assert 2.3 < mean_copies < 2.7

    # packing: bins keyed within (split, source, epoch); every bin except a
    # group's last fills past the budget minus the largest sequence
    bins = rel.groupBy("split", "source", "epoch", "pack_id").agg(
        F.sum("n_tok").alias("fill"))
    w_last = bins.groupBy("split", "source", "epoch").agg(
        F.max("pack_id").alias("last_id"))
    nonlast = bins.join(w_last, ["split", "source", "epoch"]).filter(
        F.col("pack_id") != F.col("last_id"))
    max_tok = rel.agg(F.max("n_tok")).collect()[0][0]
    assert nonlast.filter(F.col("fill") < 1024 - max_tok).count() == 0
    # cumsum binning can overflow by at most one sequence
    assert bins.filter(F.col("fill") > 1024 + max_tok).count() == 0

    # shard assignment covers [0, n_shards) and the same (doc, epoch) copy
    # never duplicates within a shard
    shards = {r.shard for r in rel.select("shard").distinct().collect()}
    assert shards == set(range(8))
    assert rel.groupBy("doc_id", "epoch", "split").agg(
        F.count(F.lit(1)).alias("k")).filter("k > 1").count() == 0
    rel.unpersist()


def test_release_deterministic(spark):
    a = sorted(map(tuple, _release(spark).drop("tokens").collect()))
    b = sorted(map(tuple, _release(spark).drop("tokens").collect()))
    assert a == b and len(a) > 0


def test_span_gate_drops_duplicated_docs(spark):
    """Planted corpus: two docs share every 4-token window (boilerplate
    clones), one doc is unique — the gate must drop the clones and keep the
    unique doc. (The arithmetic fixture's windows are ~100% corpus-
    duplicated by construction, so the gate is exercised on planted data.)"""
    rows = [
        (0, [1, 2, 3, 4, 5], "web", 0),
        (1, [1, 2, 3, 4, 5], "web", 1),     # exact dup — dedup removes it
        (2, [1, 2, 3, 4, 5, 6], "web", 2),  # shares windows with 0 → gated
        (3, [9, 8, 7, 6, 5, 4], "code", 3), # unique windows → kept
    ]
    seqs = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string, seq_no long"
    ).withColumn("n_tok", F.size("tokens"))
    rel = build_release(seqs, budget=64, n_shards=2,
                        epoch_weights={}, max_dup_frac=0.5, span_k=4)
    kept = {r.doc_id for r in rel.select("doc_id").distinct().collect()}
    assert "3" in kept
    assert "1" not in kept          # exact-dedup victim
    assert "0" not in kept and "2" not in kept  # span-gate victims
    spark.catalog.clearCache()      # release the gate's persist (cache rule)


def test_release_write_layout(spark, tmp_path):
    out = str(tmp_path / "release")
    rel = _release(spark)
    write_release(rel, out, n_shards=8)
    back = spark.read.parquet(out)
    # partition columns round-trip; row set identical to the DataFrame
    assert {"split", "shard"} <= set(back.columns)
    assert back.count() == rel.count()
    # sequential-reader contract, file by file: sorted by the pack hash,
    # every pack a CONTIGUOUS run (pack-atomic sharding), rows inside a
    # pack in packing (seq_no) order
    import pyarrow.parquet as pq
    import glob
    files = sorted(glob.glob(f"{out}/split=*/shard=*/*.parquet"))
    assert files
    seen_packs_global = set()
    for f in files[:8]:
        t = pq.read_table(f, columns=["shuffle_ord", "pack_key", "pack_id",
                                      "seq_no"])
        ords = t["shuffle_ord"].to_pylist()
        assert ords == sorted(ords)
        packs = list(zip(t["pack_key"].to_pylist(), t["pack_id"].to_pylist()))
        seen, prev = set(), None
        for pk in packs:
            if pk != prev:
                assert pk not in seen  # contiguity: a pack never re-appears
                assert pk not in seen_packs_global  # never split across files
                seen.add(pk)
                prev = pk
        seen_packs_global |= seen
        # in-pack row order is the packing order
        by_pack = {}
        for pk, sq in zip(packs, t["seq_no"].to_pylist()):
            by_pack.setdefault(pk, []).append(sq)
        for sqs in by_pack.values():
            assert sqs == sorted(sqs)


def test_release_rerun_byte_identical(spark, tmp_path):
    """The reproducibility claim, verified at the FILE level: two
    materializations of the same release produce byte-identical parquet
    contents per (split, shard) — the sort is a total order, so not even
    tie order may drift between runs."""
    import glob
    import pyarrow.parquet as pq

    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        write_release(_release(spark), out, n_shards=4)
        outs.append(out)

    def file_rows(base):
        rows = {}
        for f in sorted(glob.glob(f"{base}/split=*/shard=*/*.parquet")):
            key = "/".join(f[len(base):].split("/")[1:3])  # split=?/shard=?
            t = pq.read_table(f).to_pydict()
            rows.setdefault(key, []).append(t)
        return rows

    a, b = file_rows(outs[0]), file_rows(outs[1])
    assert a.keys() == b.keys() and len(a) > 0
    assert a == b


def test_release_counters_ride_the_write(spark, tmp_path):
    """obsreport analog for the release: the StageCounters observations fill
    from the single write action (plus the one deliberate persist action
    when the gate is on) and reconcile exactly with the materialized rows."""
    from omnition_opentelemetry_service_spark.metrics import StageCounters

    seqs = fx.sequences(spark, 500)
    counters = StageCounters()
    rel = build_release(seqs, budget=1024, n_shards=4,
                        epoch_weights=WEIGHTS, counters=counters)
    out = str(tmp_path / "rel_counted")
    write_release(rel, out, n_shards=4)
    rows = {(r[0], r[1]): (r[2], r[3]) for r in counters.harvest()}

    n_in = 500
    n_out = spark.read.parquet(out).count()
    ded_recv, ded_drop = rows[("dedup_exact", "sequences")]
    assert ded_recv == n_in
    assert rows[("release_out", "rows")] == (n_out, 0)
    # dedup output + resampling reconcile: distinct (doc, epoch) copies in
    # the release == release_out received
    assert n_out > 0 and ded_drop >= 0


def test_release_counters_with_gate(spark, tmp_path):
    """Gate on: dedup counters fill from the persist-count action, the gate
    observation from the write; dropped == docs over the threshold."""
    from omnition_opentelemetry_service_spark.metrics import StageCounters

    rows = [
        (0, [1, 2, 3, 4, 5], "web", 0),
        (1, [1, 2, 3, 4, 5], "web", 1),      # exact dup
        (2, [1, 2, 3, 4, 5, 6], "web", 2),   # span-gated
        (3, [9, 8, 7, 6, 5, 4], "code", 3),
    ]
    seqs = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string, seq_no long"
    ).withColumn("n_tok", F.size("tokens"))
    counters = StageCounters()
    rel = build_release(seqs, budget=64, n_shards=2, epoch_weights={},
                        max_dup_frac=0.5, span_k=4, counters=counters)
    out = str(tmp_path / "rel_gated")
    write_release(rel, out, n_shards=2)
    got = {(r[0], r[1]): (r[2], r[3]) for r in counters.harvest()}
    assert got[("dedup_exact", "sequences")] == (4, 1)
    assert got[("span_gate", "k=4")] == (3, 2)   # docs 0 and 2 gated
    assert got[("release_out", "rows")][0] == spark.read.parquet(out).count()
    spark.catalog.clearCache()


def test_release_checkpoint_resume(spark, tmp_path):
    """The cleaned stage commits to a snapshot: a rerun under the same
    (input, gate) fingerprint reads it back — same release rows, restored
    counters, no new snapshot version; a changed gate fingerprint
    recomputes into a new version."""
    import os
    from omnition_opentelemetry_service_spark.metrics import StageCounters
    from omnition_opentelemetry_service_spark.sinks.snapshot import (
        SnapshotTable)

    rows = [
        (0, [1, 2, 3, 4, 5], "web", 0),
        (1, [1, 2, 3, 4, 5], "web", 1),      # exact dup
        (2, [1, 2, 3, 4, 5, 6], "web", 2),   # span-gated at 0.5
        (3, [9, 8, 7, 6, 5, 4], "code", 3),
    ]
    seqs = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string, seq_no long"
    ).withColumn("n_tok", F.size("tokens"))
    ckpt = str(tmp_path / "ckpt")

    def run(dup):
        c = StageCounters()
        rel = build_release(seqs, budget=64, n_shards=2, epoch_weights={},
                            max_dup_frac=dup, span_k=4, counters=c,
                            checkpoint_dir=ckpt, input_token="t")
        rows_out = sorted(map(tuple, rel.drop("tokens").collect()))
        c.harvest()
        return rows_out, c.rows

    first_rows, first_counters = run(0.5)
    snap = SnapshotTable(os.path.join(ckpt, "cleaned"))
    v1 = snap.current_version()
    assert v1 is not None

    second_rows, second_counters = run(0.5)   # resume: same fingerprint
    assert second_rows == first_rows
    assert snap.current_version() == v1       # no recompute, no new version
    # dedup/gate counters restored from the manifest on the resumed run
    assert [r for r in second_counters if r[0] == "dedup_exact"] == \
        [r for r in first_counters if r[0] == "dedup_exact"]
    assert [r for r in second_counters if r[0] == "span_gate"] == \
        [r for r in first_counters if r[0] == "span_gate"]

    third_rows, _ = run(0.99)                 # different gate → recompute
    assert snap.current_version() == v1 + 1
    assert third_rows != first_rows           # doc 2 survives the loose gate
    spark.catalog.clearCache()


def test_reader_sees_contiguous_packs_in_writer_order(spark, tmp_path):
    """Consumer-side contract: read_release_stream enumerates each shard in
    the written order — every (pack_key, pack_id) bin is one contiguous
    run of read_ord, rows inside a bin ascend by seq_no, and the bin order
    within a shard follows the shuffle hash."""
    from omnition_opentelemetry_service_spark import fixtures as fx
    from omnition_opentelemetry_service_spark.operators.mixture import (
        read_release_stream)
    from jobs.make_release import build_release, write_release

    seqs = fx.sequences(spark, 3000)
    out = str(tmp_path / "rel")
    write_release(build_release(seqs, budget=512, n_shards=4), out, 4)

    rows = read_release_stream(spark, out, split="train").collect()
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.read_ord)):
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for shard, rs in by_shard.items():
        # read_ord is dense 0..n-1
        assert [r.read_ord for r in rs] == list(range(len(rs)))
        seen_bins = []
        for r in rs:
            b = (r.pack_key, r.pack_id)
            if not seen_bins or seen_bins[-1] != b:
                assert b not in seen_bins, f"bin {b} split in shard {shard}"
                seen_bins.append(b)
        # within a bin, packing order (seq_no ascending)
        prev = None
        for r in rs:
            b = (r.pack_key, r.pack_id)
            if prev is not None and prev[0] == b:
                assert r.seq_no > prev[1], f"bin {b} out of packing order"
            prev = (b, r.seq_no)
    spark.catalog.clearCache()


def test_packs_emit_reconstructs_row_release(spark, tmp_path):
    """--emit packs invariants: every (pack_key, pack_id) of the row-level
    release appears exactly once; concatenated real tokens equal the pack's
    sequences flattened in seq_no order; split/shard/shuffle_ord carried
    constants match the row side; padding honors the budget; the writer
    lays out (split, shard) dirs and reruns are byte-identical."""
    import glob

    from jobs.make_release import assemble_release, write_packs_release

    budget = 1024
    rel = _release(spark).persist()
    packs = assemble_release(rel, budget=budget).persist()

    rows = rel.collect()
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault((r.pack_key, r.pack_id), []).append(r)
    got = {(p.pack_key, p.pack_id): p for p in packs.collect()}
    assert set(got) == set(by_pack)
    for k, members in by_pack.items():
        p = got[k]
        members.sort(key=lambda r: r.seq_no)
        flat = [t for m in members for t in m.tokens]
        assert p.padded_tokens[:p.pack_len] == flat
        assert p.doc_ids == [m.doc_id for m in members]
        assert len(p.padded_tokens) == max(budget, p.pack_len)
        # carried constants agree with every member row
        assert {m.split for m in members} == {p.split}
        assert {m.shard for m in members} == {p.shard}
        assert {m.shuffle_ord for m in members} == {p.shuffle_ord}

    out = str(tmp_path / "packs_rel")
    write_packs_release(packs, out, n_shards=8)
    assert glob.glob(f"{out}/split=*/shard=*/*.parquet")
    a = sorted(str(r) for r in spark.read.parquet(out).collect())
    write_packs_release(packs, out, n_shards=8)
    b = sorted(str(r) for r in spark.read.parquet(out).collect())
    assert a == b
    rel.unpersist()
    packs.unpersist()


def test_manifest_roundtrip(tmp_path):
    """write_manifest/read_manifest: underscore-named (parquet readers skip
    it), values survive, per-split totals intact."""
    from jobs.make_release import read_manifest, write_manifest

    out = str(tmp_path)
    meta = {"emit": "packs", "budget": 2048, "n_shards": 8,
            "epoch_weights": {"web": 2.5}, "max_dup_frac": None,
            "input": "n=1000",
            "per_split": {"train": [512, 260913]}, "counters": []}
    p = write_manifest(out, meta)
    assert p.endswith("/_MANIFEST.json")
    assert read_manifest(out) == meta


def test_packs_reader_order_matches_rows_reader(spark, tmp_path):
    """read_packs_release steps through the SAME pack sequence the
    row-level reader visits (first-occurrence order per shard), read_ord
    is dense per shard, and every train pack appears exactly once."""
    from jobs.make_release import (assemble_release, read_packs_release,
                                   write_packs_release)
    from omnition_opentelemetry_service_spark.operators.mixture import (
        read_release_stream)

    budget = 1024
    rel = _release(spark).persist()
    rows_out = str(tmp_path / "rows_rel")
    packs_out = str(tmp_path / "packs_rel")
    write_release(rel, rows_out, n_shards=4)
    write_packs_release(assemble_release(rel, budget), packs_out, n_shards=4)

    rows_order: dict = {}
    for r in read_release_stream(spark, rows_out).collect():
        rows_order.setdefault(r.shard, [])
        k = (r.pack_key, r.pack_id)
        if not rows_order[r.shard] or rows_order[r.shard][-1] != k:
            rows_order[r.shard].append(k)
    packs = read_packs_release(spark, packs_out).collect()
    packs_order: dict = {}
    for p in sorted(packs, key=lambda p: (p.shard, p.read_ord)):
        packs_order.setdefault(p.shard, []).append((p.pack_key, p.pack_id))
    assert packs_order == rows_order
    for shard, lst in packs_order.items():
        ords = sorted(p.read_ord for p in packs if p.shard == shard)
        assert ords == list(range(len(lst)))
        assert len(set(lst)) == len(lst)
    rel.unpersist()
