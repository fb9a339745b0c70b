"""spark-submit entrypoint for the trainer-facing RELEASE job: the
composed training-data tail that turns a cleaned token table into the thing
a trainer reads, end-to-end in one DAG:

    sequences (doc_id, tokens, n_tok, source, seq_no — unique row id)
      → exact token-array dedup         (md5 fingerprint, keep min seq_no)
      → span-duplication gate           (drop docs whose k-token windows are
                                         mostly corpus-duplicated — Lee-et-al
                                         substring-dedup signal, optional)
      → deterministic train/val/test    (mixture.with_split — md5-range,
                                         survives reruns & cluster resize)
      → per-source epoch weighting      (mixture.epoch_resample, train only)
      → fixed-budget packing            (packing.with_pack_id cumsum bins)
      → PACK-atomic hash-sharded shuffle (mixture.shuffle_shards keyed on
                                         the bin identity — bins stay whole)
      → ONE write partitioned by (split, shard); within each file, bins are
        contiguous in pseudo-random (hash) order, rows inside a bin in
        packing order — the stream a sequential trainer consumes.

Every stage is a deterministic pure function of row identity, so the whole
release is reproducible: re-running yields byte-identical shards (pinned in
tests/test_make_release.py). Shuffle inventory: dedup fingerprint groupBy,
pack-key exchange, final shard repartition — three exchanges total; gates,
split, and resample are map-side expressions.

Usage (sandbox; on a cluster, package with tools/package.sh and pass the
zip via --py-files exactly like jobs/run_pipeline.py):

    python jobs/make_release.py --n-rows 100000 --out /tmp/release \
        [--budget 2048] [--shards 64] [--epoch-weights web=2.0,code=0.5] \
        [--max-dup-frac 0.9] [--checkpoint-dir /tmp/release_ckpt] \
        [--parallelism 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_weights(s: str | None) -> dict[str, float]:
    if not s:
        return {}
    out = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise SystemExit(f"bad --epoch-weights entry: {part!r}")
        out[k] = float(v)
    return out


def build_release(seqs, budget: int = 2048, n_shards: int = 64,
                  epoch_weights: dict[str, float] | None = None,
                  max_dup_frac: float | None = None,
                  span_k: int = 8, counters=None,
                  checkpoint_dir: str | None = None,
                  input_token: str = ""):
    """The composed release DataFrame: (doc_id, tokens, n_tok, source,
    split, epoch, pack_id, shard, shuffle_ord). Pure function of the input
    rows — deterministic across runs, partitionings, and cluster sizes.
    The input must carry a UNIQUE ``seq_no`` per row (the Iceberg-supplied
    row id at scale): it is the dedup keeper tiebreak and the packing
    order; without uniqueness both become scheduling-dependent.

    The DAG is LINEAR (no union fork): the eval splits ride through the
    epoch-resample stage under a sentinel mix source with default weight 1,
    so the corpus upstream is scanned once, and the obsreport-style
    ``counters`` Observations (metrics.py) each sit on a node consumed
    exactly once — received/dropped ride the single write action with zero
    extra passes. The one exception: when the span gate is on, the deduped
    frame is persisted and counted (one extra action) because the gate's
    hot-set stats re-read it — that action also fills the input/dedup
    counters, keeping every Observation single-fire. The persist is
    CALLER-released (CLAUDE.md cache rule): main() and the tests
    clearCache after the consuming write.

    Shuffle/shard unit is the PACK, not the row: a trainer reads whole
    fixed-budget bins, so the shard hash keys on the pack identity — every
    bin lands contiguous in exactly one shard file (sorted by the bin's
    hash, then pack key, then seq_no), and the permutation the reader sees
    is a pseudo-random order over bins.

    ``checkpoint_dir`` commits the CLEANED stage (dedup + gate — the
    expensive half at 100 TB) to a SnapshotTable keyed by a fingerprint of
    (input_token, gate params): a rerun under the same fingerprint resumes
    from the snapshot (dedup/gate counters restored from the manifest, not
    recomputed); a changed gate or input recomputes into a new version —
    the same contract as run_pipeline's parsed/routed stages. Splitting/
    mixing/packing stay live: they're cheap expressions, and re-deriving
    them from the snapshot keeps weight or budget changes checkpoint-free."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from omnition_opentelemetry_service_spark.functions.tokens import (
        TOKEN_GROUP_NAMES, token_group_cols)
    from omnition_opentelemetry_service_spark.operators import corpus

    if "seq_no" not in seqs.columns:
        raise ValueError(
            "release input must carry a unique seq_no column (the row id "
            "that makes dedup keepers and packing order deterministic)")

    snap = clean_fp = None
    if checkpoint_dir:
        import hashlib
        import os

        from omnition_opentelemetry_service_spark.sinks.snapshot import (
            SnapshotTable)

        clean_fp = hashlib.md5(
            f"{input_token}|dup={max_dup_frac}|k={span_k}".encode()
        ).hexdigest()
        snap = SnapshotTable(os.path.join(checkpoint_dir, "cleaned"))
        manifest = snap.stage_manifest("cleaned", clean_fp)
        if manifest is not None:
            # version-pinned: CURRENT may have advanced past the matched
            # fingerprint (a concurrent run with other gate params)
            cleaned = snap.read(seqs.sparkSession, manifest["version"])
            if counters is not None:
                for row in manifest.get("counters", []):
                    counters.record(*row)
            return _mix_pack_shard(cleaned, budget, n_shards, epoch_weights,
                                   counters)

    # 1. exact token-array dedup: one keeper (min seq_no) per token array.
    #    Rank-within-group instead of groupBy+join-back: one exchange. The
    #    group key is the NATIVE array-hash composite (token_group_cols —
    #    xxhash64/murmur3/length, no per-token string materialization;
    #    2.9× the md5-of-canonical-string form, see its docstring).
    fp = seqs.select("*", *token_group_cols())
    w = Window.partitionBy(*TOKEN_GROUP_NAMES).orderBy("seq_no")
    ranked = fp.withColumn("_rk", F.row_number().over(w))
    if counters is not None:
        ranked = counters.observe_stage(
            ranked, "dedup_exact", "sequences",
            drop_predicate=F.col("_rk") > 1)
    deduped = ranked.filter(F.col("_rk") == 1).drop("_rk", *TOKEN_GROUP_NAMES)

    # 2. optional span-duplication gate (docs dominated by corpus-duplicated
    #    k-token windows are dropped; docs shorter than k have no windows
    #    and pass). The hot-set join is corpus.token_span_dedup_stats.
    if max_dup_frac is not None:
        # two consumers (stats subtree + main chain): persist and fill the
        # cache with ONE action so the dedup Observation fires exactly once
        deduped = deduped.persist()
        deduped.count()
        if counters is not None:
            counters.harvest()
        stats = corpus.token_span_dedup_stats(deduped, k=span_k, min_docs=2)
        bad = (stats.filter(F.col("dup_span_frac") > max_dup_frac)
               .select("doc_id").withColumn("_drop", F.lit(1)))
        # no broadcast hint: the drop-list is unbounded (a tight gate over a
        # duplicate-heavy corpus can flag most of it) — AQE broadcasts when
        # it fits and hash-joins when it doesn't
        gated = deduped.join(bad, "doc_id", "left")
        if counters is not None:
            gated = counters.observe_stage(
                gated, "span_gate", f"k={span_k}",
                drop_predicate=F.col("_drop").isNotNull())
        deduped = gated.filter(F.col("_drop").isNull()).drop("_drop")

    if snap is not None:
        # commit the cleaned stage: the snapshot write IS the action that
        # fills any pending observations; harvested counters ride in the
        # manifest so a resume restores them without recomputing
        fp_val = clean_fp
        m_new = snap.write(deduped, stage="cleaned",
                           meta=lambda: {"fingerprint": fp_val,
                                         "counters": (counters.harvest()
                                                      if counters else [])})
        deduped = snap.read(seqs.sparkSession, m_new["version"])

    return _mix_pack_shard(deduped, budget, n_shards, epoch_weights, counters)


def _mix_pack_shard(cleaned, budget: int, n_shards: int,
                    epoch_weights: dict[str, float] | None, counters):
    """Stages 3-6 over the cleaned corpus (live whether cleaned was just
    computed or read back from a checkpoint snapshot)."""
    from pyspark.sql import functions as F

    from omnition_opentelemetry_service_spark.operators import (
        mixture, packing)

    # 3. deterministic split; 4. train-only epoch weighting, linearly: eval
    #    rows take a sentinel mix source that falls to the default weight 1
    #    (resampling an eval set would double-count it) — no union, the
    #    upstream is scanned once.
    if epoch_weights and "__eval__" in epoch_weights:
        raise ValueError("'__eval__' is the reserved eval-split mix source")
    split = mixture.with_split(cleaned)
    keyed_src = split.withColumn(
        "_mix_src", F.when(F.col("split") == "train", F.col("source"))
        .otherwise(F.lit("__eval__")))
    mixed = mixture.epoch_resample(keyed_src, epoch_weights or {},
                                   source_col="_mix_src").drop("_mix_src")

    # 5. pack within (split, source, epoch) so one bin never mixes splits or
    #    epochs; epoch rides in the pack key via a composed column.
    keyed = mixed.withColumn(
        "pack_key", F.concat_ws("|", "split", "source",
                                 F.col("epoch").cast("string")))
    packed = packing.with_pack_id(keyed, budget=budget, key="pack_key",
                                  order="seq_no")

    # 6. shard assignment, PACK-atomic: hash the full pack identity so every
    #    bin lands whole in one shard, and an epoch's repeated docs still
    #    scatter (epoch is part of the pack key). shuffle_ord is the pack's
    #    hash — constant within a bin, so the in-file sort keeps bins
    #    contiguous; ties across bins break on the unique (pack_key,
    #    pack_id) and rows within a bin stay in packing order (seq_no).
    sharded = (mixture.shuffle_shards(
        packed.withColumn("_pid", F.concat_ws("#", "pack_key",
                                              F.col("pack_id").cast("string"))),
        n_shards=n_shards, id_col="_pid").drop("_pid"))
    if counters is not None:
        sharded = counters.observe_stage(sharded, "release_out", "rows")
    return sharded


def write_manifest(out_dir: str, meta: dict) -> str:
    """`_MANIFEST.json` inside the release dir — the reproducibility
    contract a consumer checks before training: emit mode, budget, shard
    count, mix weights, the input fingerprint the checkpoint keyed on, and
    the per-split row/token totals. Underscore-prefixed, so Spark's
    parquet reader treats it as metadata and never scans it."""
    import os

    path = os.path.join(out_dir, "_MANIFEST.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return path


def read_manifest(out_dir: str) -> dict:
    import os

    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        return json.load(f)


def assemble_release(rel, budget: int):
    """Trainer-ready emit mode: collapse the row-level release to one row
    per pack — concatenated padded tokens, per-doc-reset position ids, loss
    mask, boundary arrays. split/shard/shuffle_ord are constant within a
    pack (shard hashes the pack identity), so they ride the SAME aggregate
    via assemble_packs(carry=...) — no second exchange, no join-back. One
    (pack_key, pack_id) hash-agg with budget-bounded group state is the
    whole cost on top of the rows emit."""
    from omnition_opentelemetry_service_spark.operators import packing

    packs = packing.assemble_packs(
        rel, key="pack_key", order="seq_no",
        carry=("split", "shard", "shuffle_ord"))
    return packing.finalize_packs(packs, budget=budget)


def write_packs_release(df, out_dir: str, n_shards: int) -> None:
    """Pack-mode writer: same (split, shard) layout and total in-partition
    order as write_release, keyed at pack grain (pack identity is unique,
    so reruns stay byte-identical)."""
    from omnition_opentelemetry_service_spark.operators.mixture import (
        materialize_sharded)

    materialize_sharded(df, out_dir, n_shards,
                        partition_cols=("split", "shard"),
                        sort_cols=("shuffle_ord", "pack_key", "pack_id"))


def read_packs_release(spark, out_dir: str, split: str = "train"):
    """Consumer side of --emit packs: one row per pack in exactly the
    order a sequential trainer steps through them — shard by shard, within
    a shard by the writer's total order (pack hash, pack key, pack id).
    Same re-sort rationale as mixture.read_release_stream (parquet scan
    order is not guaranteed across row groups); read_ord is the trainer's
    step number, one pack per step."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir).filter(F.col("split") == split)
    w = W.partitionBy("shard").orderBy("shuffle_ord", "pack_key", "pack_id")
    return (df.withColumn("read_ord", F.row_number().over(w) - 1)
            .select("shard", "read_ord", "pack_key", "pack_id", "pack_len",
                    "n_pad", "doc_ids", "starts", "lens",
                    "padded_tokens", "position_ids", "loss_mask"))


def write_release(df, out_dir: str, n_shards: int) -> None:
    """ONE exchange on (split, shard); the in-partition sort is a TOTAL
    order (pack hash, then the unique pack key, then seq_no) so reruns
    produce byte-identical files and every pack is a contiguous run."""
    from omnition_opentelemetry_service_spark.operators.mixture import (
        materialize_sharded)

    materialize_sharded(df, out_dir, n_shards,
                        partition_cols=("split", "shard"),
                        sort_cols=("shuffle_ord", "pack_key", "pack_id",
                                   "seq_no"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rows", type=int, default=None,
                    help="synthesize this many sequences (fixtures.sequences)")
    ap.add_argument("--input-dir", default=None,
                    help="read <dir>/sequences parquet instead")
    ap.add_argument("--input-docs", default=None,
                    help="raw documents parquet (doc_id, text[, source]); "
                         "tokenized to the sequence shape via "
                         "operators/tokenize before the release")
    ap.add_argument("--bpe-merges", type=int, default=None,
                    help="with --input-docs: train a learned BPE of this "
                         "many merges on the input (operators/bpe) and "
                         "tokenize with it instead of the regex hash vocab")
    ap.add_argument("--unigram-vocab", type=int, default=None,
                    help="with --input-docs: train a unigram-LM tokenizer "
                         "of this piece-vocab size on the input "
                         "(operators/unigram) and tokenize with it")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--emit", choices=("rows", "packs"), default="rows",
                    help="rows: one row per sequence with pack ids "
                         "(default); packs: one row per pack — padded "
                         "tokens, position ids, loss mask, doc boundaries")
    ap.add_argument("--epoch-weights", default=None,
                    help="source=weight[,source=weight...] (train split only)")
    ap.add_argument("--max-dup-frac", type=float, default=None,
                    help="drop docs with > this fraction of corpus-duplicated "
                         "k-token windows (off when omitted)")
    ap.add_argument("--dsir-target", default=None,
                    help="with --input-docs: SQL predicate over the docs "
                         "selecting the DSIR target corpus (e.g. "
                         "\"lang = 'en'\"); the release keeps only the "
                         "--dsir-keep docs Gumbel-top-k-resampled by hashed "
                         "n-gram importance (operators/dsir)")
    ap.add_argument("--dsir-keep", type=int, default=None,
                    help="with --dsir-target: number of docs to keep")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="commit the cleaned (dedup+gate) stage to a "
                         "snapshot table; reruns under the same input/gate "
                         "fingerprint resume from it")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()
    n_inputs = sum(x is not None
                   for x in (args.n_rows, args.input_dir, args.input_docs))
    if n_inputs != 1:
        raise SystemExit(
            "exactly one of --n-rows / --input-dir / --input-docs is required")
    if args.bpe_merges is not None and args.input_docs is None:
        raise SystemExit("--bpe-merges requires --input-docs (it trains the "
                         "tokenizer on the raw text being ingested)")
    if args.unigram_vocab is not None and args.input_docs is None:
        raise SystemExit("--unigram-vocab requires --input-docs (it trains "
                         "the tokenizer on the raw text being ingested)")
    if args.unigram_vocab is not None and args.bpe_merges is not None:
        raise SystemExit("--bpe-merges and --unigram-vocab are exclusive "
                         "(one tokenizer per release)")
    if (args.dsir_target is None) != (args.dsir_keep is None):
        raise SystemExit("--dsir-target and --dsir-keep go together")
    if args.dsir_target is not None and args.input_docs is None:
        raise SystemExit("--dsir-target requires --input-docs (selection "
                         "runs on raw text before tokenization)")

    try:
        from omnition_opentelemetry_service_spark import fixtures
    except ModuleNotFoundError:
        import os

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark import fixtures
    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="omnition-release",
                      parallelism=args.parallelism)
    try:
        if args.n_rows is not None:
            seqs = fixtures.sequences(spark, args.n_rows)
            input_token = f"n={args.n_rows}"
        elif args.input_docs is not None:
            # raw-text ingest: tokenize to the sequence shape; NULL-text
            # docs have NULL tokens (the quarantine convention) and cannot
            # enter a release — drop them here, visibly.
            from pyspark.sql import functions as F

            from omnition_opentelemetry_service_spark.operators.tokenize import (
                tokenize_documents,
            )

            docs = spark.read.parquet(args.input_docs)
            if args.dsir_target is not None:
                # target-domain selection BEFORE tokenization: fit the
                # hashed n-gram importance ratio on (target slice, all),
                # keep the Gumbel-top-k. The selection params join the
                # checkpoint fingerprint via input_token below, so a rerun
                # with a different target/keep never resumes a stale
                # cleaned stage.
                from omnition_opentelemetry_service_spark.operators import (
                    dsir as dsir_mod,
                )

                lam, lam0 = dsir_mod.dsir_fit(
                    docs.filter(args.dsir_target), docs)
                sel = dsir_mod.dsir_resample(
                    docs, lam, lam0, k=args.dsir_keep, seed="release-dsir")
                docs = docs.join(sel.select("doc_id"), "doc_id", "leftsemi")
            if args.bpe_merges is not None:
                from omnition_opentelemetry_service_spark.operators import (
                    bpe,
                )

                merges = bpe.train_bpe(docs, n_merges=args.bpe_merges)
                tokenized = bpe.tokenize_documents_bpe(docs, merges)
                input_token = (f"docs={args.input_docs}"
                               f"|bpe={args.bpe_merges}")
            elif args.unigram_vocab is not None:
                from omnition_opentelemetry_service_spark.operators import (
                    unigram,
                )

                model = unigram.train_unigram(
                    docs, vocab_size=args.unigram_vocab)
                tokenized = unigram.tokenize_documents_unigram(docs, model)
                input_token = (f"docs={args.input_docs}"
                               f"|unigram={args.unigram_vocab}")
            else:
                tokenized = tokenize_documents(docs)
                input_token = f"docs={args.input_docs}"
            if args.dsir_target is not None:
                input_token += f"|dsir={args.dsir_target}/{args.dsir_keep}"
            seqs = (tokenized
                    .filter(F.col("tokens").isNotNull())
                    .withColumn("seq_no", F.col("doc_id")))
        else:
            seqs = spark.read.parquet(f"{args.input_dir}/sequences")
            input_token = f"dir={args.input_dir}"
        from omnition_opentelemetry_service_spark.metrics import StageCounters
        counters = StageCounters()
        t0 = time.perf_counter()
        rel = build_release(seqs, budget=args.budget,
                            n_shards=args.shards,
                            epoch_weights=parse_weights(args.epoch_weights),
                            max_dup_frac=args.max_dup_frac,
                            counters=counters,
                            checkpoint_dir=args.checkpoint_dir,
                            input_token=input_token)
        if args.emit == "packs":
            write_packs_release(assemble_release(rel, args.budget),
                                args.out, args.shards)
        else:
            write_release(rel, args.out, args.shards)
        counters.harvest()
        spark.catalog.clearCache()  # release the gate's persist (cache rule)
        out = spark.read.parquet(args.out)
        from pyspark.sql import functions as F
        tok_col = "pack_len" if args.emit == "packs" else "n_tok"
        per_split = {r["split"]: (r["rows"], r["toks"]) for r in
                     out.groupBy("split").agg(
                         F.count(F.lit(1)).alias("rows"),
                         F.sum(tok_col).alias("toks")).collect()}
        summary = {
            "out": args.out,
            "wall_s": round(time.perf_counter() - t0, 2),
            "per_split": per_split,
            "counters": [list(r) for r in counters.rows],
        }
        write_manifest(args.out, {
            "emit": args.emit,
            "budget": args.budget,
            "n_shards": args.shards,
            "epoch_weights": parse_weights(args.epoch_weights),
            "max_dup_frac": args.max_dup_frac,
            "input": input_token,
            "per_split": per_split,
            "counters": [list(r) for r in counters.rows],
        })
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
