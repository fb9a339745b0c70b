"""Deduplication operators for the training-data pipeline.

Not present in the reference (its pipeline is lossless-forwarding plus
sampling); these are the first-class training-data ops the rebuild adds:

- exact dedup          — normalized-fingerprint hash groupBy
- MinHash + LSH        — shingle → minhash signature → band bucketing →
                         candidate pairs → exact-jaccard verify
- n-gram Jaccard       — exact pairwise similarity on a bounded subset
- SimHash              — 60-bit sign-sum fingerprint over word hashes
- embedding near-dup   — cosine-threshold pairs (see similarity.py for ANN)

Scale design: everything is expression-level (whole-stage codegen, no Python).
MinHash/LSH is the 100 TB path: signatures are one scan, candidates come from
an equi-join on band keys (shuffle on band_key, cardinality ≈ docs × bands),
and the quadratic jaccard verify runs only on candidate pairs. The all-pairs
operators deliberately take an ``id_limit`` and exist for verification only.

Determinism/parity: shingle hashing goes through md5 (identical across
engines); the permutation family is (a_j·x + b_j) mod P with a_j,b_j < 2^29
and x < 2^32 so every product stays < 2^61 (no int64 overflow in either
engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_shingles, fingerprint
from .widen import materialize, widen_if_narrow

# MinHash family constants (shared with the DuckDB oracle fragments).
MH_HASHES = 16
MH_PRIME = 4294967311  # smallest prime > 2^32
MH_MODA = 536870909  # prime < 2^29 keeps a_j*x < 2^61
MH_A_MUL, MH_A_ADD = 40503, 12345
MH_B_MUL, MH_B_ADD = 104729, 104723
LSH_BANDS = 4
LSH_ROWS = MH_HASHES // LSH_BANDS

# x(s): first 8 md5 hex chars → uint32. Spark `conv` / DuckDB '0x' cast.
_XH_SPARK = "CAST(conv(substring(md5({s}), 1, 8), 16, 10) AS BIGINT)"
_XH_DUCK = "CAST(concat('0x', substr(md5({s}), 1, 8)) AS BIGINT)"
# 12-hex (48-bit) widening for ID use: at 10^6 keys the 32-bit prefix
# expects ~100 birthday collisions (cardinality divergence in any twin
# that GROUPs BY the id), 48-bit expects ~0.004 — use THIS pair whenever
# the hash is an identity rather than a bucketing key.
_XH12_SPARK = "CAST(conv(substring(md5({s}), 1, 12), 16, 10) AS BIGINT)"
_XH12_DUCK = "CAST(concat('0x', substr(md5({s}), 1, 12)) AS BIGINT)"


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by normalized fingerprint; keep the smallest id per group.

    Shape at scale: ONE exchange keyed on the fingerprint with map-side
    partial min/count — the corpus never joins itself and no keeper join
    exists (consumers semi-join the keep_id list, which is
    group-bounded). Reference analog: none (the collector forwards spans;
    dedup is the training-data layer's addition)."""
    return (
        docs.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_cnt"))
    )


def minhash_signature_expr(shingles_col: str = "shingles") -> F.Column:
    """array<bigint> of MH_HASHES minhash values, fully JVM-side.

    Shape matters for cost: the md5 base hash is computed ONCE per shingle
    (the `transform` is the aggregate's input, evaluated a single time), and
    the MH_HASHES affine permutations fold over those precomputed hashes as a
    running elementwise minimum. The naive `transform(seq, j ->
    array_min(...md5...))` form re-hashes every shingle per permutation —
    16× the md5 work. Values are identical:
    min_j = min over shingles of (a_j·x(s) + b_j) mod P."""
    a = f"CAST((j * {MH_A_MUL} + {MH_A_ADD}) % {MH_MODA} AS BIGINT)"
    b = f"CAST((j * {MH_B_MUL} + {MH_B_ADD}) % {MH_MODA} AS BIGINT)"
    xh = _XH_SPARK.format(s="s")
    hashes = f"transform({shingles_col}, s -> {xh})"
    init = f"transform(sequence(0, {MH_HASHES - 1}), j -> CAST({MH_PRIME} AS BIGINT))"
    perms = f"transform(sequence(0, {MH_HASHES - 1}), j -> ({a} * x + {b}) % {MH_PRIME})"
    return F.expr(
        f"aggregate({hashes}, {init}, "
        f"(acc, x) -> zip_with(acc, {perms}, (m, v) -> least(m, v)))"
    )


def minhash_signature_sql_duck(shingles_sql: str) -> str:
    a = f"CAST((j * {MH_A_MUL} + {MH_A_ADD}) % {MH_MODA} AS BIGINT)"
    b = f"CAST((j * {MH_B_MUL} + {MH_B_ADD}) % {MH_MODA} AS BIGINT)"
    xh = _XH_DUCK.format(s="s")
    return (
        f"list_transform(range({MH_HASHES}), j -> "
        f"list_min(list_transform({shingles_sql}, s -> ({a} * {xh} + {b}) % {MH_PRIME})))"
    )


def with_minhash(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Attach (shingles, minhash) — pure per-row projection: rides the
    scan, zero shuffle; the downstream band explode + equi-join is where
    the exchange happens (minhash_candidates)."""
    return (
        docs.withColumn("shingles", char_shingles(text_col, k))
        .withColumn("minhash", minhash_signature_expr("shingles"))
    )


def minhash_signatures_grouped(docs_with_shingles: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """(id, minhash array<bigint>) via explode + 16 codegen'd min()
    aggregates — the FAST signature path.

    The per-row fold (minhash_signature_expr) runs Catalyst's higher-order
    functions (aggregate/zip_with), which are INTERPRETED expression eval —
    measured 4.4s warm at sf0.1 vs 1.7s for this exploded form (identical
    values; both pay the same md5 per shingle, the 2.6× is pure lambda-
    interpreter overhead). Shape at scale: explode is a flatMap; exploded
    rows for one doc are partition-local, so the partial aggregate
    collapses to one 16-long row per doc BEFORE the exchange — shuffle
    volume is #docs × 16 longs regardless of shingle count. The fold form
    stays as the no-shuffle option for pipelines that must keep signatures
    inline with other per-row columns.
    """
    ex = docs_with_shingles.select(
        F.col(id_col).alias("id"), F.explode("shingles").alias("s"))
    xh = F.expr(_XH_SPARK.format(s="s"))
    aggs = []
    for j in range(MH_HASHES):
        a = (j * MH_A_MUL + MH_A_ADD) % MH_MODA
        b = (j * MH_B_MUL + MH_B_ADD) % MH_MODA
        aggs.append(
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % MH_PRIME).alias(f"m{j}"))
    sig = ex.withColumn("x", xh).groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"m{j}") for j in range(MH_HASHES)])
        .alias("minhash"))


def minhash_signatures_pandas(docs_with_shingles: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """(id, minhash array<bigint>) via mapInPandas — the ZERO-SHUFFLE
    signature path: each Arrow batch hashes every DISTINCT shingle once
    (memoized per task — shingles repeat heavily across documents) and
    computes all 16 affine permutations as one S×16 numpy broadcast, then a
    column-min. Value-identical to minhash_signatures_grouped (pytest- and
    hypothesis-pinned): same md5-prefix base hash, same (a·x+b) mod P
    family; a<2^29, x<2^32 keeps every product <2^61 — exact in int64, no
    wraparound in either engine.

    Shape at scale: where the grouped form explodes to #shingles rows and
    exchanges 16 partial mins per doc, this is a stateless one-pass map —
    no exchange at all; the shingle table flows in as Arrow batches. Docs
    with ZERO shingles are dropped (grouped-form semantics: an empty
    explode has no group; emitting the identity signature instead would
    band all empty docs into one giant LSH bucket)."""
    import hashlib

    import numpy as np
    import pandas as pd

    a_vec = np.array([(j * MH_A_MUL + MH_A_ADD) % MH_MODA
                      for j in range(MH_HASHES)], dtype=np.int64)
    b_vec = np.array([(j * MH_B_MUL + MH_B_ADD) % MH_MODA
                      for j in range(MH_HASHES)], dtype=np.int64)

    def compute(batches):
        # Python touches each DISTINCT shingle once (md5, memoized across
        # batches); everything per-OCCURRENCE is numpy. factorize maps the
        # batch's flattened shingles to unique codes, the affine permutes
        # run as 16 vectorized passes over the code-indexed hash vector,
        # and minimum.reduceat takes the per-document segment min (zero-
        # shingle docs are dropped FIRST — reduceat misreads empty
        # segments, and the grouped-form semantics drop them anyway).
        # Measured 0.94 s -> ~0.2 s at sf0.1 (VERDICT r3 ask #3): the old
        # per-shingle dict-lookup loop ran ~7M Python iterations per SF.
        memo: dict[str, int] = {}
        for pdf in batches:
            lens = np.array([0 if s is None else len(s)
                             for s in pdf["shingles"]], dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                yield pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                    "minhash": pd.Series([], dtype="object")})
                continue
            ids = pdf[id_col].to_numpy()[keep]
            flat = np.concatenate(
                [np.asarray(s, dtype=object)
                 for s, k in zip(pdf["shingles"], keep) if k])
            codes, uniques = pd.factorize(flat)
            uh = np.empty(len(uniques), dtype=np.int64)
            for i, s in enumerate(uniques):
                h = memo.get(s)
                if h is None:
                    if len(memo) > 4_000_000:
                        memo.clear()
                    h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                    memo[s] = h
                uh[i] = h
            xs = uh[codes]
            seg = lens[keep]
            starts = np.zeros(len(seg), dtype=np.int64)
            np.cumsum(seg[:-1], out=starts[1:])
            sig = np.empty((len(seg), MH_HASHES), dtype=np.int64)
            for j in range(MH_HASHES):
                # a<2^29, x<2^32: products stay <2^61 — exact in int64
                sig[:, j] = np.minimum.reduceat(
                    (xs * int(a_vec[j]) + int(b_vec[j])) % MH_PRIME, starts)
            yield pd.DataFrame({"id": ids, "minhash": list(sig)})

    src = widen_if_narrow(
        docs_with_shingles.select(F.col(id_col).alias(id_col), "shingles"))
    return src.mapInPandas(compute, "id long, minhash array<bigint>")


def lsh_band_keys_expr(sig_col: str = "minhash") -> F.Column:
    """array<string> of LSH_BANDS band keys: 'b:v,v,v,v'."""
    return F.expr(
        f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
        f"concat(CAST(b AS STRING), ':', "
        f"array_join(transform(slice({sig_col}, b * {LSH_ROWS} + 1, {LSH_ROWS}), "
        f"v -> CAST(v AS STRING)), ',')))"
    )


def minhash_candidates(docs_with_sig: DataFrame, id_col: str = "doc_id",
                       max_bucket: int | None = None) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket.

    Shape at scale: explode to (id, band_key) then equi-join on band_key —
    a plain shuffle hash join; no cross product ever materializes.

    ``max_bucket`` is the band-bucket SKEW CAP: buckets with more than
    ``max_bucket`` members are excluded from pair generation. A bucket of
    m members emits C(m,2) pairs, so candidate volume is dominated by the
    bucket-size tail, not the corpus size — measured on the sf1 scale
    probe: a 10× corpus produced 47× candidates (19,326 → 906,248), with
    per-copy counts swinging 5.7k→401k on identical pairwise-jaccard data
    purely from re-rolled hash draws landing one large sub-threshold
    family in one bucket (BENCH_details_r05 sf1 notes). At 10^12 docs an
    uncapped giant bucket is a job-killing quadratic; with the cap,
    candidate volume is ≤ max_bucket × corpus_bands — linear in the
    corpus. Recall cost is bounded and measured: a true near-dup pair in
    a capped bucket is still found through any of its other
    LSH_BANDS-1 bands (planted-pair floors in
    tests/test_minhash_quality.py hold under the cap); on the sf1 probe
    max_bucket=64 kept 2772/3023 (91.7%) of verified j≥0.3 pairs while
    the runtime ratio collapsed 14.8× → 3.1× — the lost tail is
    low-jaccard pairs whose per-band capture is ~1-2% anyway. Default
    None keeps the exact uncapped semantics (the driver-slot twins)."""
    # Persist the signatures BEFORE deriving band keys: projection collapse
    # would otherwise inline the md5-aggregate into the per-band transform
    # (4× the hashing) and again into each side of the self-join. The cache
    # is a hard barrier; at 100 TB this materialization is the signatures
    # table every LSH pipeline writes before bucketing anyway. Cache
    # lifecycle is CALLER-owned (the operator cannot know when the action
    # has run): release via registry.release_caches / clearCache after
    # consuming the result — bench and the oracle harness do.
    sigs = materialize(
        docs_with_sig.select(F.col(id_col).alias("id"), "minhash"))
    keyed = sigs.select(
        "id", F.explode(lsh_band_keys_expr()).alias("band_key")
    )
    if max_bucket is not None:
        # one extra hash-agg on the SAME key the pair join shuffles on
        # (map-side combinable, no new shuffle key); the inner join keeps
        # only rows of small-enough buckets
        sizes = (keyed.groupBy("band_key")
                 .agg(F.count(F.lit(1)).alias("_bsz"))
                 .filter(F.col("_bsz") <= int(max_bucket)).drop("_bsz"))
        keyed = keyed.join(sizes, "band_key")
    left = keyed.alias("l")
    right = keyed.alias("r")
    return (
        left.join(right, (F.col("l.band_key") == F.col("r.band_key"))
                  & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(candidates: DataFrame, docs_with_shingles: DataFrame,
                   id_col: str = "doc_id", threshold: float = 0.5) -> DataFrame:
    """Exact jaccard on candidate pairs only (the cheap post-LSH filter).

    The shingle table joins twice (id_a side, id_b side) — persist it so
    the shingling expression runs once, not once per side. When the CALLER
    already persisted the shingle frame (corpus_filter_full,
    split_leakage_pairs, the capture curve), skip re-materializing: a
    second block-manager copy of a corpus-sized table plus an extra eager
    count buys nothing (the projection below is cheap atop the cached
    parent)."""
    proj = docs_with_shingles.select(F.col(id_col).alias("id"), "shingles")
    sh = (proj if docs_with_shingles.storageLevel.useMemory
          else materialize(proj))
    j = (
        candidates
        .join(sh.withColumnRenamed("shingles", "sh_a"), F.col("id_a") == F.col("id"))
        .drop("id")
        .join(sh.withColumnRenamed("shingles", "sh_b"), F.col("id_b") == F.col("id"))
        .drop("id")
        .withColumn(
            # |A∪B| = |A|+|B|−|A∩B| (shingle arrays are distinct by
            # construction): one hash-set pass per pair instead of two —
            # array_union would materialize a second ~|A|+|B| array per
            # pair just to take its size. Measured ~15% off the verify
            # stage at sf0.1; values identical.
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / (F.size("sh_a") + F.size("sh_b")
                   - F.size(F.array_intersect("sh_a", "sh_b"))), 6),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def split_leakage_pairs(docs: DataFrame, threshold: float = 0.3,
                        weights: dict[str, float] | None = None,
                        salt: str = "split",
                        id_col: str = "doc_id") -> DataFrame:
    """Cross-split decontamination report: near-duplicate document pairs
    whose endpoints fall in DIFFERENT release splits — a train doc that is
    a near-dup of a val/test doc leaks evaluation signal (the reason
    GPT-3-style pipelines decontaminate eval sets against train). Exact
    duplicates are a degenerate case (jaccard 1.0), so this subsumes the
    exact-leakage check.

    Composition, nothing new to trust: minhash band candidates →
    exact-jaccard verify (the shipped near-dup scale path: band equi-joins
    only, no cross product), then split labels as PROJECTIONS of the id
    hash (mixture.split_expr — with_split is id-deterministic by design),
    so no join against a corpus-sized split table is ever added. Caller
    owns the shingle persist (cache rule), released via the shared
    registry.release_caches path.
    """
    from .mixture import split_expr

    sh = docs.select(F.col(id_col).alias("doc_id"),
                     char_shingles("text").alias("shingles")).persist()
    cands = minhash_candidates(minhash_signatures_pandas(sh), id_col="id")
    ver = jaccard_verify(cands, sh, threshold=threshold)
    return (ver.select(
        "id_a", "id_b", "jaccard",
        split_expr("id_a", weights, salt).alias("split_a"),
        split_expr("id_b", weights, salt).alias("split_b"))
        .filter(F.col("split_a") != F.col("split_b")))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        id_limit: int = 200, threshold: float = 0.2) -> DataFrame:
    """Exact all-pairs n-gram jaccard on a bounded id range (verification/
    small-table op; the scale path is minhash_candidates + jaccard_verify)."""
    sub = (docs.filter(F.col(id_col) < id_limit)
           .select(F.col(id_col).alias("id"), char_shingles(text_col, k).alias("sh")))
    a, b = sub.alias("a"), sub.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -- SimHash -------------------------------------------------------------------
SIMHASH_BITS = 60  # 15 md5 hex chars → < 2^60, stays positive in int64


def simhash_expr(text_col: str = "text") -> F.Column:
    """60-bit SimHash over whitespace words, JVM-side: per-word 60-bit hash
    (md5-derived), per-bit ±1 vote aggregate, sign → bit, pack to bigint.

    The word→hash map runs ONCE per word (transform as the aggregate input);
    the 60 per-bit votes then shift the precomputed hash — not re-md5 it
    (hashing inside the per-bit transform would cost 60× the md5 work).

    Measured alternative (rejected): explode words → 60 conditional-sum
    groupBy agg is fully codegen'd but 6× SLOWER (36s vs 5.9s on 5k docs,
    sf0.1) — 61 aggregation buffers over the exploded row count plus the
    group-by exchange cost far more than interpreting the fold per doc."""
    from ..functions.text import WS_SQL_SPARK, lower_fold_sql_spark
    words = (f"filter(split({lower_fold_sql_spark(f'trim({text_col})')}, "
             f"'{WS_SQL_SPARK}'), w -> length(w) > 0)")
    whs = (f"transform({words}, "
           f"w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT))")
    votes = (
        f"aggregate({whs}, "
        f"transform(sequence(0, {SIMHASH_BITS - 1}), b -> CAST(0 AS BIGINT)), "
        f"(acc, h) -> zip_with(acc, "
        f"transform(sequence(0, {SIMHASH_BITS - 1}), b -> (shiftright(h, b) & 1) * 2 - 1), "
        f"(a, v) -> a + v))"
    )
    pack = (
        f"aggregate(zip_with({votes}, sequence(0, {SIMHASH_BITS - 1}), "
        f"(v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return F.expr(pack)


def simhash_signatures_pandas(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """(id, sh) SimHash signatures via mapInPandas — the FAST signature
    path: per Arrow batch, one md5 per DISTINCT word (memoized across the
    task's batches; web corpora repeat words heavily), then the 60 bit
    votes as two numpy ops over a W×60 bit matrix. Bit-identical to
    simhash_expr (pytest-pinned) — same md5-prefix word hash, same vote
    rule — but ~4× faster warm at sf0.1: the Catalyst fold interprets its
    per-word lambda and allocates two 60-long arrays per word, while here
    the vote loop is SIMD over the whole batch. Shape at scale: stateless
    one-pass map, no shuffle; the memo is capped so a huge per-task
    vocabulary cannot grow the Python heap unboundedly."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    from ..functions.text import lower_fold_py

    bits = SIMHASH_BITS
    # Replicate the JVM tokenization EXACTLY, not idiomatically: Spark's
    # trim() strips only 0x20 spaces and Java '\s' is the ASCII class
    # [ \t\n\x0B\f\r], while Python strip()/split() treat ALL Unicode
    # whitespace as separators — on text containing U+00A0/U+2028/etc the
    # idiomatic form silently diverges from simhash_expr.
    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def compute(batches):
        shifts = np.arange(bits, dtype=np.uint64)
        memo: dict[str, int] = {}
        for pdf in batches:
            out: list[int | None] = []
            for t in pdf[text_col].to_numpy():
                if t is None:  # NULL text → NULL signature, the expression
                    out.append(None)  # twin's null-propagation semantics
                    continue
                # lower_fold_py = .lower() (matches Java SpecialCasing +
                # final sigma) + the Unicode-skew table + ς→σ — the ONE
                # Python twin of the JVM-side fold (functions.text).
                ws = [w for w in ascii_ws.split(
                    lower_fold_py(t.strip(" "))) if w]
                hs = []
                for w in ws:
                    h = memo.get(w)
                    if h is None:
                        if len(memo) > 2_000_000:
                            memo.clear()
                        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
                        memo[w] = h
                    hs.append(h)
                ha = np.array(hs, dtype=np.uint64)
                bm = ((ha[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                votes = bm.sum(axis=0) * 2 - len(ws)
                out.append(int(((votes > 0).astype(np.uint64) << shifts).sum()))
            yield pd.DataFrame({"id": pdf[id_col],
                                "sh": pd.array(out, dtype="Int64")})

    src = widen_if_narrow(docs.select(id_col, text_col))
    return src.mapInPandas(compute, "id long, sh long")


SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15


def simhash_band_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = SIMHASH_BANDS - 1,
                       sig_impl: str = "pandas") -> DataFrame:
    """SimHash near-dup pairs, the 100 TB path: split the 60-bit fingerprint
    into 4 bands of 15 bits, explode to (id, band_idx, band_value), equi-join
    on the band key, then verify exact hamming on the candidates.

    Recall contract (pigeonhole): any pair with hamming ≤ BANDS−1 (= 3)
    differs in at most 3 bands, so at least one band matches exactly — those
    pairs are found with CERTAINTY. Pairs at larger hamming are found iff
    they happen to share a band; for a wider radius, raise the band count.
    No cross product ever forms: the join is a plain shuffle hash join on
    (band_idx, band_value), candidate cardinality ≈ docs × bands.

    The signature table is persisted before banding — without the barrier,
    projection collapse inlines the 60-vote md5 aggregate into the explode
    AND into each join side (≫4× the hashing); it is also the signatures
    table any production simhash pipeline materializes before bucketing.
    Caller owns cache lifecycle (registry.release_caches / clearCache).

    ``sig_impl``: 'pandas' (default — simhash_signatures_pandas, the ~4×
    faster memoized numpy path) or 'expr' (the pure-JVM fold; bit-identical
    values, pytest-pinned)."""
    if sig_impl == "pandas":
        sh = materialize(simhash_signatures_pandas(docs, id_col, text_col))
    else:
        sh = materialize(docs.select(
            F.col(id_col).alias("id"), simhash_expr(text_col).alias("sh")))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    banded = sh.select(
        "id", "sh",
        F.explode(F.expr(
            f"transform(sequence(0, {SIMHASH_BANDS - 1}), "
            f"b -> named_struct("
            f"'band', b, 'val', shiftright(sh, b * {SIMHASH_BAND_BITS}) & {mask}))"
        )).alias("bv"),
    ).select("id", "sh", F.col("bv.band").alias("band"),
             F.col("bv.val").alias("val"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.expr("a.sh ^ b.sh")).alias("hamming"))
        .distinct()  # a pair sharing 2 bands must count once
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def simhash_hamming_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", max_hamming: int = 20,
                          id_limit: int = 200) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance on a bounded subset (the
    exact verification op; simhash_band_pairs is the banded scale path)."""
    sub = (docs.filter(F.col(id_col) < id_limit)
           .select(F.col(id_col).alias("id"), simhash_expr(text_col).alias("sh")))
    a, b = sub.alias("a"), sub.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.bit_count(F.expr("a.sh ^ b.sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# -- token-sequence near-dup (the north-star table's MinHash) ------------------
def with_seq_minhash(seqs: DataFrame, k: int = 8, id_col: str = "doc_id",
                     tokens_col: str = "tokens") -> DataFrame:
    """(…, shingles, minhash) over TOKEN k-gram shingles — the sequence-
    table twin of with_minhash: the same md5/affine MinHash family applied
    to k-token window keys (corpus._token_grams_expr — the span-dedup
    identity), so near-duplicate SEQUENCES (pre-tokenized docs differing by
    small edits) band together exactly like near-duplicate texts.

    Sequences shorter than k have NO window identity (empty shingles) and
    are EXCLUDED here rather than signed: an empty shingle set folds to the
    all-sentinel signature, which would band every short sequence with
    every other short sequence — a quadratic candidate explosion over the
    short tail. Exact dedup (token_group_cols) already covers them."""
    from .corpus import _token_grams_expr

    out = seqs.withColumn(
        "shingles",
        F.expr(f"array_distinct({_token_grams_expr(k, tokens_col)})"))
    return (out.filter(F.size("shingles") > 0)
            .withColumn("minhash", minhash_signature_expr("shingles")))


def seq_near_dup_verified(seqs: DataFrame, k: int = 8,
                          threshold: float = 0.5, id_col: str = "doc_id",
                          tokens_col: str = "tokens") -> DataFrame:
    """(id_a, id_b, jaccard) — banded candidates over token-shingle MinHash,
    exact-Jaccard verified. Same scale shape as the text path: band-key
    equi-join, never all-pairs; the shingle table persists once and feeds
    both the signature map and the verify join (caller releases, per the
    cache rule)."""
    sh = materialize(with_seq_minhash(seqs, k, id_col, tokens_col).select(
        F.col(id_col), "shingles", "minhash"))
    cands = minhash_candidates(sh, id_col=id_col)
    return jaccard_verify(cands, sh.select(id_col, "shingles"),
                          id_col=id_col, threshold=threshold)


def seq_near_dup_sql_duck(k: int = 8, threshold: float = 0.5,
                          rel: str = "seq", id_col: str = "doc_id",
                          tokens_col: str = "tokens") -> str:
    """DuckDB twin: same token-gram shingles, same MinHash family, same
    banding and exact-Jaccard verify."""
    from .corpus import _token_grams_sql_duck

    sh = (f"list_distinct({_token_grams_sql_duck(k, tokens_col)})")
    mh = minhash_signature_sql_duck("shingles")
    return f"""
    WITH sh AS (
      SELECT {id_col} AS id, {sh} AS shingles FROM {rel}),
    sig AS (
      SELECT id, shingles, {mh} AS minhash
      FROM sh WHERE len(shingles) > 0),
    bands AS (
      SELECT id, concat(CAST(b AS VARCHAR), ':',
             array_to_string(minhash[b * {LSH_ROWS} + 1 :
                             b * {LSH_ROWS} + {LSH_ROWS}], ',')) AS band_key
      FROM sig, (SELECT unnest(range({LSH_BANDS})) AS b)),
    cand AS (
      SELECT DISTINCT l.id AS id_a, r.id AS id_b
      FROM bands l JOIN bands r
        ON l.band_key = r.band_key AND l.id < r.id)
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                 len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
    FROM cand c JOIN sh a ON c.id_a = a.id JOIN sh b ON c.id_b = b.id
    WHERE round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                len(list_distinct(a.shingles || b.shingles)), 6)
          >= {threshold}"""


# -- MinHash quality contract ---------------------------------------------------
def planted_jaccard_rows(pairs_per_decile: int = 50,
                         deciles: tuple = tuple(range(3, 10)),
                         doc_len: int = 200, k: int = 5,
                         start_id: int = -1) -> list[tuple[int, str]]:
    """Deterministic (doc_id, text) rows planting ``pairs_per_decile`` doc
    pairs per target Jaccard decile — the truth-region generator for
    minhash_capture_curve (VERDICT r4 ask #4: the fixture's organic pairs
    top out at jaccard 0.3 with n=2, so the 0.5-0.9 deciles LSH exists
    for were unmeasured in the bench sidecar).

    Construction: doc A is ``doc_len`` chars of a SHA-256 hex stream
    (lowercase hex survives char_shingles' normalization unchanged); doc B
    shares A's first S chars and diverges into its own stream. Distinct
    k-shingles then intersect in exactly I = S-k+1 positions out of
    T = doc_len-k+1 per doc, so jaccard = I/(2T-I); solving for the decile
    center j gives I = round(2jT/(1+j)) — the pair lands mid-bucket with
    0.05 margin to each edge (hex 5-gram collisions, the only noise
    source, live in a 16^5 space at ~200 draws/doc). doc_ids are negative
    and descending: inside any ``doc_id < id_limit`` bounded subset, never
    colliding with fixture ids.

    Pure Python and bounded (2 × pairs × deciles rows) — callers feed the
    SAME rows to Spark (createDataFrame) and DuckDB, keeping the
    cross-engine parity contract testable on the planted region too."""
    import hashlib

    def stream(tag: str, n: int) -> str:
        parts, i = [], 0
        while sum(len(p) for p in parts) < n:
            parts.append(hashlib.sha256(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(parts)[:n]

    n_sh = doc_len - k + 1
    rows = []
    did = start_id
    for d in deciles:
        target = d / 10 + 0.05  # decile center
        inter = round(2 * target * n_sh / (1 + target))
        s_chars = inter + k - 1
        for p in range(pairs_per_decile):
            a = stream(f"a:{d}:{p}", doc_len)
            b = a[:s_chars] + stream(f"b:{d}:{p}", doc_len - s_chars)
            rows.append((did, a))
            rows.append((did - 1, b))
            did -= 2
    return rows


def minhash_capture_curve(docs: DataFrame, id_limit: int = 200,
                          id_col: str = "doc_id", text_col: str = "text",
                          k: int = 5) -> DataFrame:
    """The LSH quality contract, MEASURED: per exact-Jaccard decile bucket,
    how many true pairs the band join captures. (bucket, n_pairs,
    n_captured, capture_rate) where bucket = min(floor(jaccard*10), 9) over
    ALL pairs of the bounded subset — bucket 0's rate is the false-positive
    floor, bucket 9's the near-dup recall. The theoretical S-curve for this
    family (b=4 bands, r=4 rows) is 1-(1-s^4)^4: ≈0.23 at s=0.5, ≈0.88 at
    s=0.8 — the measured curve regressing below that is the alarm this
    operator exists to raise (mirrors the ANN recall@k contract,
    similarity.recall_at_k).

    Bounded-by-design verification op (exact truth needs all pairs): the
    id_limit caps the quadratic side; the production path stays
    minhash_candidates + jaccard_verify."""
    sub = (docs.filter(F.col(id_col) < int(id_limit))
           .filter(F.col(text_col).isNotNull()))
    sh = materialize(sub.select(F.col(id_col).alias("id"),
                                char_shingles(text_col, k).alias("shingles")))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.shingles", "b.shingles"))
    uni = F.size("a.shingles") + F.size("b.shingles") - inter
    truth = (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.round(inter / uni, 6).alias("jaccard")))
    sigs = sh.withColumn("minhash", minhash_signature_expr("shingles"))
    cand = minhash_candidates(sigs, id_col="id").withColumn("hit", F.lit(1))
    return (truth.join(cand, ["id_a", "id_b"], "left")
            .groupBy(F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
                     .cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.coalesce("hit", F.lit(0))).alias("n_captured"))
            .withColumn("capture_rate",
                        F.round(F.col("n_captured").cast("double")
                                / F.col("n_pairs").cast("double"), 6)))


def minhash_candidates_capped_cte_sql_duck(max_bucket: int) -> str:
    """The bsz/keep/cands CTE block implementing the bucket cap — ONE
    definition, appended after the engine-shared bands CTE chain by both
    the candidates twin below and the capped-verify extras twin
    (registry). Same cap rule as the Spark side: bucket sizes counted
    over the same keyed rows, pairs generated only from buckets of
    ≤ ``max_bucket`` members."""
    return f"""
    bsz AS (SELECT band_key, count(*) AS c FROM bands GROUP BY 1),
    keep AS (SELECT bands.* FROM bands JOIN bsz USING (band_key)
             WHERE bsz.c <= {int(max_bucket)}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keep a JOIN keep b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id)"""


def minhash_candidates_capped_sql_duck(bands_cte: str,
                                       max_bucket: int) -> str:
    """DuckDB twin of ``minhash_candidates(max_bucket=...)``: built on the
    SAME engine-shared bands CTE chain (pass registry._minhash_bands_sql()
    — one definition per engine, the corpus.py rule)."""
    return (f"{bands_cte},"
            f"{minhash_candidates_capped_cte_sql_duck(max_bucket)}\n"
            "    SELECT id_a, id_b FROM cands")


def minhash_capture_curve_sql_duck(table: str = "documents",
                                   id_limit: int = 200,
                                   id_col: str = "doc_id",
                                   text_col: str = "text",
                                   k: int = 5) -> str:
    """DuckDB twin: same shingles, same permutation family, same band keys,
    same decile bucketing (jaccard rounded to 6dp FIRST in both engines, so
    the *10/floor sees identical doubles)."""
    from ..functions.text import char_shingles_sql_duck

    sh_sql = char_shingles_sql_duck(text_col, k)
    mh = minhash_signature_sql_duck("shingles")
    return f"""
    WITH sh AS (
      SELECT {id_col} AS id, {sh_sql} AS shingles
      FROM {table}
      WHERE {id_col} < {int(id_limit)} AND {text_col} IS NOT NULL),
    truth AS (
      SELECT a.id AS id_a, b.id AS id_b,
             round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                   (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6)
               AS jaccard
      FROM sh a JOIN sh b ON a.id < b.id),
    sig AS (SELECT id, {mh} AS minhash FROM sh),
    bands AS (
      SELECT id, concat(CAST(b AS VARCHAR), ':',
             array_to_string(minhash[b * {LSH_ROWS} + 1 :
                             b * {LSH_ROWS} + {LSH_ROWS}], ',')) AS band_key
      FROM sig, (SELECT unnest(range({LSH_BANDS})) AS b)),
    cand AS (
      SELECT DISTINCT l.id AS id_a, r.id AS id_b
      FROM bands l JOIN bands r
        ON l.band_key = r.band_key AND l.id < r.id)
    SELECT CAST(least(floor(jaccard * 10), 9) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_captured,
           round(CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS capture_rate
    FROM truth t LEFT JOIN cand c
      ON t.id_a = c.id_a AND t.id_b = c.id_b
    GROUP BY 1"""
