"""Sequence packing — assemble pre-tokenized sequences into fixed-token-
budget training bins.

A training-data op beyond the reference (its pipeline forwards spans; a
token pipeline at 10^12 sequences must also pack them into context-length
bins for the trainer). Deterministic, shuffle-minimal formulation:

    pack_id = floor(running_token_count_before_row / budget)
    (per source, ordered by seq_no)

i.e. cumulative-sum binning: a sequence goes to the bin its running offset
falls in. Bins can overflow by at most one sequence (the standard streaming-
packing approximation — greedy first-fit would need per-bin state and can't
parallelize); overflow is visible in the per-bin stats and bounded by
max(n_tok).

Scale shape: ONE hash-exchange on source + in-partition running sum (window
over high-cardinality key). No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_pack_id(seqs: DataFrame, budget: int = 2048,
                 key: str = "source", order: str = "seq_no") -> DataFrame:
    # integer DIV, not floor(double /): the running sum is a BIGINT that
    # exceeds 2^53 once a key's cumulative tokens pass ~9e15 (reachable at
    # the 10^12-sequence design scale) — double promotion would then
    # misassign boundary rows by one pack. DIV equals floor() for all
    # non-negative values, so every floor-based twin stays identical.
    # key/order are interpolated into SQL, so backtick-quote them: a
    # caller's column name with spaces/dots must resolve as ONE identifier,
    # not parse as arbitrary SQL (ADVICE r3).
    kq = "`" + key.replace("`", "``") + "`"
    oq = "`" + order.replace("`", "``") + "`"
    return seqs.withColumn(
        "pack_id", F.expr(
            f"(sum(n_tok) OVER (PARTITION BY {kq} ORDER BY {oq} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) "
            f"DIV {int(budget)}").cast("long"))


def pack_stats(seqs_with_pack: DataFrame, key: str = "source") -> DataFrame:
    """Per-bin fill statistics — the packing-efficiency surface."""
    return (
        seqs_with_pack.groupBy(key, "pack_id")
        .agg(F.count(F.lit(1)).alias("n_seqs"),
             F.sum("n_tok").alias("pack_tokens"))
    )


def with_pack_id_ffd(seqs: DataFrame, budget: int = 2048,
                     key: str = "source", order: str = "seq_no",
                     shard_rows: int = 100_000) -> DataFrame:
    """First-fit-decreasing bin packing — the higher-fill alternative to
    cumsum binning when bin OVERFLOW is not allowed (every bin ≤ budget;
    sequences longer than the budget get a singleton bin).

    FFD is inherently sequential per bin set, so the scale shape shards the
    work: rows are sharded deterministically by their order column
    (shard = order div shard_rows — data-derived, AQE-safe), FFD runs
    per (key, shard) as a grouped Arrow batch (numpy argsort + first-fit
    over an active-bin array), and pack ids are unique PER KEY as
    shard * 2^33 + local_bin (pack identity downstream is (key, pack_id) —
    pack_stats groups exactly so). The 2^33 bin space cannot overflow: a
    (key, shard) group with 2^33 rows will not fit one Arrow batch long
    before the id arithmetic is wrong; order values are bounded at
    shard_rows·2^30 by an explicit guard (beyond that shard·2^33 would
    leave int64 — raise rather than wrap). Parallelism = #shards, bounded
    by data size; the fill penalty vs one global FFD is at most one
    under-filled bin per shard. Pays Arrow+Python deliberately: first-fit
    needs per-bin mutable state no window expression can carry — this is
    exactly the applyInPandas extension-surface case (SURVEY.md §2.5).
    """
    import pandas as pd  # noqa: F401  (executors)

    sharded = seqs.withColumn(
        "_shard", (F.col(order) / F.lit(shard_rows)).cast("long"))

    def ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        # Secondary sort on the order column: n_tok ties would otherwise
        # keep the shuffle-dependent incoming row order, making first-fit
        # assignments vary across runs/parallelism — the output must be
        # identical at any parallelism and across resume.
        pdf = pdf.sort_values(["n_tok", order], ascending=[False, True],
                              kind="mergesort")
        n = pdf["n_tok"].to_numpy()
        # First-fit via a max-capacity segment tree over bin indexes:
        # "lowest-index open bin with remaining >= tok" descends left-first
        # in O(log bins) — the naive per-row scan of every open bin is
        # O(rows x bins) (~10^8+ interpreter steps at shard_rows=100k,
        # minutes of single-core time); the tree gives IDENTICAL
        # assignments (first fit, not best fit) in O(rows log rows).
        size = 1
        while size < max(len(n), 1):
            size <<= 1
        tree = np.full(2 * size, -1, dtype="int64")  # -1 = bin not open
        n_open = 0
        assign = np.empty(len(n), dtype="int64")

        def _update(leaf: int, rem: int) -> None:
            i = size + leaf
            tree[i] = rem
            i >>= 1
            while i:
                tree[i] = tree[2 * i] if tree[2 * i] >= tree[2 * i + 1] \
                    else tree[2 * i + 1]
                i >>= 1

        for i, tok in enumerate(n):
            tok = int(tok)
            if tree[1] >= tok:  # some open bin fits: walk to the FIRST one
                node = 1
                while node < size:
                    node = 2 * node if tree[2 * node] >= tok \
                        else 2 * node + 1
                b = node - size
                _update(b, tree[node] - tok)
                assign[i] = b
            else:
                _update(n_open, max(budget - tok, 0))
                assign[i] = n_open
                n_open += 1
        shard = int(pdf["_shard"].iloc[0])
        if shard >= 1 << 30:
            raise ValueError(
                f"with_pack_id_ffd: order value >= {shard_rows} * 2^30 — "
                "pack_id arithmetic would overflow int64; use a denser "
                "order column or larger shard_rows")
        pdf = pdf.assign(pack_id=assign + (shard << 33))
        return pdf.drop(columns=["_shard"])

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in seqs.schema.fields
    ) + ", pack_id long"
    return sharded.groupBy(key, "_shard").applyInPandas(ffd, schema=out_schema)


def assemble_packs(seqs_with_pack: DataFrame, key: str = "source",
                   order: str = "seq_no",
                   carry: tuple[str, ...] = ()) -> DataFrame:
    """Trainer-ready pack assembly — the last mile after ``with_pack_id``:
    per (key, pack_id), the CONCATENATED token array plus parallel
    document-boundary arrays (doc_ids / starts / lens) a trainer needs to
    build its block-diagonal attention mask. Boundary arrays are primitive
    (string/int), so the cross-engine value hash is exact.

    Scale shape: one window over (key, pack_id) for the within-pack start
    offsets (partition = one pack, bounded by budget + one overflow
    sequence — NEVER a whole source, unlike the raw ``key`` window), then
    ONE hash-exchange groupBy on the same (key, pack_id) with
    sort_array(collect_list(struct)) for deterministic in-pack order.
    Group state is budget-bounded (~2048 tokens), so collect_list cannot
    blow an executor regardless of corpus size. No joins, no driver state.

    ``carry`` names columns CONSTANT within a pack (e.g. split/shard in the
    release job) to fold into the same aggregate as min() — avoids a second
    exchange + join-back to re-attach pack-level metadata.
    """
    w = (Window.partitionBy(key, "pack_id").orderBy(order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rows = seqs_with_pack.withColumn(
        "_start", (F.sum("n_tok").over(w) - F.col("n_tok")).cast("int"))
    g = rows.groupBy(key, "pack_id").agg(
        F.sort_array(F.collect_list(F.struct(
            F.col(order).alias("o"), F.col("doc_id"), F.col("_start"),
            F.col("n_tok"), F.col("tokens")))).alias("rs"),
        *[F.min(c).alias(c) for c in carry])
    return g.select(
        key, "pack_id", *carry,
        F.flatten(F.expr("transform(rs, r -> r.tokens)")).alias("pack_tokens"),
        F.expr("transform(rs, r -> r.doc_id)").alias("doc_ids"),
        F.expr("transform(rs, r -> r._start)").alias("starts"),
        F.expr("transform(rs, r -> r.n_tok)").alias("lens"),
        F.size("rs").alias("n_docs"),
        F.expr("CAST(aggregate(rs, 0L, (a, r) -> a + r.n_tok) AS INT)")
        .alias("pack_len"),
    )


def finalize_packs(packs: DataFrame, budget: int = 2048,
                   pad_id: int = -1) -> DataFrame:
    """Fixed-context trainer finishing over ``assemble_packs`` output: pad
    every pack to the context length and emit the two per-token arrays a
    causal-LM trainer consumes alongside the tokens —

      * ``position_ids``: 0..len-1 RESET at each document boundary (the
        packed-attention convention: positions restart per doc so RoPE /
        learned embeddings never see cross-doc offsets); pads get 0.
      * ``loss_mask``: 1 for real tokens, 0 for pads.

    Overflow packs (cumsum binning lets the last sequence spill past the
    budget) keep their natural length with n_pad = 0 — truncation is a
    corpus-policy decision (caps.truncate_tokens), never applied silently
    here. Pure projection: zero exchanges, whole-stage codegen; the only
    non-trivial expression is a flatten(transform(lens, ...)) whose size
    is budget-bounded per row.
    """
    pad = F.greatest(F.lit(budget) - F.col("pack_len"), F.lit(0))
    # slice(..., 1, n) instead of a CASE-to-array() guard: an untyped
    # array() literal coerces to array<string> and breaks the branch types;
    # slicing a 1-element sequence to length 0 keeps array<int> throughout.
    positions = F.expr(
        "flatten(transform(lens, n -> "
        "slice(sequence(0, greatest(n, 1) - 1), 1, n)))")
    return packs.select(
        *[c for c in packs.columns if c not in ("pack_tokens",)],
        F.concat(F.col("pack_tokens"),
                 F.array_repeat(F.lit(pad_id), pad)).alias("padded_tokens"),
        F.concat(positions, F.array_repeat(F.lit(0), pad))
        .alias("position_ids"),
        F.concat(F.array_repeat(F.lit(1), F.col("pack_len")),
                 F.array_repeat(F.lit(0), pad)).alias("loss_mask"),
        pad.cast("int").alias("n_pad"),
    )


def unpack_packs(packs: DataFrame, tok_col: str = "pack_tokens",
                 key: str = "source") -> DataFrame:
    """Inverse of ``assemble_packs`` — the consumer-side contract: explode
    the boundary arrays back to one row per document and slice each doc's
    tokens out of the concatenated array. Works on ``finalize_packs``
    output too (pass tok_col='padded_tokens': real tokens occupy the
    prefix, so the same starts/lens slices recover them; pads are never
    inside a doc slice).

    Zero-shuffle flatMap (arrays_zip + posexplode + slice), whole-stage
    codegen; rides the pack table's partitioning. The round-trip
    unpack(assemble(x)) == x is pytest-pinned — the property that makes
    the packed release a lossless re-layout rather than a transformation.
    """
    z = F.arrays_zip("doc_ids", "starts", "lens")
    return (packs.select(
        key, "pack_id", F.col(tok_col).alias("_pt"),
        F.posexplode(z).alias("pos_in_pack", "b"))
        .select(
            F.col("b.doc_ids").alias("doc_id"),
            key, "pack_id", "pos_in_pack",
            F.expr("slice(_pt, b.starts + 1, b.lens)").alias("tokens"),
            F.col("b.lens").alias("n_tok"),
        ))


def chunk_sequences(seqs: DataFrame, window: int = 512,
                    stride: int = 384) -> DataFrame:
    """Split every token sequence into fixed-size training context windows
    with overlap (stride < window ⇒ window−stride tokens of context carry
    into the next chunk — the standard LM chunking scheme). Output: one row
    per (doc_id, chunk_no) with the sliced token array.

    Pure expression-level: a `sequence(0, …, stride)` of chunk starts,
    `transform` + `slice` to cut the windows, `posexplode` to rows — a
    flatMap, no shuffle, whole-stage codegen end to end. Short sequences
    (n_tok ≤ window) yield exactly one untruncated chunk; the final chunk
    of a long sequence keeps its natural (shorter) tail length.

    At 100 TB this is the map stage in front of with_pack_id: chunk first
    (bounded rows), then pack the chunks — both stages partition-local
    until the pack groupBy."""
    if not 0 < stride <= window:
        raise ValueError("require 0 < stride <= window")
    starts = F.expr(
        f"sequence(0, greatest(0, CAST(ceil((size(tokens) - {window}) "
        f"/ CAST({stride} AS DOUBLE)) AS INT)) * {stride}, {stride})")
    chunks = F.transform(starts, lambda s: F.slice("tokens", s + 1, window))
    return (
        seqs.select("doc_id", "source", "n_tok",
                    F.posexplode(chunks).alias("chunk_no", "chunk_tokens"))
        # the only empty slice a valid start can produce is the single
        # chunk of an EMPTY sequence — keep that one row (the doc must not
        # silently vanish between the sequence and chunk tables; 'short
        # sequences yield exactly one chunk' includes length 0)
        .filter((F.size("chunk_tokens") > 0) | (F.col("n_tok") == 0))
        .withColumn("chunk_len", F.size("chunk_tokens"))
    )
