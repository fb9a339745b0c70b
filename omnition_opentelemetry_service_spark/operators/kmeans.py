"""Distributed Lloyd's iterations (spherical k-means) — the real IVF
index-training step that similarity.py's deterministic MOD-sample centroids
stand in for (similarity.py:380-382 discloses the stand-in; this module
removes the limitation).

Shape at scale, per iteration (the only loop a 10^12-vector index build
pays):

- **assign**: the k-centroid table collapses to ONE array row (tiny agg
  job) and broadcast-attaches onto the corpus — the same zero-shuffle path
  as similarity.ivf_assign: argmax over k is a per-row array expression,
  no corpus exchange, K bounded by IVF design (≤ ~2^16).
- **update**: per-cell element-wise vector sums as ``dim`` separate
  ``sum(embedding[i])`` aggregates — all JVM-side, map-side combinable, so
  the exchange carries ≤ partitions × k × dim partials, never the corpus.
  The k×dim result (plus counts) is collected driver-side — bounded by the
  INDEX size, not the data.
- **convergence**: max centroid displacement < tol, or max_iter.

Driver-side floats: the per-cell sums fold in partition order, so centroid
coordinates can differ by ~1 ulp across partitionings — inherent to any
distributed float reduction. Assignments are therefore stable only where
the cell margin exceeds that noise; the tests use well-separated planted
clusters and assert CLUSTER-level invariants (membership, monotone cost,
convergence), not bitwise centroid equality — documented honestly rather
than papered over (the repo's exact-parity contract applies to the
deterministic operators; an iterative trainer is approximate by nature).

Empty cells keep their previous centroid (FAISS semantics) so k never
shrinks mid-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import EMB_DIM, _dot_expr


def _assign_struct_expr(metric: str = "cosine") -> str:
    """Best (cell, score) over a bound one-row `cents` array column — the
    ranked-array argmax of similarity.ivf_assign (nprobe=1), inlined for
    the training loop (score desc, ties → smaller cid). metric='cosine' is
    the spherical IVF form; metric='l2' scores by NEGATED squared euclidean
    distance (argmax of -d² = argmin of d²) — the product-quantization
    form, where all-zero sub-vectors are legitimate inputs and cosine's
    zero-norm contract would reject them."""
    if metric == "l2":
        s = (f"-({_dot_expr('embedding', 'embedding')} "
             f"- 2 * {_dot_expr('embedding', 'c.c_emb')} "
             f"+ {_dot_expr('c.c_emb', 'c.c_emb')})")
    else:
        s = (f"{_dot_expr('embedding', 'c.c_emb')} / "
             f"(sqrt({_dot_expr('embedding', 'embedding')}) * "
             f"sqrt({_dot_expr('c.c_emb', 'c.c_emb')}))")
    scored = f"transform(cents, c -> named_struct('s', {s}, 'cid', c.centroid_id))"
    # NULL scores sort LAST (the similarity.ivf_assign comparator, kept
    # branch-identical): a zero-norm centroid under cosine scores 0/0 →
    # NULL in non-ANSI sessions, where bare > / < comparisons are both
    # false and the NULL-scored centroid would fall through to the cid
    # rule, outranking every real score (non-total order). ANSI sessions
    # raise on 0/0 before ordering — the branches keep the two session
    # modes twin-identical instead of silently divergent.
    return (
        f"array_sort({scored}, (a, b) -> "
        "CASE WHEN a.s IS NULL AND b.s IS NULL THEN "
        "(CASE WHEN a.cid < b.cid THEN -1 WHEN a.cid > b.cid THEN 1 ELSE 0 END) "
        "WHEN a.s IS NULL THEN 1 WHEN b.s IS NULL THEN -1 "
        "WHEN a.s > b.s THEN -1 WHEN a.s < b.s THEN 1 "
        "WHEN a.cid < b.cid THEN -1 WHEN a.cid > b.cid THEN 1 ELSE 0 END)"
        "[0]"
    )


def trained_centroids_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(centroid_id, c_emb) — the similarity.ivf_centroids schema, so a
    trained index drops into ivf_assign / ivf_cell_sizes / ivf_ann_topk
    unchanged."""
    return spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id long, c_emb array<double>")


def _with_assignment(src: DataFrame, cents_df: DataFrame,
                     metric: str = "cosine") -> DataFrame:
    """Attach (cell, score) per row: centroid table → one sorted array row →
    broadcast nested-loop (1-row build side = map-side column attach)."""
    cents_row = cents_df.agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "c_emb")))
        .alias("cents"))
    return (
        src.crossJoin(F.broadcast(cents_row))
        .withColumn("a", F.expr(_assign_struct_expr(metric)))
        .drop("cents")
        .withColumn("cell", F.col("a.cid"))
        .withColumn("score", F.col("a.s"))
        .drop("a")
    )


def init_centroids(emb: DataFrame, k: int, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   oversample: int = 8,
                   metric: str = "cosine") -> list[tuple[int, list[float]]]:
    """Deterministic k-means‖-style seeding: hash-sample a candidate pool
    (the ``oversample``·k corpus vectors with the smallest md5-of-id hash —
    seed-free, independent of input order/partitioning, same determinism
    family as mixture.mix_hash; ONE bounded top-m collect), then
    farthest-first traversal (Gonzalez) on the pool driver-side: start from
    the min-hash vector, greedily add the candidate with the smallest max
    cosine to the chosen set. A plain uniform k-sample routinely lands two
    seeds in one true cluster and Lloyd's cannot split a merged pair; the
    farthest-first pass covers every well-separated cluster that the pool
    touches (pool misses a cluster with prob ≤ (1−1/k)^(oversample·k) ≈
    e^-oversample)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    m = max(k * oversample, k)
    h = F.expr(f"conv(substring(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10)")
    rows = (emb.select(F.col(id_col), F.col(emb_col), h.cast("bigint").alias("h"))
            .orderBy("h", id_col).limit(m).collect())
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    import numpy as np

    mat = np.array([r[emb_col] for r in rows], dtype=np.float64)
    if metric == "l2":
        # similarity = -squared euclidean distance: larger = closer, so
        # the same argmin-of-max-similarity traversal applies; zero-norm
        # vectors are legitimate (the PQ sub-vector case).
        def sims(i: int) -> "np.ndarray":
            d = mat - mat[i]
            return -(d * d).sum(axis=1)
    else:
        norm = np.sqrt((mat * mat).sum(axis=1))
        if (norm == 0).any():
            raise ValueError("zero-norm embedding in the seed pool: cosine "
                             "undefined (same contract as the IVF query path)")
        unit = mat / norm[:, None]

        def sims(i: int) -> "np.ndarray":
            return unit @ unit[i]
    chosen = [0]  # the min-hash candidate
    # max similarity of each candidate to the chosen set (lower = farther)
    closest = sims(0)
    for _ in range(1, k):
        nxt = int(np.argmin(closest))  # ties → first (deterministic)
        chosen.append(nxt)
        closest = np.maximum(closest, sims(nxt))
    return [(i, [float(x) for x in rows[c][emb_col]])
            for i, c in enumerate(chosen)]


def assign_cells(emb: DataFrame, centroids: list[tuple[int, list[float]]],
                 id_col: str = "vec_id",
                 emb_col: str = "embedding",
                 metric: str = "cosine") -> DataFrame:
    """(id, cell) for every vector — one broadcast-attach scan, no shuffle."""
    cents_df = trained_centroids_df(emb.sparkSession, centroids)
    src = emb.select(F.col(id_col), F.col(emb_col).alias("embedding"))
    return _with_assignment(src, cents_df, metric).select(id_col, "cell")


def kmeans_train(emb: DataFrame, k: int = 8, max_iter: int = 10,
                 tol: float = 1e-6, id_col: str = "vec_id",
                 emb_col: str = "embedding",
                 dim: int = EMB_DIM, metric: str = "cosine",
                 ) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Lloyd's iterations; returns (centroids, per-iteration mean score —
    cosine for metric='cosine', negated squared distance for 'l2'; monotone
    non-decreasing either way).

    centroids: [(centroid_id, vector)] — feed to ``trained_centroids_df``
    for similarity.ivf_assign / ivf_ann_topk (same schema as
    similarity.ivf_centroids). The cost list is the mean assigned-cosine
    per iteration (monotone non-decreasing up to float fold noise — the
    convergence diagnostic a production index build logs).

    The input projection is persisted for the loop's lifetime (seeding
    scan + one stats pass per iteration would otherwise re-execute the
    whole upstream lineage max_iter+1 times) and released before return
    — an internal working set, not a returned DataFrame, so the
    caller-owned cache rule does not apply."""
    spark = emb.sparkSession
    src = emb.select(F.col(id_col), F.col(emb_col)).persist()
    try:
        return _kmeans_train_loop(spark, src, k, max_iter, tol, id_col,
                                  emb_col, dim, metric)
    finally:
        src.unpersist()


def _kmeans_train_loop(spark, emb: DataFrame, k: int, max_iter: int,
                       tol: float, id_col: str, emb_col: str, dim: int,
                       metric: str,
                       ) -> tuple[list[tuple[int, list[float]]], list[float]]:
    cents = init_centroids(emb, k, id_col, emb_col, metric=metric)
    costs: list[float] = []
    src = emb.select(F.col(emb_col).alias("embedding"))
    for _ in range(max_iter):
        assigned = _with_assignment(src, trained_centroids_df(spark, cents),
                                    metric)
        # dim sum() aggregates + count + cost, ONE map-side-combinable pass:
        # shuffle volume ≤ partitions × k × (dim + 2) doubles.
        aggs = [F.sum(F.col("embedding")[i].cast("double")).alias(f"s{i}")
                for i in range(dim)]
        stats = (assigned.groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("score").alias("sc"), *aggs)
                 .collect())
        total_n = sum(r["n"] for r in stats)
        costs.append(sum(r["sc"] for r in stats) / total_n)
        by_cell = {r["cell"]: r for r in stats}
        new_cents, shift = [], 0.0
        for cid, old in cents:
            r = by_cell.get(cid)
            if r is None or r["n"] == 0:
                new_cents.append((cid, old))  # empty cell keeps its centroid
                continue
            mean = [r[f"s{i}"] / r["n"] for i in range(dim)]
            shift = max(shift, max(abs(m - o) for m, o in zip(mean, old)))
            new_cents.append((cid, mean))
        cents = new_cents
        if shift < tol:
            break
    return cents, costs
