"""Product quantization (IVF-PQ's compression half) — the piece that makes
10^12-vector ANN memory-feasible: a 64-dim float64 vector (512 B) compresses
to M sub-codes (M bytes at 256 codes/subspace), so the searched index holds
codes + codebooks, never raw vectors (Jégou/Douze/Schmid, "Product
quantization for nearest neighbor search", IEEE PAMI 2011).

Not in the reference (no vector ops there); this extends the repo's ANN
family (similarity.py: brute force → LSH buckets → IVF cells) with the
compressed-domain scale path. Pipeline:

- **train** (offline, bounded): split the dim axis into M subspaces and run
  the existing distributed Lloyd's trainer (operators/kmeans.py,
  metric='l2' — PQ quantizes by euclidean distance, and sub-vectors may
  legitimately be all-zero where spherical cosine is undefined) per
  subspace over the SUB-vectors — M small k-means problems (k ≤ 256,
  dim/M dims), each a broadcast-assign + map-side-combinable update; the
  codebooks (M × k × dim/M doubles) are index metadata, tiny by design.
- **encode** (one corpus scan, ZERO shuffle): the codebooks inline as a
  plan literal; per row, per subspace, the code is the argmin-L2² codebook
  entry — all array expressions, no Python. Tie rule: smallest code id,
  via position-of-minimum (first match) — IDENTICAL in both engines.
- **search** (ADC — asymmetric distance computation): per query, the
  M × k table of L2² distances from the query's sub-vectors to every
  codebook entry is computed ONCE driver-side (numpy-free float64 loop)
  and embedded as literals; a corpus row's approximate distance is then M
  table lookups summed in subspace order. The Q-row query-table relation
  broadcasts onto the encoded corpus (no corpus shuffle); top-k ranks the
  candidate set (at scale: AFTER IVF cell pruning caps the candidates).

Cross-engine parity is EXACT, not approximate-ish: distances sum squares
in fixed subspace-element order as doubles in both engines, the argmin tie
rule is the shared first-index-of-min, and the ADC tables are the same
float64 literals — so codes, ADC scores, and result rows are identical
between Spark and the generated DuckDB twins (pinned in tests/test_pq.py,
including on arbitrary vectors via hypothesis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import kmeans_train
from .similarity import EMB_DIM

M_SUBSPACES = 8
K_CODES = 16  # fixture-sized; production uses 256 (1 byte/code)


def _sub_dim(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by M={m}")
    return dim // m


def pq_train(emb: DataFrame, m: int = M_SUBSPACES, k: int = K_CODES,
             max_iter: int = 5, id_col: str = "vec_id",
             emb_col: str = "embedding",
             dim: int = EMB_DIM) -> list[list[list[float]]]:
    """codebooks[mi][ci] = centroid vector (len dim/M) — M independent
    spherical-k-means runs over the sub-vector columns. Each run's cost
    envelope is the kmeans_train contract (broadcast assign, bounded
    exchange); M runs scan the corpus M times — train-time cost, paid once
    per index build, and at scale on a hash-sample of the corpus."""
    sd = _sub_dim(dim, m)
    books: list[list[list[float]]] = []
    for mi in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(emb_col), mi * sd + 1, sd).alias("sub"))
        cents, _ = kmeans_train(sub, k=k, max_iter=max_iter,
                                id_col=id_col, emb_col="sub", dim=sd,
                                metric="l2")
        books.append([vec for _cid, vec in cents])
    return books


# -- encode -------------------------------------------------------------------
def _books_literal_spark(books: list[list[list[float]]]) -> str:
    return ("array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in c) + ")"
            for c in book) + ")"
        for book in books) + ")")


def pq_encode(emb: DataFrame, books: list[list[list[float]]],
              id_col: str = "vec_id", emb_col: str = "embedding",
              dim: int = EMB_DIM) -> DataFrame:
    """(id, codes array<int>) — one scan, zero shuffle; codes[mi] = 0-based
    argmin-L2² codebook entry of subspace mi (ties → smaller code id).

    The per-subspace distance array binds ONCE through a transform-wrapper
    lambda (the CollapseProject re-evaluation trap — computing it inline in
    both array_position and array_min would double the squared-diff work).
    Spark [] indexing is 0-based (vs DuckDB's 1-based — the twin offsets
    differ by exactly that)."""
    # NULL embedding → NULL codes (the quarantine convention): without
    # the guard the transform yields an array OF nulls, which is not
    # IS NULL-filterable and NULL-poisons every downstream ADC lookup.
    expr = (f"CASE WHEN {emb_col} IS NULL THEN NULL "
            f"ELSE {_codes_expr(books, emb_col, dim)} END")
    return emb.select(F.col(id_col).alias("id"), F.expr(expr).alias("codes"))


def _codes_expr(books: list[list[list[float]]], emb_col: str,
                dim: int) -> str:
    m, k = len(books), len(books[0])
    sd = _sub_dim(dim, m)
    lit = _books_literal_spark(books)
    l2 = " + ".join(
        f"({emb_col}[mi * {sd} + {j}] - bs[mi][ci][{j}]) * "
        f"({emb_col}[mi * {sd} + {j}] - bs[mi][ci][{j}])"
        for j in range(sd))
    dists = f"transform(sequence(0, {k - 1}), ci -> {l2})"
    return (
        f"transform(array({lit}), bs -> "
        f"transform(sequence(0, {m - 1}), mi -> "
        f"transform(array({dists}), ds -> "
        f"CAST(array_position(ds, array_min(ds)) - 1 AS INT))[0]))[0]")


def _l2_duck(emb_col: str, off: int, cent: list[float]) -> str:
    """Unrolled sum of squared diffs in element order — the SAME addition
    order as the Spark form so the argmin sees identical doubles."""
    return " + ".join(
        f"({emb_col}[{off + j + 1}] - {x!r}) * ({emb_col}[{off + j + 1}] - {x!r})"
        for j, x in enumerate(cent))


def pq_encode_sql_duck(books: list[list[list[float]]], rel: str = "embeddings",
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       dim: int = EMB_DIM) -> str:
    """DuckDB twin of pq_encode — codebook literals, L2² element order, and
    the first-index-of-min tie rule shared with the Spark form."""
    m, k = len(books), len(books[0])
    sd = _sub_dim(dim, m)
    per_sub = []
    for mi in range(m):
        dists = ("[" + ", ".join(
            _l2_duck(emb_col, mi * sd, books[mi][ci]) for ci in range(k))
            + "]")
        per_sub.append(
            f"(SELECT CAST(list_position(ds, list_min(ds)) - 1 AS INT) "
            f"FROM (SELECT {dists} AS ds))")
    codes = "[" + ", ".join(per_sub) + "]"
    return (f"SELECT {id_col} AS id, CASE WHEN {emb_col} IS NULL THEN NULL "
            f"ELSE {codes} END AS codes FROM {rel}")


# -- search (ADC) ---------------------------------------------------------------
def adc_tables(query_vec: list[float],
               books: list[list[list[float]]]) -> list[list[float]]:
    """tables[mi][ci] = L2²(query sub-vector mi, codebook entry ci) —
    float64 in the same element order as the encode expressions; computed
    once per query driver-side and embedded identically in BOTH engines."""
    m, k = len(books), len(books[0])
    sd = len(books[0][0])
    out = []
    for mi in range(m):
        q = query_vec[mi * sd:(mi + 1) * sd]
        row = []
        for ci in range(k):
            c = books[mi][ci]
            acc = 0.0
            for j in range(sd):
                acc += (q[j] - c[j]) * (q[j] - c[j])
            row.append(acc)
        out.append(row)
    return out


def pq_adc_topk(codes_df: DataFrame, queries: list[tuple[int, list[float]]],
                books: list[list[list[float]]], k: int = 5) -> DataFrame:
    """(query_id, id, adc_dist) — top-k by ADC distance per query.

    Scale shape: the Q-row (query_id, tables) relation broadcasts onto the
    encoded corpus (BroadcastNestedLoop over a tiny build side — constant
    work per corpus row, NO corpus shuffle); scoring is M array lookups +
    adds per (row, query); the only exchange is the top-k rank over Q × N
    score rows — at scale N is the probed IVF cells' population, not the
    corpus. Ties break on smaller id in both engines."""
    spark = codes_df.sparkSession
    tq = spark.createDataFrame(
        [(qid, adc_tables(vec, books)) for qid, vec in queries],
        "query_id long, tables array<array<double>>")
    score = (
        f"aggregate(sequence(0, {len(books) - 1}), CAST(0.0 AS DOUBLE), "
        f"(acc, mi) -> acc + tables[mi][codes[mi]])")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("id"))
    # NULL codes (a NULL embedding) must be excluded BEFORE ranking:
    # their NULL adc_dist sorts FIRST under Spark's ASC (but LAST in
    # DuckDB) — without the filter a null row tops every query's top-k
    # on one engine only.
    return (codes_df.filter(F.col("codes").isNotNull())
            .crossJoin(F.broadcast(tq))
            .withColumn("adc_dist", F.round(F.expr(score), 6))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "id", "adc_dist"))


def assign_and_encode(emb: DataFrame,
                      centroids: list[tuple[int, list[float]]],
                      books: list[list[list[float]]],
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      dim: int = EMB_DIM) -> DataFrame:
    """(id, cell, codes) — the IVF-PQ corpus representation, computed in
    ONE zero-shuffle scan (coarse L2 argmin over the broadcast centroid
    array + PQ codes side by side; a cells⋈codes self-join to reunite
    columns computable together would shuffle the whole corpus). Shared by
    ivf_pq_topk and jobs/build_ann_index.py."""
    from .kmeans import _with_assignment, trained_centroids_df

    corpus = emb.select(F.col(id_col), F.col(emb_col).alias("embedding"))
    cells = _with_assignment(
        corpus, trained_centroids_df(emb.sparkSession, centroids),
        metric="l2")
    # pq_encode's NULL guard must hold HERE too: without it a NULL
    # embedding yields codes = an array OF NULLs (not NULL), which passes
    # the codes IS NOT NULL filters in ivf_pq_topk / search_ann_index; the
    # resulting NULL adc_dist sorts FIRST under Spark's ASC NULLS FIRST,
    # topping every query's top-k (PARITY.md trap #13).
    codes = (f"CASE WHEN embedding IS NULL THEN NULL "
             f"ELSE {_codes_expr(books, 'embedding', dim)} END")
    return cells.select(
        F.col(id_col).alias("id"), "cell", F.expr(codes).alias("codes"))


def ivf_pq_topk(emb: DataFrame, queries: list[tuple[int, list[float]]],
                centroids: list[tuple[int, list[float]]],
                books: list[list[list[float]]], k: int = 5,
                nprobe: int = 2, id_col: str = "vec_id",
                emb_col: str = "embedding",
                dim: int = EMB_DIM) -> DataFrame:
    """The composed scale path: IVF coarse pruning × PQ compressed scoring
    (FAISS's IVFPQ index shape). (query_id, id, adc_dist), top-k per query.

    - corpus side, ONE scan, zero shuffle: each row gets its coarse cell
      (L2 argmin over the broadcast centroid array — kmeans.assign_cells'
      expression, metric='l2' to match the ADC distance) and its PQ codes
      in the SAME select (a cells⋈codes self-join would shuffle the whole
      corpus to reunite columns computable side by side).
    - query side, driver-side (Q tiny): the ``nprobe`` nearest cells per
      query plus the per-query ADC table, exploded to (query_id, cell,
      tables) rows.
    - candidate generation is a BROADCAST EQUI-JOIN on ``cell`` — corpus
      rows outside every probed cell never materialize as candidates (vs
      pq_adc_topk's full-corpus BroadcastNestedLoop); the top-k exchange
      ranks only candidates, ≈ Q · corpus/nlist · nprobe rows.
    """
    spark = emb.sparkSession
    corpus_side = assign_and_encode(emb, centroids, books, id_col,
                                    emb_col, dim)

    probe_rows = []
    for qid, vec in queries:
        dists = []
        for cid, c in centroids:
            acc = 0.0
            for j in range(dim):
                acc += (vec[j] - c[j]) * (vec[j] - c[j])
            dists.append((acc, cid))
        dists.sort()
        tables = adc_tables(vec, books)
        for _d, cid in dists[:nprobe]:
            probe_rows.append((qid, cid, tables))
    tq = spark.createDataFrame(
        probe_rows, "query_id long, cell long, tables array<array<double>>")
    score = (
        f"aggregate(sequence(0, {len(books) - 1}), CAST(0.0 AS DOUBLE), "
        f"(acc, mi) -> acc + tables[mi][codes[mi]])")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("id"))
    return (corpus_side.filter(F.col("codes").isNotNull())
            .join(F.broadcast(tq), "cell")
            .withColumn("adc_dist", F.round(F.expr(score), 6))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "id", "adc_dist"))


def pq_adc_topk_sql_duck(codes_sql: str,
                         queries: list[tuple[int, list[float]]],
                         books: list[list[list[float]]], k: int = 5) -> str:
    """DuckDB twin: same literal tables, same lookup-sum order, same ties.
    DuckDB lists are 1-based: subspace mi → tables[mi+1]; the stored code
    is 0-based → +1 for the inner lookup."""
    m = len(books)
    # CAST each literal: a bare numeric literal is DECIMAL in DuckDB and
    # the Decimal score type would leak through round() into the result
    qrows = ", ".join(
        "({}, {})".format(
            qid,
            "[" + ", ".join(
                "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in row) + "]"
                for row in adc_tables(vec, books)) + "]")
        for qid, vec in queries)
    score = " + ".join(f"q.tables[{mi + 1}][c.codes[{mi + 1}] + 1]"
                       for mi in range(m))
    return f"""
    WITH c AS ({codes_sql}),
    q(query_id, tables) AS (VALUES {qrows}),
    scored AS (
      SELECT q.query_id, c.id, round({score}, 6) AS adc_dist,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round({score}, 6), c.id) AS rnk
      FROM c CROSS JOIN q WHERE c.codes IS NOT NULL)
    SELECT query_id, id, adc_dist FROM scored WHERE rnk <= {k}"""


def search_ann_index(spark, index_dir: str,
                     queries: list[tuple[int, list[float]]], k: int = 5,
                     nprobe: int = 2):
    """Serve top-k from an index built by jobs/build_ann_index.py: load
    meta.json (centroids + codebooks — driver-bounded), pick each query's
    ``nprobe`` nearest cells driver-side, and scan ONLY those partitions
    (``cell IN (...)`` prunes the cell=N parquet dirs — PartitionFilters,
    asserted in tests) scoring M ADC lookups per candidate row. No raw
    vectors are read at serve time — the codes table IS the index."""
    import json
    import os

    from pyspark.sql import Window as W

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    books = meta["codebooks"]
    dim = meta["dim"]
    probe_rows = []
    probed_cells = set()
    for qid, vec in queries:
        dists = []
        for cid, c in meta["centroids"]:
            acc = 0.0
            for j in range(dim):
                acc += (vec[j] - c[j]) * (vec[j] - c[j])
            dists.append((acc, cid))
        dists.sort()
        tables = adc_tables(vec, books)
        for _d, cid in dists[:nprobe]:
            probe_rows.append((qid, cid, tables))
            probed_cells.add(cid)
    # base codes + every COMMITTED delta batch (update_ann_index): each
    # path is scanned separately so every scan keeps its own cell=
    # PartitionFilters; delta count is bounded by drops-since-rebuild
    # (compaction = rebuild), so the union width is operational, not
    # corpus-scaled. Dot-staging dirs are never listed — only claimed
    # batch=N names are visible.
    cells = sorted(probed_cells)

    def _scan(path):
        return (spark.read.parquet(path)
                .filter(F.col("cell").isin(cells)))

    codes = _scan(os.path.join(index_dir, "codes"))
    delta_root = os.path.join(index_dir, "codes_delta")
    if os.path.isdir(delta_root):
        for d in sorted(os.listdir(delta_root)):
            if d.startswith("batch="):
                codes = codes.unionByName(_scan(os.path.join(delta_root, d)))
    tq = spark.createDataFrame(
        probe_rows, "query_id long, cell long, tables array<array<double>>")
    score = (
        f"aggregate(sequence(0, {len(books) - 1}), CAST(0.0 AS DOUBLE), "
        f"(acc, mi) -> acc + tables[mi][codes[mi]])")
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("id"))
    return (codes.filter(F.col("codes").isNotNull())
            .join(F.broadcast(tq), "cell")
            .withColumn("adc_dist", F.round(F.expr(score), 6))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "id", "adc_dist"))


def update_ann_index(spark, index_dir: str, new_emb: DataFrame,
                     batch_id: int, id_col: str = "vec_id",
                     emb_col: str = "embedding") -> dict:
    """FAISS-`add` for the on-disk IVF-PQ index: encode a NEW drop with the
    STORED coarse centroids and codebooks (no retrain — the quantizer is
    frozen at build time, the standard IVF add discipline; distribution
    drift degrades recall until the next REBUILD, which is a rebuild, not
    an update) and commit it as a delta directory:

        <index>/codes_delta/batch=<id>/cell=N/*.parquet

    Commit protocol — the repo's writer-claimed sibling-dir discipline
    (sinks/snapshot.py, streaming/incremental.py): the delta is written to
    a dot-staging dir (invisible to serving) and claimed by ONE atomic
    rename. Redelivery of an already-committed batch_id is a no-op; a
    crash mid-write leaves only an ignored staging dir; two concurrent
    writers race on the rename and exactly one wins. Identity across
    base+deltas is the CALLER's contract (run the incremental dedup first
    — operators/incremental.py); the index appends, it does not upsert.

    Shape at scale: one zero-shuffle encode scan of the drop
    (assign_and_encode — broadcast centroid argmax + codes in the same
    select) plus the single repartition-on-cell the base build also pays.
    """
    import json
    import os
    import shutil
    import uuid

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cents = [(int(c), v) for c, v in meta["centroids"]]
    delta_root = os.path.join(index_dir, "codes_delta")
    final = os.path.join(delta_root, f"batch={int(batch_id)}")
    if os.path.exists(final):
        return {"batch_id": int(batch_id), "committed": False,
                "rows": 0, "reason": "already committed"}
    coded = assign_and_encode(new_emb, cents, meta["codebooks"],
                              id_col=id_col, emb_col=emb_col,
                              dim=meta["dim"])
    os.makedirs(delta_root, exist_ok=True)
    staging = os.path.join(delta_root, f".staging-{uuid.uuid4().hex}")
    (coded.repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(staging))
    n = spark.read.parquet(staging).count()
    try:
        os.rename(staging, final)
        committed = True
    except OSError:
        # lost the claim to a concurrent writer — discard our staging
        shutil.rmtree(staging, ignore_errors=True)
        committed = False
    return {"batch_id": int(batch_id), "committed": committed,
            "rows": n if committed else 0}
