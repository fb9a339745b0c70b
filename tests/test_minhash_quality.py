"""MinHash LSH quality contract (dedup.minhash_capture_curve): measured
per-Jaccard-decile capture vs the exact all-pairs truth, DuckDB parity,
and pinned floors a banding regression would trip (the MinHash mirror of
tests/test_ann_recall.py)."""

from __future__ import annotations

import duckdb

from omnition_opentelemetry_service_spark.operators import dedup as dd
from omnition_opentelemetry_service_spark.sources.loader import load

SF = "/root/testdata/sf0.001"


def _curve(spark):
    docs = load(spark, SF, "documents")
    rows = sorted(tuple(r) for r in dd.minhash_capture_curve(docs).collect())
    spark.catalog.clearCache()
    return rows


def test_cross_engine_parity(spark):
    s = _curve(spark)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    d = sorted(tuple(r)
               for r in con.execute(
                   dd.minhash_capture_curve_sql_duck()).fetchall())
    assert s == d


def test_pinned_floors(spark):
    """Near-dup recall floor + candidate-pollution ceiling. Theory for
    b=4, r=4: capture(s) = 1-(1-s^4)^4 — ≥0.998 at s=0.9, ≤0.016 at
    s=0.3. The pins leave sampling slack but trip a real banding bug
    (wrong slice offsets, band-key collisions, permutation regression)."""
    by_bucket = {r[0]: r for r in _curve(spark)}
    # the fixture plants near-identical pairs: they must land in bucket 9
    # and the band join must capture essentially all of them
    assert 9 in by_bucket and by_bucket[9][1] > 0
    assert by_bucket[9][3] >= 0.9
    # low-jaccard buckets: the 4x4 family captures almost none of them
    for b in (0, 1, 2):
        if b in by_bucket:
            assert by_bucket[b][3] <= 0.05, by_bucket[b]


def test_counts_are_all_pairs(spark):
    """n_pairs sums to C(n,2) of the bounded subset — the truth side is
    the full all-pairs table, not a candidate echo."""
    docs = load(spark, SF, "documents")
    n = docs.filter("doc_id < 200").filter("text IS NOT NULL").count()
    rows = _curve(spark)
    assert sum(r[1] for r in rows) == n * (n - 1) // 2
    # captured <= pairs per bucket, and capture_rate is their ratio
    for _, n_pairs, n_cap, rate in rows:
        assert 0 <= n_cap <= n_pairs
        assert abs(rate - round(n_cap / n_pairs, 6)) < 1e-9


def _planted_union_curve(spark, pairs_per_decile=50):
    rows = dd.planted_jaccard_rows(pairs_per_decile=pairs_per_decile)
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    docs = (load(spark, SF, "documents").select("doc_id", "text")
            .unionByName(planted))
    out = sorted(tuple(r) for r in dd.minhash_capture_curve(docs).collect())
    spark.catalog.clearCache()
    return out


def test_planted_deciles_populate_and_extend_floors(spark):
    """VERDICT r4 ask #4: with 50 planted pairs per decile 0.3-0.9 the
    curve measures the region LSH exists for. Floors/ceilings sit 2.5-3
    binomial sd from the b=4,r=4 theory capture(s)=1-(1-s^4)^4 at decile
    centers (0.32@0.55, 0.55@0.65, 0.78@0.75, 0.95@0.85, 0.999@0.95) —
    slack absorbs sampling, a banding regression still trips them."""
    by_bucket = {r[0]: r for r in _planted_union_curve(spark)}
    for d in range(3, 10):
        assert d in by_bucket and by_bucket[d][1] >= 50, by_bucket.get(d)
    floors = {5: 0.15, 6: 0.35, 7: 0.6, 8: 0.85, 9: 0.97}
    ceilings = {3: 0.2, 4: 0.4}
    for d, fl in floors.items():
        assert by_bucket[d][3] >= fl, (d, by_bucket[d])
    for d, ce in ceilings.items():
        assert by_bucket[d][3] <= ce, (d, by_bucket[d])


def test_planted_pairs_land_mid_bucket(spark):
    """The generator's jaccard math is exact up to rare hex-gram
    collisions: each planted pair's measured jaccard must land INSIDE its
    target decile (not straddling an edge), pair-by-pair."""
    import duckdb

    rows = dd.planted_jaccard_rows(pairs_per_decile=5)
    con = duckdb.connect()
    con.execute("CREATE TABLE planted (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", rows)
    # planted ids descend in pairs from -1: (-1,-2) is decile 3's first
    # pair, so generator order is recovered by descending a.doc_id
    deciles = list(range(3, 10))
    got = con.execute("""
        WITH sh AS (SELECT doc_id, list_distinct(
              list_transform(range(len(text) - 4),
                             j -> substr(text, CAST(j + 1 AS INTEGER), 5)))
            AS s FROM planted)
        SELECT a.doc_id, round(len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
        FROM sh a JOIN sh b ON a.doc_id = b.doc_id + 1 AND a.doc_id % 2 != 0
        ORDER BY a.doc_id DESC""").fetchall()
    assert len(got) == 5 * len(deciles)
    for i, (_, j) in enumerate(got):
        d = deciles[i // 5]
        assert d / 10 + 0.01 <= j < (d + 1) / 10 - 0.01, (d, j)


def test_planted_cross_engine_parity(spark):
    """The parity contract holds on the planted region too: same rows into
    both engines, identical curve."""
    import duckdb

    rows = dd.planted_jaccard_rows(pairs_per_decile=10)
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    docs = (load(spark, SF, "documents").select("doc_id", "text")
            .unionByName(planted))
    s = sorted(tuple(r) for r in dd.minhash_capture_curve(docs).collect())
    spark.catalog.clearCache()
    con = duckdb.connect()
    con.execute("CREATE TABLE planted (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", rows)
    con.execute(f"""CREATE VIEW documents AS
        SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')
        UNION ALL SELECT doc_id, text FROM planted""")
    d = sorted(tuple(r) for r in con.execute(
        dd.minhash_capture_curve_sql_duck()).fetchall())
    assert s == d


def test_bucket_cap_parity_and_planted_recall(spark):
    """The band-bucket skew cap (minhash_candidates max_bucket — the
    defense against the C(m,2) bucket tail that made a 10× corpus emit
    47× candidates on the sf1 probe): capped candidates are a subset of
    uncapped, high-jaccard planted pairs keep their capture floors under
    the cap (any of the other bands still finds them), and the capped
    form is hash-exact against its DuckDB twin built on the shared bands
    CTE."""
    import duckdb

    from omnition_opentelemetry_service_spark import registry
    from omnition_opentelemetry_service_spark.functions import text as tx

    rows = dd.planted_jaccard_rows(pairs_per_decile=50)
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    docs = (load(spark, SF, "documents").select("doc_id", "text")
            .unionByName(planted))
    sh = docs.select("doc_id", tx.char_shingles("text").alias("shingles"))
    sigs = dd.minhash_signatures_pandas(sh)
    cap_pairs = {(r.id_a, r.id_b) for r in dd.minhash_candidates(
        sigs, id_col="id", max_bucket=20).collect()}
    un_pairs = {(r.id_a, r.id_b) for r in dd.minhash_candidates(
        sigs, id_col="id").collect()}
    spark.catalog.clearCache()
    assert cap_pairs <= un_pairs

    # planted pair p (generator order) is (id_a, id_b) = (-(2p+2), -(2p+1));
    # decile index i covers pairs [i*50, (i+1)*50) for deciles 3+i
    def rate(i):
        return sum(1 for p in range(i * 50, (i + 1) * 50)
                   if (-(2 * p + 2), -(2 * p + 1)) in cap_pairs) / 50

    assert rate(5) >= 0.85  # jaccard 0.85: theory 0.948 uncapped
    assert rate(6) >= 0.97  # jaccard 0.95: theory 0.999 uncapped

    con = duckdb.connect()
    con.execute("CREATE TABLE planted (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", rows)
    con.execute(f"""CREATE VIEW documents AS
        SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')
        UNION ALL SELECT doc_id, text FROM planted""")
    d = {(a, b) for a, b in con.execute(
        dd.minhash_candidates_capped_sql_duck(
            registry._minhash_bands_sql(), 20)).fetchall()}
    assert cap_pairs == d
