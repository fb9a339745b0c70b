"""Incremental batch-vs-history dedup (operators/incremental.py), verified
value-level against DuckDB twins — the same cross-engine contract as the
driver's oracle gate, run in-suite (the 50-slot window is full)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import incremental as inc


def _history_rows():
    return [(i, f"history document number {i} with some shared words "
                f"about topic {i % 7} and filler text segment {i * 3}")
            for i in range(40)]


def _batch_rows():
    hist = dict(_history_rows())
    rows = []
    # 100-104: exact dups of history 0-4 (extra whitespace — normalization
    # must still collapse them onto the same fingerprint).
    for i in range(5):
        rows.append((100 + i, hist[i].replace(" with", "  with")))
    # 105-107: near-dups of history 10-12 (tiny suffix edit).
    for i in range(3):
        rows.append((105 + i, hist[10 + i] + " xx"))
    # 108-109: within-batch exact dups of each other (new text).
    rows.append((108, "a brand new pair of duplicate documents in the drop"))
    rows.append((109, "a brand new pair of duplicate documents in the drop"))
    # 110: NULL text (sentinel fingerprint path).
    rows.append((110, None))
    # 111-115: fresh.
    for i in range(5):
        rows.append((111 + i, f"completely fresh content {i} nothing like "
                              f"anything retained before {i * 17}"))
    return rows


@pytest.fixture(scope="module")
def frames(spark):
    hist_docs = spark.createDataFrame(_history_rows(), "doc_id long, text string")
    batch_docs = spark.createDataFrame(_batch_rows(), "doc_id long, text string")
    history = inc.signature_store(hist_docs).persist()
    history.count()
    yield hist_docs, batch_docs, history
    history.unpersist()
    spark.catalog.clearCache()


def _duck_con():
    con = duckdb.connect()
    con.register("hist_docs", pd.DataFrame(_history_rows(),
                                           columns=["doc_id", "text"]))
    con.register("batch_docs", pd.DataFrame(_batch_rows(),
                                            columns=["doc_id", "text"]))
    return con


def test_signature_store_matches_duckdb(spark, frames):
    _, batch_docs, _ = frames
    s = (inc.signature_store(batch_docs).orderBy("id")
         .toPandas().reset_index(drop=True))
    d = _duck_con().execute(
        inc.signature_store_sql_duck("batch_docs") + " ORDER BY id"
    ).fetch_df()
    assert list(s.columns) == list(d.columns)
    assert s["fp"].tolist() == d["fp"].tolist()
    assert s["fpb"].tolist() == d["fpb"].tolist()
    def _as_list(v):
        if v is None:
            return None
        if isinstance(v, (list, tuple)):
            return [int(x) for x in v]
        if hasattr(v, "tolist"):  # numpy array from either engine
            return [int(x) for x in v.tolist()]
        return None if pd.isna(v) else [int(v)]

    for a, b in zip(s["minhash"], d["minhash"]):
        assert _as_list(a) == _as_list(b)


def test_exact_survivors_drop_history_and_within_batch_dups(spark, frames):
    _, batch_docs, history = frames
    bstore = inc.signature_store(batch_docs)
    out = inc.batch_exact_survivors(bstore, history)
    ids = sorted(r.id for r in out.select("id").collect())
    # 100-104 are exact dups of history; 109 is a within-batch dup of 108;
    # the NULL-text doc (110) must survive (sentinel fp never matches).
    assert ids == [105, 106, 107, 108, 110, 111, 112, 113, 114, 115]


def test_bucket_pruning_matches_unpruned_and_prunes_scan(spark, frames, tmp_path):
    _, batch_docs, history = frames
    store_path = str(tmp_path / "sigstore")
    inc.write_signature_store(history, store_path)
    hist_disk = inc.read_signature_store(spark, store_path)
    bstore = inc.signature_store(batch_docs).persist()
    buckets = inc.batch_bucket_list(bstore)
    assert 0 < len(buckets) <= inc.FP_BUCKETS
    pruned = inc.batch_exact_survivors(bstore, hist_disk, prune_buckets=buckets)
    full = inc.batch_exact_survivors(bstore, hist_disk)
    assert (sorted(r.id for r in pruned.select("id").collect())
            == sorted(r.id for r in full.select("id").collect()))
    # the fpb IN (...) predicate must reach the scan as a PARTITION filter
    # (fpb is the store's partition column → partition pruning, not a
    # post-scan row filter).
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "fpb" in plan
    bstore.unpersist()


def test_incremental_near_dups_matches_duckdb(spark, frames):
    _, batch_docs, history = frames
    bstore = inc.signature_store(batch_docs)
    out = inc.incremental_near_dups(bstore, history, est_threshold=0.5)
    s = (out.orderBy("id_b", "id_h").toPandas().reset_index(drop=True))
    d = _duck_con().execute(
        inc.incremental_near_dups_sql_duck(
            inc.signature_store_sql_duck("batch_docs"),
            inc.signature_store_sql_duck("hist_docs"), 0.5)
        + " ORDER BY id_b, id_h").fetch_df()
    assert s["id_b"].tolist() == d["id_b"].tolist()
    assert s["id_h"].tolist() == d["id_h"].tolist()
    assert (s["est_jaccard"] - d["est_jaccard"]).abs().max() < 1e-9
    # non-vacuous: the planted near-dups are found with their true partners;
    # exact dups (100-104) also hit by signature (est ~1.0), fresh docs don't.
    pairs = set(zip(s["id_b"], s["id_h"]))
    assert {(105, 10), (106, 11), (107, 12)} <= pairs
    assert all(b not in range(111, 116) for b, _ in pairs)


def test_incremental_dedup_end_to_end_and_append(spark, frames, tmp_path):
    _, batch_docs, history = frames
    store_path = str(tmp_path / "store2")
    inc.write_signature_store(history, store_path)
    hist_disk = inc.read_signature_store(spark, store_path)
    survivors, near = inc.incremental_dedup(batch_docs, hist_disk)
    ids = sorted(r.id for r in survivors.select("id").collect())
    # exact dups (100-104, 109) and near-dups (105-107) gone; NULL doc,
    # the first of the within-batch pair, and fresh docs remain.
    assert ids == [108, 110, 111, 112, 113, 114, 115]
    assert near.count() > 0
    # advance history; reprocessing the SAME drop yields zero survivors
    # (every doc is now an exact dup of the appended store rows).
    inc.append_signature_store(survivors, store_path)
    hist2 = inc.read_signature_store(spark, store_path)
    survivors2, _ = inc.incremental_dedup(batch_docs, hist2)
    assert survivors2.count() == 0
    spark.catalog.clearCache()


def test_near_join_is_broadcast_no_cartesian(spark, frames):
    _, batch_docs, history = frames
    bstore = inc.signature_store(batch_docs)
    plan = (inc.incremental_near_dups(bstore, history)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
