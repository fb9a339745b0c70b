"""spark-submit entrypoint for the ANN INDEX BUILD: train the coarse
quantizer (distributed Lloyd's, operators/kmeans.py) and the PQ codebooks
(operators/pq.py) on an embeddings table, then encode the corpus and write
the searchable index:

    <out>/meta.json                 centroids + codebooks + params (tiny —
                                    index metadata, the only driver state)
    <out>/codes/cell=N/*.parquet    (id, codes) partitioned by coarse cell

A query node loads meta.json, picks its nprobe cells driver-side, and scans
ONLY those partitions (partition pruning on cell=) scoring M table lookups
per row — the IVF-PQ serving shape. The build itself is the documented
kmeans/pq cost envelope: every training exchange is bounded by index size
(k×dim, M×k×dim/M), the encode is one zero-shuffle scan, and the write's
only exchange is the repartition on cell.

Usage (sandbox; cluster: package with tools/package.sh + --py-files):

    python jobs/build_ann_index.py --embeddings /root/testdata/sf0.01/embeddings.parquet \
        --out /tmp/ann_index [--nlist 8] [--m 8] [--k-codes 16] \
        [--max-iter 5] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True,
                    help="parquet of (vec_id, embedding array<double>)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--nlist", type=int, default=8,
                    help="coarse cells (IVF nlist)")
    ap.add_argument("--m", type=int, default=8, help="PQ subspaces")
    ap.add_argument("--k-codes", type=int, default=16,
                    help="PQ codes per subspace")
    ap.add_argument("--max-iter", type=int, default=5)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    try:
        from omnition_opentelemetry_service_spark.operators import kmeans, pq
    except ModuleNotFoundError:
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark.operators import kmeans, pq
    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="omnition-ann-index",
                      parallelism=args.parallelism)
    try:
        t0 = time.perf_counter()
        emb = spark.read.parquet(args.embeddings)
        dim = len(emb.select("embedding").first()[0])

        cents, costs = kmeans.kmeans_train(
            emb, k=args.nlist, max_iter=args.max_iter, dim=dim, metric="l2")
        books = pq.pq_train(emb, m=args.m, k=args.k_codes,
                            max_iter=args.max_iter, dim=dim)

        # encode + assign in ONE scan (pq.assign_and_encode — the
        # ivf_pq_topk corpus shape), then the single exchange: repartition
        # on cell so each cell is one contiguous partition dir.
        coded = pq.assign_and_encode(emb, cents, books, dim=dim)
        (coded.repartition("cell")
         .write.mode("overwrite").partitionBy("cell")
         .parquet(os.path.join(args.out, "codes")))

        meta = {
            "dim": dim, "nlist": args.nlist, "m": args.m,
            "k_codes": args.k_codes,
            "train_costs": costs,
            "centroids": [[cid, vec] for cid, vec in cents],
            "codebooks": books,
        }
        tmp = os.path.join(args.out, ".meta.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(args.out, "meta.json"))

        n = spark.read.parquet(os.path.join(args.out, "codes")).count()
        print(json.dumps({
            "out": args.out, "rows": n, "dim": dim,
            "nlist": args.nlist, "m": args.m, "k_codes": args.k_codes,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
