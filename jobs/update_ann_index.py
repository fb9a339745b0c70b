"""spark-submit entrypoint for the ANN INDEX UPDATE (the FAISS-`add`
shape): encode a new embeddings drop with the index's STORED centroids +
codebooks — no retrain — and commit it as an idempotent delta batch dir
(pq.update_ann_index; writer-claimed atomic rename, redelivery-safe).
Serving (pq.search_ann_index) picks up committed deltas automatically.

Usage:

    python jobs/update_ann_index.py --index /tmp/ann_index \
        --embeddings /path/new_drop.parquet --batch-id 1 [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="index dir from jobs/build_ann_index.py")
    ap.add_argument("--embeddings", required=True,
                    help="parquet of (vec_id, embedding array<double>)")
    ap.add_argument("--batch-id", type=int, required=True,
                    help="monotone drop id; re-running the same id is a no-op")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    try:
        from omnition_opentelemetry_service_spark.operators import pq
    except ModuleNotFoundError:
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark.operators import pq
    from omnition_opentelemetry_service_spark.session import get_spark

    spark = get_spark(app_name="omnition-ann-update",
                      parallelism=args.parallelism)
    try:
        t0 = time.perf_counter()
        new_emb = spark.read.parquet(args.embeddings)
        rep = pq.update_ann_index(spark, args.index, new_emb, args.batch_id)
        rep["wall_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(rep))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
