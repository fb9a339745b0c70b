"""spark-submit entrypoint for the parse→enrich→route→aggregate pipeline.

Usage (the north rule's multi-executor packaging; on a real cluster swap
--master local[N] for the cluster master and add executor sizing):

    tools/package.sh                       # builds dist/omnition_spark.zip
    spark-submit --py-files dist/omnition_spark.zip \
        jobs/run_pipeline.py --config tests/testdata/pipeline_config.yaml

On the sandbox, the same file also runs directly:
    python jobs/run_pipeline.py --config ... [--parallelism 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="job spec YAML")
    ap.add_argument("--parallelism", type=int, default=None,
                    help="local[N] cores (ignored under a real cluster master)")
    ap.add_argument("--warehouse", default=None,
                    help="warehouse dir holding bucketed-receiver tables "
                         "(fixtures.materialize_input_bucketed)")
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on sys.path.
    # Direct `python jobs/run_pipeline.py` runs have neither the zip nor the
    # repo root on sys.path (python adds the script's own dir, jobs/) — fall
    # back to the script's parent only if the packaged import fails, so the
    # packaging smoke still proves the zip alone suffices.
    try:
        from omnition_opentelemetry_service_spark import fixtures
    except ModuleNotFoundError:
        import os

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from omnition_opentelemetry_service_spark import fixtures
    from omnition_opentelemetry_service_spark.plans import jobspec, pipeline
    from omnition_opentelemetry_service_spark.session import get_spark

    extra = ({"spark.sql.warehouse.dir": args.warehouse}
             if args.warehouse else None)
    spark = get_spark(app_name="omnition-pipeline",
                      parallelism=args.parallelism, extra_conf=extra)
    try:
        for job in jobspec.load_jobs(args.config):
            if job.config.input_db:
                # bucketed receiver: surface the catalog tables in THIS
                # session (table files + bucket metadata persist; the
                # in-memory catalog does not)
                fixtures.register_bucketed_input(spark,
                                                 db=job.config.input_db)
            t0 = time.perf_counter()
            res = pipeline.run_pipeline(spark, job.config)
            dt = time.perf_counter() - t0
            routed = sum(r.n_rows for r in res["sink_counts"])
            print(json.dumps({
                "pipeline": job.name,
                "routed_rows": routed,
                "rows_per_sec": round(routed / dt, 1),
                "wall_sec": round(dt, 3),
                "sink_counts": {r.sink: r.n_rows for r in res["sink_counts"]},
                "counters": [list(c) for c in res["counters"]],
            }))
            # logging-type exporters: deterministic debug sample to the
            # console (reference logging exporter, components.go:58)
            from omnition_opentelemetry_service_spark.operators.translate import (
                logging_sample,
            )

            for ename, espec in job.exporter_specs.items():
                if espec.get("type") == "logging":
                    k = int(espec.get("sample_k", 10))
                    # sample the sink THIS exporter is attached to (two
                    # logging exporters may debug two different sinks)
                    sink = espec.get("sink", "sink_logging")
                    for r in logging_sample(res["routed"], k=k,
                                            sink=sink).collect():
                        print(json.dumps({"exporter": ename, "sink": sink,
                                          "sample": r.asDict()}))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
