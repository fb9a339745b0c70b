"""omnition_opentelemetry_service_spark — a PySpark-native rebuild of the
Omnition OpenTelemetry collector's receiver → processor → exporter pipeline
(reference: sunset3000/omnition-opentelemetry-service, read-only at
/root/reference) reframed as a batch parse → enrich → route → aggregate job
over tables of pre-tokenized training sequences.

Architecture (Spark-first, not a port):

- ``sources``   — parquet/snapshot scans + raw-payload parse branches
                  (receiver analogs, SURVEY.md §2.1)
- ``operators`` — enrich / route / sample / carry-forward / batcher /
                  memory-limiter gate / dedup / similarity (SURVEY.md §2.2-2.3)
- ``functions`` — column-level expression builders (grok parse, token
                  checksums, text analytics) kept JVM-side wherever possible
- ``plans``     — YAML pipeline config → staged DataFrame DAG with
                  checkpoint/resume (service.StartUnified analog)
- ``sinks``     — manifest-committed parquet snapshot writes (Iceberg-style
                  atomic commits; drop-in switch to real Iceberg when the
                  runtime jar is present)
- ``metrics``   — obsreport-analog counters + per-partition lineage

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
