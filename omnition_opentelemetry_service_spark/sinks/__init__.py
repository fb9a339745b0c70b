"""Sinks: manifest-committed parquet snapshot tables (Iceberg-style
semantics without the runtime jar) + per-sink writers."""
