"""Sources and sinks: NDJSON readers (batch + stream) and the managed-table
warehouse (Iceberg when the runtime jar is present, parquet otherwise)."""
