"""Structured Streaming layer: ingest (reference ETL parity), event-time
windows with watermarks, streaming dedup, arbitrary stateful processing."""
