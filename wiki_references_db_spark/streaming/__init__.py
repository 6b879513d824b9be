"""Structured Streaming surface: incremental bundle ingest and windowed
event analytics."""
