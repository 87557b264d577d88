"""Structured-streaming ingest (SURVEY §2.9, M4)."""
