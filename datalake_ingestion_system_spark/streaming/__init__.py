"""Structured Streaming ingestion & windowed aggregation."""
