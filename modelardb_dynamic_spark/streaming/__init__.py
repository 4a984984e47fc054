"""Structured Streaming ingestion (the reference's online mode)."""
