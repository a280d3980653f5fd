"""Structured Streaming surface of the extraction engine."""
