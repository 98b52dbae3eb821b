"""Structured Streaming analogs of the incremental harvest semantics."""
