"""Structured Streaming wrappers for the CDC pipeline."""
