"""Structured Streaming analogs of the batch operators."""
