"""Composed stages: silver transform, gold aggregate, quality, pipeline."""
