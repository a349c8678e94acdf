"""Composite operators: dedup sketches, similarity search, metric runner."""
