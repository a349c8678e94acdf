"""Structured Streaming surface (additive — the reference has no true
streams, SURVEY §2.8; its 'incremental' mode is a filtered batch)."""
