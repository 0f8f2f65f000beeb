"""Distributed operators: geometry (polygonize/dissolve), dedup, similarity,
idempotency — the pieces that aren't a single built-in DataFrame call."""
