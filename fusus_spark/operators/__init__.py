"""Distributed operators: dedup, similarity search, text stats, alignment,
multimodal plumbing — the training-data-pipeline surface built on the
extraction engine's tables."""
