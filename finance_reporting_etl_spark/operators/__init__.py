"""Composed operators: dedup, similarity search, incremental merge,
relational patterns, multimodal column plumbing."""
