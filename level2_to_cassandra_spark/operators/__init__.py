"""Library-level operators the DataFrame API lacks as one-liners:
as-of join, deterministic dedup, MinHash/SimHash near-dedup, similarity
search, text analysis, multimodal column plumbing."""
