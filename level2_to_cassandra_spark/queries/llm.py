"""LLM training-data pipeline queries (SURVEY.md §2 B11) — filled in M5."""
