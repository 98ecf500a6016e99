"""Join queries (SURVEY.md §2 B3) — filled in M2."""
