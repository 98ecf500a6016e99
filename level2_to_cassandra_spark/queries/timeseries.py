"""Time-series / market-data queries (OHLC bars, as-of) — filled in M2/M4."""
