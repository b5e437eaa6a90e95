"""Time-series / event-stream queries (filled in incrementally)."""
