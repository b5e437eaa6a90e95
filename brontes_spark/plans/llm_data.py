"""LLM-data-pipeline queries (filled in incrementally)."""
