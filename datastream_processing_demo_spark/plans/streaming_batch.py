"""streaming_batch plans (filled in incrementally)."""
