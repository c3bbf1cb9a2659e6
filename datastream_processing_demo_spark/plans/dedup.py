"""dedup plans (filled in incrementally)."""
