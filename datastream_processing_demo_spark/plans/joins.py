"""joins plans (filled in incrementally)."""
