"""text plans (filled in incrementally)."""
