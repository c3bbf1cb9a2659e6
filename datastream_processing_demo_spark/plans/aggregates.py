"""aggregates plans (filled in incrementally)."""
