"""setops plans (filled in incrementally)."""
