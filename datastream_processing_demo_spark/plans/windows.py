"""windows plans (filled in incrementally)."""
