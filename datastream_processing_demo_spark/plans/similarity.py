"""similarity plans (filled in incrementally)."""
