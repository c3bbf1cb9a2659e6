"""udfs plans (filled in incrementally)."""
