"""json_array plans (filled in incrementally)."""
