"""pipeline_batch plans (filled in incrementally)."""
