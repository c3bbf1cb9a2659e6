"""multimodal plans (filled in incrementally)."""
