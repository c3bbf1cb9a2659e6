"""Source connectors beyond parquet (SURVEY.md §2.2 source rows)."""
