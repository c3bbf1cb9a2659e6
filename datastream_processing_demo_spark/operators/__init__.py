"""Reusable engine operators beyond built-in Spark surface: text
analysis, near-duplicate detection, similarity search, multimodal
column plumbing (the LLM-data-pipeline extensions of SURVEY.md §2.2).

Everything is expression-composition first (JVM, codegen'd); Python
touches data only in the explicitly-marked pandas-UDF paths.
"""
