"""datastream_processing_demo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo HayaKus/datastream-processing-demo (a Flink 1.4 stream
demo: Pulsar source -> fixed-width parse/filter/route -> latency metric
-> batched HTTP sinks; see SURVEY.md), generalized to a full analytics
engine: relational core, joins, aggregations, window functions, set ops,
JSON/array/map functions, Structured Streaming with event-time windows,
and LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design stance (SURVEY.md §7.1): DataFrame/SQL only, Catalyst does the
optimizing, Pandas UDFs only where built-ins can't express the
semantics, every operator written for 100 TB scale discipline (no
collect() on data paths, broadcast only dimensions, watermarked state).
"""

__version__ = "0.1.0"
