"""Structured Streaming layer: the reference topology re-expressed
(source -> fixed-width parse -> route -> latency metric -> batched
sinks), plus event-time windows, watermarks, and stateful dedup that the
reference lacks (SURVEY.md §2.1.1) but the engine targets (§2.2)."""
