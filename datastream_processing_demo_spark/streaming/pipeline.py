"""The reference topology, Spark-first: one enriched frame, three
branches, single-pass multi-sink write.

Reference (DataStreamProcessingJob.java:41-66,149-173): a ProcessFunction
emits every record to the main output, and for valid `session` messages
emits the payload tail to `session-output` and a derived latency
(`now_ms - send_ts_ms`) to `zhiyan-output`; the three streams feed a
passthrough, a CTSDB HTTP bulk sink, and a ZhiYan avg-metric sink.

Spark has no side outputs (SURVEY.md §7.4): the idiom here is compute
the parsed frame ONCE per micro-batch, `persist()` it inside
`foreachBatch`, and derive the three branches as filtered projections —
same single-pass guarantee as the reference's ProcessFunction, with
Structured Streaming's checkpoint/WAL replacing checkpoint-coupled acks
(at-least-once end-to-end, matching the reference's real guarantee —
SURVEY.md §3.3).

Scale notes: the branches are narrow projections of one scan — no
shuffle anywhere in the hot path; sinks batch per partition (the
reference's count-or-time buffering maps to micro-batch cadence +
per-request size caps in the writers).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import SESSION_MODULE
from .messages import parse_messages
from .sinks import HttpBulkWriter, MetricAvgReporter


@dataclass(frozen=True)
class Branches:
    """The three outputs of the reference's ProcessFunction (R1)."""
    main: DataFrame            # every raw record (passthrough, :44)
    session_tails: DataFrame   # payload of valid session messages (:57)
    delays: DataFrame          # derived latency of session messages (:58-63)


def split_branches(raw: DataFrame, now_ms: Column | None = None) -> Branches:
    """Single logical pass: parse once, branch by projection.

    `now_ms` injects a frozen processing-time for deterministic tests;
    production uses the wall clock exactly like the reference
    (System.currentTimeMillis at DataStreamProcessingJob.java:58).
    """
    if now_ms is None:
        now_ms = F.unix_millis(F.current_timestamp())
    parsed = parse_messages(raw)
    session = parsed.filter(F.col("module_name") == SESSION_MODULE)  # P4 (:55)
    tails = session.select("payload")
    delays = session.filter(F.col("send_ts_ms").isNotNull()).select(
        F.col("send_ts_ms"),
        (now_ms - F.col("send_ts_ms")).alias("delay_ms"),            # P6 (:58-61)
    )
    return Branches(main=raw.select("value"), session_tails=tails, delays=delays)


def run_pipeline_stream(
    raw_stream: DataFrame,
    checkpoint_dir: str,
    main_out_dir: str,
    bulk_writer: HttpBulkWriter,
    metric_reporter: MetricAvgReporter,
    now_ms: Column | None = None,
    trigger: dict | None = None,
    name: str = "datastream-pipeline",
) -> StreamingQuery:
    """Wire the streaming job: one foreachBatch doing all three writes.

    The micro-batch is persisted so the source is read once per trigger
    (the reference's single-pass guarantee); `batch_id` gives sinks an
    idempotency handle (SURVEY.md §3.3: replayed batch => same id).
    """

    def write_all(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            b = split_branches(batch_df, now_ms=now_ms)
            b.main.write.mode("append").parquet(main_out_dir)
            bulk_writer.write_batch(b.session_tails, batch_id)
            metric_reporter.report_batch(b.delays, batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        raw_stream.writeStream.foreachBatch(write_all)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(name)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
