"""Custom Python DataSource: fixed-width message generator
(SURVEY.md §2.1 S1 — the reference ships a custom Flink connector,
PulsarSource.java:22-214; this is the engine's counterpart built on
Spark 4's Python DataSource API).

Produces the reference's wire format (64-byte header + payload,
DataStreamProcessingJob.java:47-63) deterministically from a row index,
so any offset range can be regenerated bit-identically:

- batch reader: N rows split over P independent partitions (the
  `source_parallelism` knob of the reference, :121);
- stream reader: offset = row index. Replaying [start, end) after a
  failure yields the SAME rows — the property the reference gets from
  checkpoint-coupled Pulsar acks (PulsarSource.java:79-118), here for
  free from deterministic generation + the offset log.

Every ~97th message is structurally invalid (len<=64) and every ~101st
carries the literal payload 'error', so the parse guard (P2) and the
sink error-drop (K1, CTSDBSink.java:120-123) stay exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType([StructField("value", StringType(), True)])

BASE_SEND_MS = 1_700_000_000_000  # fixed epoch base => reproducible runs


def message_at(i: int, base_ms: int = BASE_SEND_MS) -> str:
    """Deterministic fixed-width message for global row index i."""
    module = "session" if i % 3 != 0 else "other"
    send_ms = base_ms + i * 1000
    if i % 97 == 0:
        payload = ""          # structurally invalid (length == 64)
    elif i % 101 == 0:
        payload = "error"     # dropped by the bulk sink (K1)
    else:
        payload = f'{{"k": {i}}}'
    return f"{module:<16}{send_ms:<16}{' ' * 32}{payload}"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 4))

    def partitions(self):  # type: ignore[override]
        step = (self.rows + self.n_partitions - 1) // self.n_partitions
        return [_RangePartition(s, min(s + step, self.rows))
                for s in range(0, self.rows, step)]

    def read(self, partition: _RangePartition) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield (message_at(i),)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = next global row index. Deterministic regeneration makes
    replay of any committed range idempotent (effective exactly-once
    into a transactional/file sink)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 10_000))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return (iter([(message_at(i),) for i in range(lo, hi)]),
                {"index": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(message_at(i),)
                     for i in range(start["index"], end["index"])])

    def commit(self, end: dict) -> None:
        pass  # nothing to ack: regeneration replaces the reference's
              # un-acked-message redelivery (PulsarSource.java:199-211)


class FixedWidthMessagesDataSource(DataSource):
    """spark.dataSource.register(FixedWidthMessagesDataSource), then
    spark.read/readStream.format("fixedwidth_messages")."""

    @classmethod
    def name(cls) -> str:
        return "fixedwidth_messages"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)
