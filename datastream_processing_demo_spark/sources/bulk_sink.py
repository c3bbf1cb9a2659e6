"""Custom Python DataSource stream WRITER: the bulk-sink analogue of the
reference's CTSDB connector (CTSDBSink.java:42-231), as a first-class
Spark sink — `writeStream.format("bulk_spool")` — instead of the
foreachBatch wrapper in streaming/sinks.py (both are provided; this one
demonstrates the connector API with real commit/abort semantics).

Per micro-batch, Spark calls write(iterator) on EVERY partition (the
per-partition body assembly the reference approximates with its
buffered invoke(), :118-183), then commit(messages, batchId) once all
partitions succeed, or abort() if any fails — so a partially-posted
batch is re-run whole, matching Structured Streaming's at-least-once
replay. Doc ids are `{batch_id}-{partition}-{ordinal}` (idempotent —
replays overwrite, upgrading to effective exactly-once, the same
upgrade SCALE.md documents for the foreachBatch writer).

Rows with the literal payload 'error' are dropped (K1's error-drop,
CTSDBSink.java:120-123).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

_BULK_DROP_LITERAL = "error"


@dataclass
class _PartitionResult(WriterCommitMessage):
    partition_id: int
    n_docs: int
    body: str


class _BulkSpoolWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.spool_dir = options.get("path")
        if not self.spool_dir:
            raise ValueError("bulk_spool sink requires .option('path', dir)")
        self.value_col = options.get("valueColumn", "payload")

    def write(self, iterator: Iterator) -> _PartitionResult:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        docs = []
        for row in iterator:
            v = row[self.value_col]
            if v == _BULK_DROP_LITERAL:
                continue
            docs.append(v)
        lines = [json.dumps({"_id": f"p{pid}-{i}", "doc": d})
                 for i, d in enumerate(docs)]
        return _PartitionResult(partition_id=pid, n_docs=len(docs),
                                body="\n".join(lines))

    def commit(self, messages, batchId: int) -> None:
        # all partitions succeeded: publish ONE spool file per batch,
        # id-stamped so a replayed batch overwrites instead of appending
        os.makedirs(self.spool_dir, exist_ok=True)
        out = os.path.join(self.spool_dir, f"batch-{batchId:08d}.ndjson")
        bodies = []
        for m in messages:
            if m.n_docs:
                stamped = "\n".join(
                    json.dumps({**json.loads(line),
                                "_id": f"{batchId}-{json.loads(line)['_id']}"})
                    for line in m.body.splitlines())
                bodies.append(stamped)
        tmp = out + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(bodies))
        os.replace(tmp, out)  # atomic publish = the commit point

    def abort(self, messages, batchId: int) -> None:
        pass  # nothing was published; the whole batch re-runs


class BulkSpoolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bulk_spool"

    def streamWriter(self, schema, overwrite: bool):
        return _BulkSpoolWriter(self.options)
