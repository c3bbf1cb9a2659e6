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

Transport is injectable: an `http(s)://` endpoint posts via a
per-executor-process keep-alive connection cache; a filesystem path
spools request bodies to files (used by tests; also a reasonable
dead-letter pattern). The bulk body is assembled and posted
per-partition via `foreachPartition` — the data path never touches the
driver, matching the reference's parallel sink subtasks
(CTSDBSink.java:118-183 at sink_parallelism,
DataStreamProcessingJob.java:167). Doc ids are
`(batch_id, partition_id, ordinal)`: a WAL replay of a failed
micro-batch re-reads the same source files, so partition contents and
order recur and replays rewrite the same ids instead of duplicating.
"""

from __future__ import annotations

import http.client
import json
import os
import time
from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BULK_DROP_LITERAL = "error"  # CTSDBSink.java:120-123

# Per-process (i.e. per-executor-worker) keep-alive connection cache —
# the analogue of the reference's pooled HTTP client (CTSDBSink.java:98-106).
_CONN_CACHE: dict = {}


def _post_pooled(endpoint: str, body: str, timeout_s: float = 5.0,
                 retry_attempts: int = 3, backoff_s: float = 0.2,
                 auth_header: str | None = None) -> None:
    """POST via a cached keep-alive connection, retaining THIS chunk for
    in-task resend on transient failure.

    The reference sink keeps only the *failed* sub-batch and resends it
    on the next flush (ZhiYanSink.java:95-97,111) — earlier, already-
    acknowledged sub-batches are never retransmitted. The Spark analogue:
    a chunk that fails with a retryable signal (transport error, HTTP 429
    or 5xx) is posted up to `retry_attempts` times TOTAL with exponential
    backoff between attempts, executor-side, without touching the chunks
    that already succeeded. Only when the budget is exhausted (or the
    status is a non-retryable 4xx) does the task raise, falling back to
    the coarser WAL micro-batch replay — where idempotent `_id`s keep
    the endpoint exactly-once-effective.
    """
    u = urlparse(endpoint)
    key = (u.scheme, u.netloc)
    conn = _CONN_CACHE.get(key)
    last_err: str | Exception | None = None
    # One FREE immediate reconnect per call, outside the backoff budget
    # — but only when a POOLED connection existed to go stale (server
    # closed the idle keep-alive between micro-batches, the common
    # benign case; it must not sleep, and must survive retry_attempts=1,
    # which disables only the HTTP-level retain-retry). A fresh
    # connection that fails outright gets no freebie: a hard-down
    # endpoint should consume the budget, not double-hammer.
    free_reconnect = 1 if conn is not None else 0
    attempts_left = max(1, retry_attempts)
    n_backoffs = 0
    while True:
        if conn is None:
            cls = (http.client.HTTPSConnection if u.scheme == "https"
                   else http.client.HTTPConnection)
            conn = cls(u.netloc, timeout=timeout_s)
            _CONN_CACHE[key] = conn
        # The cached connection was built with the FIRST caller's
        # timeout; honor this call's value on the live socket too. Cached
        # connections live until the executor worker exits (keep-alive is
        # the point); the OS reaps them with the process.
        conn.timeout = timeout_s
        if conn.sock is not None:
            conn.sock.settimeout(timeout_s)
        try:
            headers = {"Content-Type": "application/x-ndjson"}
            if auth_header is not None:
                headers["Authorization"] = auth_header
            conn.request("POST", u.path or "/", body=body.encode("utf-8"),
                         headers=headers)
            resp = conn.getresponse()
            resp.read()
        except (http.client.HTTPException, OSError) as exc:
            # Transport error (stale keep-alive, refused, reset): rebuild
            # the connection and retry the same chunk.
            last_err = exc
            conn.close()
            _CONN_CACHE.pop(key, None)
            conn = None
            if free_reconnect > 0:
                free_reconnect -= 1
                continue
            attempts_left -= 1
            if attempts_left <= 0:
                break
            n_backoffs += 1
            time.sleep(backoff_s * (2 ** (n_backoffs - 1)))
            continue
        if resp.status in (429,) or resp.status >= 500:
            # Transient server-side failure: retain this chunk and retry
            # after backoff (reference retain-for-resend).
            last_err = f"HTTP {resp.status}"
            attempts_left -= 1
            if attempts_left <= 0:
                break
            n_backoffs += 1
            time.sleep(backoff_s * (2 ** (n_backoffs - 1)))
            continue
        if resp.status >= 300:
            # Non-retryable client error: raise immediately so the task
            # fails and Structured Streaming replays the micro-batch from
            # the WAL.
            raise IOError(f"bulk post failed: HTTP {resp.status}")
        return
    raise IOError(
        f"bulk post failed after {max(1, retry_attempts)} attempts: {last_err}")


class HttpBulkWriter:
    """Batched bulk writer with count-capped requests (A1/K1 analogue).

    batch_size mirrors the reference's ctsdb_batch_size (default 1000,
    DataStreamProcessingJob.java:157); the time threshold is subsumed by
    the micro-batch trigger cadence (SURVEY.md §2.1 A1 mapping).
    """

    def __init__(self, endpoint: str, batch_size: int = 1000,
                 retry_attempts: int = 3, backoff_s: float = 0.2,
                 user: str | None = None, passwd: str | None = None) -> None:
        self.endpoint = endpoint
        self.batch_size = batch_size
        # HTTP Basic auth (reference CTSDBSink.java builds the client
        # with ctsdb_user/ctsdb_passwd credentials on the _bulk POST;
        # config surface SURVEY.md §2.1). Precomputed driver-side: the
        # header is a plain string closure the executors reuse.
        if user is not None:
            import base64
            token = base64.b64encode(
                f"{user}:{passwd or ''}".encode("utf-8")).decode("ascii")
            self.auth_header: str | None = f"Basic {token}"
        else:
            self.auth_header = None
        # Chunk-level retain-retry budget (ZhiYanSink.java:95-97,111):
        # transient HTTP failures resend only the failed chunk in-task;
        # retry_attempts=1 disables and falls straight to WAL replay.
        self.retry_attempts = retry_attempts
        self.backoff_s = backoff_s
        self._is_http = endpoint.startswith(("http://", "https://"))

    def write_batch(self, tails: DataFrame, batch_id: int) -> None:
        # Close over plain values only — this function ships to executors.
        endpoint, batch_size, is_http = \
            self.endpoint, self.batch_size, self._is_http
        retry_attempts, backoff_s = self.retry_attempts, self.backoff_s
        auth_header = self.auth_header
        if not is_http:
            os.makedirs(endpoint, exist_ok=True)
            # A replay of this batch may partition differently than the
            # failed attempt (e.g. shuffle-partitions changed across
            # restarts), which would leave the first attempt's chunk
            # files for partition/chunk ids the replay never rewrites —
            # duplicated docs downstream. Clear the batch's spool files
            # driver-side before the executors write (ADVICE r2). The
            # HTTP path gets the same guarantee from _id-keyed upserts
            # only when partitioning is deterministic across attempts —
            # true for WAL file-replay (same files, same splits), which
            # is the supported replay mode.
            # the trailing * also catches .ndjson.tmp-{pid} orphans from
            # an attempt that died between open() and os.replace()
            import glob as _glob
            for stale in _glob.glob(
                    os.path.join(endpoint, f"bulk-{batch_id}-*.ndjson*")):
                os.remove(stale)

        def post_partition(rows) -> None:
            from pyspark import TaskContext
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            buf: list[str] = []
            chunk_no = 0

            def flush() -> None:
                nonlocal chunk_no
                if not buf:
                    return
                body = "\n".join(buf) + "\n"
                if is_http:
                    _post_pooled(endpoint, body,
                                 retry_attempts=retry_attempts,
                                 backoff_s=backoff_s,
                                 auth_header=auth_header)
                else:
                    # os.replace: a replayed batch overwrites its own chunk
                    # file atomically instead of appending a duplicate.
                    path = os.path.join(
                        endpoint, f"bulk-{batch_id}-{pid}-{chunk_no}.ndjson")
                    tmp = f"{path}.tmp-{os.getpid()}"
                    with open(tmp, "w", encoding="utf-8") as f:
                        f.write(body)
                    os.replace(tmp, path)
                buf.clear()
                chunk_no += 1

            for ordinal, row in enumerate(rows):
                buf.append(json.dumps(
                    {"_id": f"{batch_id}-{pid}-{ordinal}",
                     "doc": row["payload"]}))
                if len(buf) >= batch_size:
                    flush()
            flush()

        tails.filter(F.col("payload") != _BULK_DROP_LITERAL) \
            .select("payload").foreachPartition(post_partition)


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
