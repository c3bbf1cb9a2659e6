"""Watermark late-data semantics (SURVEY.md §2.2 'watermark + late-data
drop'): once the watermark passes a window's end AND its state has been
evicted, late rows for that window are dropped — the finalized window is
emitted exactly once with only its on-time contents.

Note the one-batch lag (observed Spark behavior): eviction and the
late-row filter both act on the watermark derived from the PREVIOUS
batch's max event time, so the stream needs two advancing batches after
a window closes before late rows are provably dropped.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.schemas import EVENTS
from datastream_processing_demo_spark.streaming.windows import tumbling_counts


def _events(ids, ts_list):
    return pd.DataFrame({
        "event_id": ids,
        "ts": pd.to_datetime(ts_list).astype("datetime64[us]"),
        "user_id": [1] * len(ids),
        "event_type": ["click"] * len(ids),
        "value": [1.0] * len(ids),
        "props": ['{"k": 1}'] * len(ids),
    })


def _write(pdf, d, name):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, name), coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    time.sleep(1.1)  # distinct mtimes => deterministic file order


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    d = str(tmp_path / "late_stream")
    # batch 0: 3 on-time events in day-1 window [00:00, 06:00)
    _write(_events([1, 2, 3], ["2024-03-01 01:00:00", "2024-03-01 02:00:00",
                               "2024-03-01 03:00:00"]), d, "a-early.parquet")
    # batches 1-2: advance event time two days out — watermark (1h delay)
    # passes the day-1 window end; its state is evicted and emitted
    _write(_events([4], ["2024-03-03 12:00:00"]), d, "b-advance.parquet")
    _write(_events([7], ["2024-03-04 12:00:00"]), d, "c-advance2.parquet")
    # batch 3: LATE arrivals for the already-finalized day-1 window
    _write(_events([5, 6], ["2024-03-01 01:30:00", "2024-03-01 04:00:00"]),
           d, "d-late.parquet")

    src = (spark.readStream.schema(EVENTS)
           .option("maxFilesPerTrigger", 1).parquet(d))
    q = (tumbling_counts(src, width="6 hours", watermark="1 hour")
         .writeStream.format("memory").queryName("late_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(timeout=120)

    day1 = [r for r in spark.sql("SELECT * FROM late_sink").collect()
            if r["window_start"].isoformat() == "2024-03-01T00:00:00"]
    # exactly one emission, containing ONLY the on-time events
    assert len(day1) == 1 and day1[0]["n_events"] == 3, day1
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress if p["stateOperators"])
    assert dropped >= 1, "watermark filter never dropped a late row"
