"""Rate source (SURVEY.md §2.2 stream-source row): the built-in
synthetic stream source works through the engine's projection path —
the test stand-in for a Kafka/Pulsar log source (semantic check)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_rate_source_through_projection(spark):
    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", 200).load())
    enriched = src.select(
        "timestamp", "value",
        (F.col("value") % 10).alias("bucket"),
    )
    q = (enriched.writeStream.format("memory").queryName("rate_sink")
         .outputMode("append").start())
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM rate_sink").collect()[0]["n"]
            if n >= 50:
                break
            time.sleep(0.5)
        assert n >= 50, f"rate source produced only {n} rows"
        row = spark.sql("SELECT * FROM rate_sink ORDER BY value LIMIT 1").collect()[0]
        assert row["bucket"] == row["value"] % 10
    finally:
        q.stop()


def test_console_sink_runs(spark):
    """Console sink smoke (§2.2 sink row): starts, emits a batch, stops."""
    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", 50).load())
    q = (src.writeStream.format("console")
         .option("numRows", 5).outputMode("append").start())
    try:
        deadline = time.time() + 20
        while time.time() < deadline and not q.recentProgress:
            time.sleep(0.5)
        assert q.recentProgress, "console sink never processed a batch"
    finally:
        q.stop()
