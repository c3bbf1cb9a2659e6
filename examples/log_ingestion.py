"""Log-broker-style ingestion with the `plog` custom DataSource — the
'switch from the reference' walkthrough for the Pulsar topology
(PulsarSource.java -> process -> CTSDBSink): produce into a partitioned
log, consume it LIVE with paced micro-batches and ack-on-commit, then
batch-backfill the same log for reprocessing.

    python examples/log_ingestion.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datastream_processing_demo_spark.session import EngineConfig, get_session
from datastream_processing_demo_spark.sources.plog import (
    PartitionedLogDataSource,
    PartitionedLogWriter,
    committed_acks,
)


def main() -> None:
    spark = get_session(EngineConfig(app_name="log-ingestion-example"))
    spark.dataSource.register(PartitionedLogDataSource)
    work = tempfile.mkdtemp(prefix="plog_example_")
    log_dir = os.path.join(work, "log")

    # 1. PRODUCE: 4-partition log, two producer rounds per partition
    #    (each append publishes a high-watermark + segment boundary)
    w = PartitionedLogWriter(log_dir, n_partitions=4)
    for rnd in range(2):
        for pid in range(4):
            w.append(pid, [(f"k{pid}-{rnd}-{i}",
                            json.dumps({"pid": pid, "round": rnd, "i": i}))
                           for i in range(5)])
    print("produced hwms:", {pid: w.hwm(pid)["n"] for pid in range(4)})

    # 2. CONSUME LIVE: paced stream (one producer round per trigger),
    #    running per-partition totals in complete mode
    src = (spark.readStream.format("plog")
           .option("path", log_dir).option("partitions", "4")
           .option("maxRoundsPerTrigger", "1").load())
    agg = src.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.max("offset").alias("max_offset"))
    q = (agg.writeStream.format("memory").queryName("plog_totals")
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    print("live per-partition totals:")
    spark.table("plog_totals").orderBy("partition").show()
    print("acked offsets (trail the checkpoint):", committed_acks(log_dir))

    # 3. BATCH BACKFILL: reprocess the whole log below the hwm —
    #    the bootstrap/reprocessing path next to the live stream
    backfill = (spark.read.format("plog")
                .option("path", log_dir).option("partitions", "4").load())
    parsed = backfill.select(
        "partition", "offset",
        F.get_json_object("value", "$.round").cast("int").alias("round"))
    print("backfill rows:", backfill.count())
    parsed.groupBy("round").count().orderBy("round").show()

    spark.stop()


if __name__ == "__main__":
    main()
