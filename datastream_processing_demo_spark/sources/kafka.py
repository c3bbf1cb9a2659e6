"""Kafka source builder — the production stand-in for the reference's
Pulsar source (SURVEY.md §2.1 S1: same log-offset semantics; Spark's
Kafka connector replaces checkpoint-coupled acks with offsets in the
WAL). No broker exists in the test environment, so tests cover the
option mapping only; the returned reader is the real thing on a
cluster.

Config mapping (reference property -> Kafka option):
  pulsar_topics (comma-split, DataStreamProcessingJob.java:140)
      -> `subscribe`
  pulsar_subscription / earliest start (PulsarSource.java:142-151)
      -> `startingOffsets` (checkpoint overrides after first run)
  pulsar_enable_resend nack redelivery (:199-211)
      -> WAL replay (automatic)
  source_parallelism (:121)
      -> `minPartitions` (split Kafka partitions into more Spark tasks)
  backpressure (README.md:19 compute-minimization advice)
      -> `maxOffsetsPerTrigger` (rate cap per micro-batch)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream_options(topics: str, bootstrap_servers: str,
                         starting_offsets: str = "earliest",
                         max_offsets_per_trigger: int | None = None,
                         min_partitions: int | None = None) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,  # comma-separated, like pulsar_topics
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def read_kafka_messages(spark: SparkSession, topics: str,
                        bootstrap_servers: str, **kwargs) -> DataFrame:
    """readStream from Kafka, deserialized to the pipeline's
    `value: string` shape (S2: bytes -> UTF-8,
    DataStreamProcessingJob.java:178-191 == one cast here)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(topics, bootstrap_servers,
                                     **kwargs).items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string").alias("value"))
