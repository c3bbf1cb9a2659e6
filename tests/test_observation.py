"""Observation API: metrics ride along an action with no second pass —
the engine-native analogue of the reference's sink-side avg metric
(ZhiYanSink.java:100-115 computed avg(delay) in the sink SDK; here the
same number is observed on the delay branch itself)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from datastream_processing_demo_spark.catalog import load_table
from datastream_processing_demo_spark.streaming.messages import messages_from_events
from datastream_processing_demo_spark.streaming.pipeline import split_branches


def test_observed_delay_metric_matches_golden(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    frozen_now = events.agg((F.max(F.unix_millis("ts")) + 60000).alias("v")) \
        .collect()[0]["v"]
    branches = split_branches(messages_from_events(events),
                              now_ms=F.lit(frozen_now))

    obs = Observation("delay_metrics")
    observed = branches.delays.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("delay_ms").alias("total_delay"))
    observed.write.format("noop").mode("overwrite").save()

    golden = branches.delays.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("delay_ms").alias("total_delay")).collect()[0]
    assert obs.get["n"] == golden["n"]
    assert obs.get["total_delay"] == golden["total_delay"]
