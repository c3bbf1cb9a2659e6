"""Catalog type normalization (VERDICT r1 #1): `events.ts` must surface
as TIMESTAMP for every shipped testdata generation — TIMESTAMP(NANOS),
TIMESTAMP(MICROS) with tz, and TIMESTAMP(MICROS) no-tz (Spark 4 reads
the last as TIMESTAMP_NTZ, which `unix_millis` and every pipeline query
reject).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from datastream_processing_demo_spark.catalog import load_table

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
           if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), \
        f"{sf_dir}: events.ts must normalize to TIMESTAMP, " \
        f"got {df.schema['ts'].dataType}"
    # unix_millis is the canonical consumer that rejects NTZ — it must run
    row = df.select(F.unix_millis("ts").alias("ms")).first()
    assert row["ms"] > 1_500_000_000_000  # sane epoch-millis magnitude


def test_nanos_conf_restored_after_micros_read(spark):
    """Reading a µs file must not leave nanosAsLong set session-wide
    (ADVICE r1: later nanos reads should error loudly, not yield longs)."""
    prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    load_table(spark, SF_DIRS[0], "events")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    if prior is not None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
