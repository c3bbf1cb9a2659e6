"""Composed-pipeline scale dispatch (VERDICT r9 task #4).

Pins: the sum(df^2) lane decision at the driver-gate SFs (exact) and at
sf0.1 (lsh), and that the auto lane's output is byte-identical to the
twin the decision names — so the dispatch can never silently produce a
third result.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.plans.text import (
    EXACT_NEARDUP_POSTING_CAP,
    text_pipeline_full,
    text_pipeline_full_auto,
    text_pipeline_full_lsh,
    text_pipeline_lane_decision,
)


def test_lane_decision_flips_at_the_measured_crossover(spark):
    # gate corpora sit well under the cap; sf0.1 well over — a cap edit
    # that flips either side should fail loudly here
    d001 = text_pipeline_lane_decision(spark, "/root/testdata/sf0.001")
    d01 = text_pipeline_lane_decision(spark, "/root/testdata/sf0.01")
    d1 = text_pipeline_lane_decision(spark, "/root/testdata/sf0.1")
    assert d001["lane"] == "exact" and d01["lane"] == "exact"
    assert d1["lane"] == "lsh"
    assert d01["sum_df2"] < EXACT_NEARDUP_POSTING_CAP < d1["sum_df2"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_auto_equals_named_twin_both_sides(spark):
    # exact side (sf0.01)
    sf = "/root/testdata/sf0.01"
    assert _rows(text_pipeline_full_auto(spark, sf)) == \
        _rows(text_pipeline_full(spark, sf))
    # lsh side (sf0.1)
    sf = "/root/testdata/sf0.1"
    assert _rows(text_pipeline_full_auto(spark, sf)) == \
        _rows(text_pipeline_full_lsh(spark, sf))
