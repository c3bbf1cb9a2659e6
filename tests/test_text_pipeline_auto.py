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


def test_survivor_ceiling_forces_lsh_lane(spark):
    """ADVICE r11: the subsampled sum(df^2) is an estimator — an
    id-clustered duplicate corpus can under-sample hot shingles. The
    survivor COUNT(*) ceiling is the estimator-proof backstop: with a
    tiny ceiling the dispatch must go lsh even though the metric is
    far under the cap."""
    d = text_pipeline_lane_decision(spark, "/root/testdata/sf0.001",
                                    max_survivors=10)
    try:
        assert d["sum_df2"] <= d["cap"]          # metric alone says exact
        assert d["n_survivors"] > 10
        assert d["lane"] == "lsh"                # guard overrides
    finally:
        d["survivors"].unpersist()


def test_survivor_ceiling_mirrored_in_oracle(spark):
    """The oracle built with the same tiny ceiling must dispatch to the
    LSH branch too — its output equals the Spark LSH twin on a corpus
    whose metric would otherwise pick exact."""
    import duckdb

    from datastream_processing_demo_spark.catalog import (
        TABLE_NAMES,
        table_path,
    )
    from datastream_processing_demo_spark.plans.text import (
        _pipeline_auto_oracle,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{table_path(sf, t)}')")
    got = sorted(map(tuple, con.execute(
        _pipeline_auto_oracle(max_survivors=10)).fetchall()))
    want = _rows(text_pipeline_full_lsh(spark, sf))
    con.close()
    assert got == want


def test_full_auto_releases_survivors_cache(spark):
    """ADVICE r11: repeated headline invocations must not accumulate
    cached survivor blocks — after the lane returns, nothing from this
    query is left in the storage layer."""
    before = {r.id() for r in
              spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    text_pipeline_full_auto(spark, "/root/testdata/sf0.001").collect()
    after = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    leaked = [r for r in after if r.id() not in before]
    # the only allowed new entry is the localCheckpoint of the tiny
    # result frame itself (released when the DataFrame is GC'd);
    # survivor-scale caches must be gone
    assert all(r.numCachedPartitions() == 0 or r.memSize() < 1_000_000
               for r in leaked), [str(r) for r in leaked]
