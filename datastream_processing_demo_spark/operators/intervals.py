"""Interval-overlap (range) join as a bucket equi-join.

OSS Spark compiles a pure interval predicate (p.ts BETWEEN i.start AND
i.end) to BroadcastNestedLoopJoin — O(points × intervals), unusable at
100 TB. This operator applies the standard range-join rewrite
explicitly (the same one Databricks' range-join optimization performs
from a hint): bin time into fixed-width buckets, explode each interval
to every bucket it covers, map each point to its single bucket, and
equi-join on the bucket id with the exact containment predicate kept
as a residual filter.

Correctness of the shape:
- a point has exactly ONE bucket, so a (point, interval) pair can match
  in at most one bucket — no post-join dedup pass is ever needed;
- the result is invariant to the bucket width (property-tested in
  tests/test_asof_components.py against the naive theta join) — width
  only tunes the interval-side blow-up (~span/width + 1 copies) vs the
  per-bucket pair density. Choose width near the median interval span
  (~2× blow-up); AQE's skew-join splitting handles hot buckets.

The reference has no joins (SURVEY §2.1.1); this is engine capability
over its event-stream data model (DataStreamProcessingJob.java:41-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def interval_overlap_join(points: DataFrame, intervals: DataFrame, *,
                          point_ts: str, start: str, end: str,
                          width_s: int = 3600,
                          how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    start <= point_ts < end (end-exclusive), via bucket equi-join.

    Returns points columns + intervals columns. Column names must be
    disjoint between the two sides (the join key is internal).
    Degenerate intervals (end <= start) match nothing and are dropped —
    with an outer `how` they will not appear as null-padded rows.
    """
    if width_s <= 0:
        raise ValueError(f"width_s must be positive, got {width_s}")
    w_us = F.lit(width_s * _US)
    p = points.withColumn(
        "_ivj_bucket", F.floor(F.unix_micros(F.col(point_ts)) / w_us))
    # degenerate intervals (end <= start) cover no instant under the
    # end-exclusive contract — drop them BEFORE the bucket explode:
    # their sequence(lo, hi) would be DESCENDING (hi < lo, the r5
    # corpus-fuzzer bug class) and emit phantom buckets
    intervals = intervals.filter(F.col(end) > F.col(start))
    i = intervals.withColumn(
        "_ivj_bucket",
        F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start)) / w_us),
            # end is exclusive: the last covered instant is end - 1µs
            F.floor((F.unix_micros(F.col(end)) - 1) / w_us))))
    pa, ia = p.alias("p"), i.alias("i")
    cond = ((F.col("p._ivj_bucket") == F.col("i._ivj_bucket"))
            & (F.col(f"p.{point_ts}") >= F.col(f"i.{start}"))
            & (F.col(f"p.{point_ts}") < F.col(f"i.{end}")))
    return (pa.join(ia, cond, how)
            .drop(F.col("p._ivj_bucket")).drop(F.col("i._ivj_bucket")))
