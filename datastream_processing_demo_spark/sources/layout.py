"""Storage-layout writers: bucketed tables and partitioned directories
(SURVEY.md §4.2 — bucketing for co-located joins, partition pruning).

These are the two layout levers that matter at 100 TB:
- **Bucketing** pre-shuffles a table ONCE at write time; every later
  join/aggregation on the bucket key runs with zero exchange. A
  fact-fact join (lineitem ⋈ orders on orderkey) that would shuffle
  both sides every query becomes a local merge per bucket.
- **Partitioned directories** turn predicates on the partition column
  into directory pruning — the scan never opens non-matching files
  (PartitionFilters in the plan, vs PushedFilters which still reads
  row-group footers).

The reference has no storage layer at all (network-only I/O,
SURVEY.md §2.1.1), so this is engine capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(df: DataFrame, name: str, path: str, key: str,
                         buckets: int = 8) -> None:
    """Write `df` as a bucketed, per-bucket-sorted external parquet
    table. Joins/aggs on `key` against an equally-bucketed table then
    plan with no Exchange (asserted in tests/test_storage_layout.py)."""
    (df.write.mode("overwrite")
       .option("path", path)
       .bucketBy(buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(name))


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Write `df` partitioned by `partition_col` directories. Filters on
    that column prune at the directory level (PartitionFilters)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
