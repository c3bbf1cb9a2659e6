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


def compact_files(spark: SparkSession, src: str, dst: str,
                  target_rows_per_file: int) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    files of at most `target_rows_per_file` rows each; returns the output
    file count.

    The third layout lever at 100 TB: streaming sinks and per-task writes
    fragment tables into thousands of KB-sized files, and every later scan
    pays a task + footer + open per file. The rewrite uses the AQE
    REBALANCE hint rather than either naive spelling:
    - `coalesce(n)` is shuffle-free but inherits input skew — one giant
      input partition becomes one giant output file and a straggler task;
    - `repartition(n)` needs n chosen by hand, which is exactly what a
      100 TB pipeline can't do per-table per-day.
    REBALANCE lets AQE pick the partitioning from observed shuffle sizes
    (splitting skewed blocks, merging tiny ones); `maxRecordsPerFile`
    then hard-caps rows per output file regardless of partition shape.
    """
    df = spark.read.parquet(src)
    (df.hint("rebalance")
       .write.mode("overwrite")
       .option("maxRecordsPerFile", target_rows_per_file)
       .parquet(dst))
    # count output files filesystem-agnostically (ADVICE r9: a local
    # glob returns 0 on HDFS/S3 paths and misses partitioned subdirs);
    # inputFiles() walks the committed file listing on whatever
    # Hadoop filesystem `dst` resolves to, at metadata cost only
    return len(set(spark.read.parquet(dst).inputFiles()))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


_STATS_SESSIONS: dict[str, SparkSession] = {}


def _stats_session(spark: SparkSession) -> SparkSession:
    """One DSv2-configured stats session per SparkContext (ADVICE r4:
    a fresh newSession() per call accumulates session state on the
    shared context and is never released)."""
    key = spark.sparkContext.applicationId
    sess = _STATS_SESSIONS.get(key)
    if sess is None:
        sess = spark.newSession()
        sess.conf.set("spark.sql.sources.useV1SourceList", "")
        sess.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        # evict only entries whose context is dead — a blanket clear()
        # would thrash between two live contexts and recreate a session
        # per call, the exact accumulation the cache exists to prevent
        # (ADVICE r5)
        for k, s in list(_STATS_SESSIONS.items()):
            # the liveness probe itself goes through py4j — against a
            # torn-down gateway it raises instead of returning True, so
            # any failure to answer "am I alive?" counts as dead (ADVICE r6)
            try:
                dead = (s.sparkContext._jsc is None
                        or s.sparkContext._jsc.sc().isStopped())
            except Exception:
                dead = True
            if dead:
                del _STATS_SESSIONS[k]
        _STATS_SESSIONS[key] = sess
    return sess


def footer_stats(spark: SparkSession, path: str,
                 cols: tuple[str, ...] = ()) -> dict:
    """Table stats answered from parquet FOOTERS, not data pages:
    COUNT(*) plus per-column MIN/MAX through DSv2 aggregate pushdown
    (`PushedAggregation` in the scan). At 100 TB this turns a stat
    pass that would scan every row group into a footer walk — the
    lever behind fast row-count checks, split planning, and the
    freshness probes a training-data pipeline runs before each epoch.

    The two configs live in a dedicated `spark.newSession()` — SQL confs
    are per-session state over the shared SparkContext, so the stats
    read gets the DSv2 path while concurrent queries on the caller's
    session keep their v1 plans (mutate-and-restore on the shared
    session would silently flip any query analyzed inside the window;
    the default session keeps parquet on v1, which cannot push
    aggregates). MIN/MAX pushdown covers primitive numeric/string
    columns; on an unsupported type Spark silently falls back to a scan
    — same answer, no footer shortcut — so keep `cols` to plain
    columns. Statistics honesty: parquet writers may omit/invalidate
    stats (e.g. NaN columns); Spark's pushdown only fires where footer
    stats are trustworthy.
    """
    stats_session = _stats_session(spark)
    exprs = ["count(*) AS n_rows"]
    for c in cols:
        exprs += [f"min({c}) AS min_{c}", f"max({c}) AS max_{c}"]
    return (stats_session.read.parquet(path)
            .selectExpr(*exprs).collect()[0].asDict())
