"""Table catalog: parquet loaders + temp-view registration.

Scans are plain `spark.read.parquet` so Catalyst gets predicate pushdown,
column pruning and partition pruning for free (SURVEY.md §4.2) — never
wrap scans in anything that would hide the file source from the planner.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Schema comes from the parquet footer (exact types,
    no inference cost); schemas.py documents the expected shape.

    `events.ts` is TIMESTAMP(NANOS) parquet, which Spark has no native
    type for: we read it as a long (legacy nanosAsLong) and truncate to
    microseconds — exactly what DuckDB does when it reads the same file
    into its µs TIMESTAMP, so both engines see identical values. The
    conversion costs pushdown on `ts` (it becomes a derived column);
    at scale you'd re-encode the source to µs parquet instead.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        from pyspark.sql import functions as F
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Register every table as a temp view so plans can use spark.sql."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
