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

    `events.ts` has shipped as either TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
    parquet across testdata generations. Spark has no nanos type: with
    `nanosAsLong` it surfaces as a long we truncate to µs — exactly what
    DuckDB does reading the same file into its µs TIMESTAMP, so both
    engines see identical values. µs files read as native timestamps and
    need no conversion (and keep full pushdown on `ts`).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
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
