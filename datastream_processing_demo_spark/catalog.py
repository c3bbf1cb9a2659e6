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

    `events.ts` has shipped as TIMESTAMP(NANOS), TIMESTAMP(MICROS) with a
    timezone, or (current generation) TIMESTAMP(MICROS) with *no* timezone
    across testdata generations. Normalize all three to Spark TIMESTAMP:

    - nanos: Spark has no nanos type; with `nanosAsLong` the column surfaces
      as a long we truncate to µs — exactly what DuckDB does reading the
      same file into its µs TIMESTAMP, so both engines see identical values.
      The conf is restored after the read so unrelated later reads of
      nanos parquet still error loudly instead of silently yielding longs.
    - µs no-tz: Spark 4 surfaces it as TIMESTAMP_NTZ, which `unix_millis`
      and friends reject. The session timezone is pinned to UTC
      (session.py), so a cast to TIMESTAMP is value-exact — and DuckDB's
      TIMESTAMP is naive anyway, so both engines still agree.
    - µs with tz: native TIMESTAMP, no conversion (keeps pushdown on `ts`).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # LongType here *should* mean TIMESTAMP(NANOS) surfaced via
            # nanosAsLong — but a file whose ts is plain INT64 (no
            # timestamp logical type) would look identical and dividing
            # it by 1000 would silently shift every value 1000×. Check
            # the parquet footer to be sure (ADVICE r1).
            import glob
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            # Typed check, not string equality: 'timestamp[ns, tz=UTC]'
            # (isAdjustedToUTC nanos) is just as legitimate as plain
            # 'timestamp[ns]'. For a directory-style dataset read the
            # footer of the first fragment (ADVICE r2).
            footer_path = table_path(sf_dir, name)
            if os.path.isdir(footer_path):
                frags = sorted(glob.glob(
                    os.path.join(footer_path, "**", "*.parquet"),
                    recursive=True))
                if not frags:
                    raise FileNotFoundError(
                        f"no parquet fragments under {footer_path!r}")
                footer_path = frags[0]
            footer_type = pq.read_schema(footer_path).field("ts").type
            if not (pa.types.is_timestamp(footer_type)
                    and footer_type.unit == "ns"):
                raise TypeError(
                    f"events.ts read as LongType but parquet footer says "
                    f"{footer_type!r}, not a nanosecond timestamp; "
                    f"refusing to guess a unit conversion")
            # Nanos file: the conf must stay set — execution-time planning
            # re-reads it when building the parquet reader.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # Not a nanos file: restore the conf so unrelated later reads of
            # nanos parquet error loudly instead of silently yielding longs.
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
            if isinstance(ts_type, TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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
