"""CSV/JSON file sources with explicit schemas (SURVEY.md §2.2
"CSV / JSON scan with schema").

The driver testdata ships parquet only, so these readers are exercised
against deterministic CSV/JSON copies materialized once per (sf, table)
under a cache dir — written by Spark itself, read back with the
explicit schema (never inference: at 100 TB schema inference is a full
extra pass).

The reference's only sources are network ones (Pulsar; SURVEY.md
§2.1.1 notes zero file-format scans), so this is engine capability.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..schemas import TABLE_SCHEMAS

CACHE_ROOT = "/tmp/spark_graft_file_sources"


def _cache_dir(sf_dir: str, name: str, fmt: str) -> str:
    tag = sf_dir.rstrip("/").replace("/", "_")
    return os.path.join(CACHE_ROOT, tag, f"{name}.{fmt}")


def _materialize(spark: SparkSession, sf_dir: str, name: str, fmt: str) -> str:
    """Write the parquet table as CSV/JSON once (idempotent via _SUCCESS)."""
    out = _cache_dir(sf_dir, name, fmt)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = load_table(spark, sf_dir, name)
        writer = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", "true").csv(out)
        elif fmt == "orc":
            writer.orc(out)
        else:
            writer.json(out)
    return out


def read_csv_with_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = _materialize(spark, sf_dir, name, "csv")
    return (spark.read.schema(TABLE_SCHEMAS[name])
            .option("header", "true").csv(path))


def read_json_with_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = _materialize(spark, sf_dir, name, "json")
    return spark.read.schema(TABLE_SCHEMAS[name]).json(path)


def read_orc(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """ORC scan. Unlike CSV/JSON the schema comes from the ORC footer
    (exact types, no inference pass); ORC gets the same pushdown/
    pruning treatment as parquet from the vectorized reader."""
    path = _materialize(spark, sf_dir, name, "orc")
    return spark.read.orc(path)
