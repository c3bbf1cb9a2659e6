"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``datastream_processing_demo_spark``; this file
just adapts the plan registry to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datastream_processing_demo_spark.plans.registry import (  # noqa: E402
    all_queries,
    ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    spec = all_queries()["q1_pricing_summary"]
    return spec.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2.

    Order is category-interleaved (registry.ordered_queries) so any prefix
    the driver checks samples every category; rows-only queries come last.
    """
    return {name: spec.spark for name, spec in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return {name: spec.oracle for name, spec in ordered_queries().items()
            if spec.oracle is not None}
