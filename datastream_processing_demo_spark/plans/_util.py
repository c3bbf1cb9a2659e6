"""Shared helpers for query plans.

## Float determinism (the top risk in SURVEY.md §7.4)

Double-precision SUM is order-dependent in its last bits, and Spark's
partial/final aggregation order differs from DuckDB's sequential scan, so
a naive `SUM(double)` would hash-mismatch. The testdata's money columns
are fixed-point values stored as double (prices: 2 decimals, discounts:
2 decimals), so we compute money aggregates EXACTLY:

    SUM(CAST(ROUND(expr * 10^k) AS BIGINT)) / 10^k

Per-row IEEE-754 arithmetic (*, +) on identical inputs is bit-identical
across engines; the rounded scaled value is an exact integer; integer
sums are order-independent; the single final division is one IEEE op.
Result: bit-identical doubles from Spark and DuckDB, no tolerance needed.

For genuinely-continuous outputs (stddev, ln/exp, cosine scores) we
ROUND(x, 6): the cross-engine noise is ~1e-12 relative, so a 1e-6
rounding grid flips only with negligible probability.

This costs nothing at scale — it's still a single map-side-combinable
hash aggregate over a bigint column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def exact_sum(expr: Column, decimals: int) -> Column:
    """Order-independent SUM of a fixed-point-valued double expression.

    Returns a double equal to sum(expr) computed exactly via scaled
    bigints. `decimals` = number of decimal digits the expression carries
    (price: 2; price*(1-disc): 4; price*(1-disc)*(1+tax): 6).
    """
    scale = 10 ** decimals
    return (F.sum(F.round(expr * scale).cast("long")).cast("double")
            / F.lit(float(scale)))


def oracle_exact_sum(expr_sql: str, decimals: int) -> str:
    """DuckDB SQL mirroring exact_sum()."""
    scale = 10 ** decimals
    return (f"CAST(SUM(CAST(ROUND(({expr_sql}) * {scale}) AS BIGINT)) AS DOUBLE)"
            f" / {float(scale)}")


def exact_avg(expr: Column, decimals: int) -> Column:
    """Order-independent AVG of a fixed-point-valued double expression.
    Two IEEE divisions, left-associated identically in the oracle."""
    scale = 10 ** decimals
    return (F.sum(F.round(expr * scale).cast("long")).cast("double")
            / F.lit(float(scale)) / F.count(F.lit(1)))


def oracle_exact_avg(expr_sql: str, decimals: int) -> str:
    scale = 10 ** decimals
    return (f"CAST(SUM(CAST(ROUND(({expr_sql}) * {scale}) AS BIGINT)) AS DOUBLE)"
            f" / {float(scale)} / COUNT(*)")
