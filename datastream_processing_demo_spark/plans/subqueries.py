"""Subquery forms + NULL semantics — SQL-surface families beyond plain
SELECT blocks: scalar subqueries, IN/NOT IN subqueries, correlated
EXISTS, HAVING, and NULL behavior in aggregates/joins/sorts (the
testdata ships NULL-free, so NULLs are synthesized with nullif).

Catalyst decorrelates these into joins/aggregates (SURVEY.md §4.2 —
subquery decorrelation is free); the audit is that they produce exact
oracle matches, not hand-rolled rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views
from ._util import t
from .registry import query


@query(
    "subq_scalar", "subqueries",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                                       AS DOUBLE) / 100.0 / COUNT(*) FROM orders)
               AS diff_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                                      AS DOUBLE) / 100.0 / COUNT(*) FROM orders) * 1.5
    """,
    description="scalar subquery in projection and predicate",
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                                           AS DOUBLE) / 100.0 / COUNT(*) FROM orders)
                   AS diff_from_avg
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                                          AS DOUBLE) / 100.0 / COUNT(*) FROM orders) * 1.5
    """)


@query(
    "subq_in_having", "subqueries",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    GROUP BY l_suppkey
    HAVING COUNT(*) > 50
    """,
    description="IN subquery + HAVING",
)
def subq_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql("""
        SELECT l_suppkey, COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
        GROUP BY l_suppkey
        HAVING COUNT(*) > 50
    """)


@query(
    "subq_correlated_exists", "subqueries",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
    ) AND o.o_orderstatus = 'F'
    """,
    description="correlated EXISTS (TPC-H Q4 shape; decorrelated to semi join)",
)
def subq_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql("""
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
        ) AND o.o_orderstatus = 'F'
    """)


@query(
    "subq_correlated_scalar", "subqueries",
    oracle="""
    SELECT c_custkey, c_acctbal,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
               AS n_orders
    FROM customer c
    WHERE c_acctbal > 9500
    """,
    description="correlated scalar subquery (per-row count)",
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT c_custkey, c_acctbal,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
                   AS n_orders
        FROM customer c
        WHERE c_acctbal > 9500
    """)


@query(
    "null_semantics", "subqueries",
    oracle="""
    WITH withnulls AS (
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_n,
               CASE WHEN o_totalprice > 400000 THEN NULL
                    ELSE o_totalprice END AS price_n
        FROM orders
    )
    SELECT status_n,
           COUNT(*) AS n_rows,
           COUNT(price_n) AS n_nonnull,
           CAST(SUM(CAST(ROUND(price_n * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_price_n,
           COUNT(*) - COUNT(price_n) AS n_null
    FROM withnulls
    GROUP BY status_n
    ORDER BY status_n ASC NULLS FIRST
    """,
    description="NULL semantics: count vs count(col), sum-skips-nulls, NULL group key, NULLS FIRST",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    withnulls = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n"),
        F.when(F.col("o_totalprice") > 400000, F.lit(None))
            .otherwise(F.col("o_totalprice")).alias("price_n"),
    )
    return (
        withnulls.groupBy("status_n")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("price_n").alias("n_nonnull"),
            (F.sum(F.round(F.col("price_n") * 100).cast("long")).cast("double")
             / 100.0).alias("sum_price_n"),
            (F.count(F.lit(1)) - F.count("price_n")).alias("n_null"),
        )
        .orderBy(F.col("status_n").asc_nulls_first())
    )


@query(
    "subq_lateral_topn", "subqueries",
    oracle="""
    SELECT n.n_name, top.s_suppkey, top.s_name, top.s_acctbal
    FROM nation n,
         LATERAL (SELECT s_suppkey, s_name, s_acctbal
                  FROM supplier s
                  WHERE s.s_nationkey = n.n_nationkey
                  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) top
    """,
    description="LATERAL correlated subquery (top-2 suppliers per nation)",
)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation", "supplier"))
    return spark.sql("""
        SELECT n.n_name, top.s_suppkey, top.s_name, top.s_acctbal
        FROM nation n,
             LATERAL (SELECT s_suppkey, s_name, s_acctbal
                      FROM supplier s
                      WHERE s.s_nationkey = n.n_nationkey
                      ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) top
    """)
