"""Set operations + global sort/limit (SURVEY.md §2.2 set-op and
sort/limit rows; absent from the reference — §2.1.1).

Determinism: every LIMIT is preceded by a full-tiebreak ORDER BY so the
selected row set is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "setop_union_all", "setops",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS entity_key, 'customer' AS kind FROM customer
    UNION ALL
    SELECT CAST(s_suppkey AS BIGINT) AS entity_key, 'supplier' AS kind FROM supplier
    """,
    description="UNION ALL (bag union) of two projections",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("entity_key"),
        F.lit("customer").alias("kind"))
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("entity_key"),
        F.lit("supplier").alias("kind"))
    return c.unionAll(s)


@query(
    "setop_union_distinct", "setops",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    description="UNION (distinct) — dedup across inputs",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect", "setops",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    description="INTERSECT (distinct)",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000) \
        .select(F.col("o_custkey").alias("custkey"))
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000) \
        .select(F.col("c_custkey").alias("custkey"))
    return o.intersect(c)


@query(
    "setop_except", "setops",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 49
    """,
    description="EXCEPT (distinct): parts never shipped in bulk",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey")
    sold = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49) \
        .select(F.col("l_partkey").alias("p_partkey"))
    return p.exceptAll(sold.distinct()).distinct()


@query(
    "setop_except_all", "setops",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity > 49
    EXCEPT ALL
    SELECT s_suppkey AS suppkey FROM supplier
    """,
    description="EXCEPT ALL (multiset difference preserves multiplicity)",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49) \
        .select(F.col("l_suppkey").alias("suppkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("suppkey"))
    return li.exceptAll(s)


@query(
    "setop_intersect_all", "setops",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    """,
    description="INTERSECT ALL (multiset intersection)",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@query(
    "sort_multikey_limit", "setops",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_orderstatus ASC NULLS FIRST,
             o_totalprice DESC NULLS LAST,
             o_orderkey ASC
    LIMIT 100
    """,
    description="global multi-key sort with explicit null ordering + LIMIT",
)
def sort_multikey_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


@query(
    "setop_union_by_name", "setops",
    oracle="""
    SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS amount
    FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT c_custkey AS id, 'customer' AS kind, c_acctbal AS amount
    FROM customer WHERE c_custkey <= 300
    """,
    description="unionByName: column-name (not positional) union, missing cols filled",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the two sides deliberately list columns in DIFFERENT orders:
    # positional unionAll would mis-zip them; unionByName aligns on name
    o = (t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
         .select(F.col("o_orderkey").alias("id"),
                 F.lit("order").alias("kind"),
                 F.col("o_totalprice").alias("amount")))
    c = (t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
         .select(F.col("c_acctbal").alias("amount"),
                 F.col("c_custkey").alias("id"),
                 F.lit("customer").alias("kind")))
    return o.unionByName(c)
