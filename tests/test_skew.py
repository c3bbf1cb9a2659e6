"""Salted skew-join: result-identical to the plain join, and the salt
actually spreads a hot key across buckets."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datastream_processing_demo_spark.catalog import load_table
from datastream_processing_demo_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = li.withColumnRenamed("l_orderkey", "o_orderkey")

    plain = (li.join(o, "o_orderkey")
             .groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("l_quantity").cast("long")).alias("qty"))
             .orderBy("o_orderstatus").collect())
    salted = (salted_join(li, o, "o_orderkey", discriminator="l_partkey")
              .groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("l_quantity").cast("long")).alias("qty"))
              .orderBy("o_orderstatus").collect())
    assert plain == salted


def test_salt_spreads_hot_key(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n_salt = 8
    salts = (li.select(
        F.pmod(F.xxhash64("l_partkey", "l_linenumber"), F.lit(n_salt)).alias("s"))
        .groupBy("s").count().collect())
    assert len(salts) == n_salt, "hot key must spread over all salt buckets"
    counts = [r["count"] for r in salts]
    assert max(counts) < 2 * min(counts), f"salt distribution skewed: {counts}"
