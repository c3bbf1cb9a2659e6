"""UDF surface: Python scalar UDF, vectorized pandas UDF, grouped-agg
pandas UDAF, mapInPandas UDTF (SURVEY.md §2.2 UDF/UDAF/UDTF rows).

The reference's closest analogue is its anonymous ProcessFunction
(DataStreamProcessingJob.java:41-66) — row-at-a-time Java. Here the
engine's stance is the Spark one: built-ins first (everything else in
plans/ avoids Python), and when Python is genuinely needed, Arrow-batched
pandas UDFs, never row-at-a-time in a hot path. The row-at-a-time scalar
UDF below exists to cover the API surface, deliberately on a small input.

Scale notes: pandas UDFs stream Arrow batches per partition — constant
memory; the grouped-agg UDAF keys on event_type (bounded cardinality),
so no group outgrows an executor.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._util import t
from .registry import query


@query(
    "udf_scalar_python", "udfs",
    oracle="""
    SELECT p_partkey, reverse(p_name) AS name_rev
    FROM part
    """,
    description="row-at-a-time Python scalar UDF (API coverage; slow path by design)",
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = F.udf(lambda s: None if s is None else s[::-1], T.StringType())
    return t(spark, sf_dir, "part").select(
        "p_partkey", rev("p_name").alias("name_rev"))


@query(
    "udf_pandas_vectorized", "udfs",
    oracle="""
    SELECT event_id, value * 2.0 + 1.0 AS scaled,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    """,
    description="Arrow-vectorized pandas UDF (the fast Python path)",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def scale(s: pd.Series) -> pd.Series:
        return s * 2.0 + 1.0

    @F.pandas_udf(T.LongType())
    def to_cents(s: pd.Series) -> pd.Series:
        return (s * 100).round().astype("int64")

    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        scale("value").alias("scaled"),
        to_cents("value").alias("cents"),
    )


@query(
    "udaf_grouped_pandas", "udfs",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    description="grouped-aggregate pandas UDAF (exact integer-cents sum)",
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def cents_total(s: pd.Series) -> float:
        return float((s * 100).round().astype("int64").sum()) / 100.0

    @F.pandas_udf(T.LongType())
    def n_rows(s: pd.Series) -> int:
        return len(s)

    # note: grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    # agg() — all aggregates here go through the Arrow path
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        cents_total("value").alias("total_value"),
        n_rows("value").alias("n_events"),
    )


@query(
    "udtf_map_in_pandas", "udfs",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
    description="mapInPandas UDTF: 1 row in -> N rows out (tokenizer)",
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].repeat(toks.str.len()),
                "token": [w for ws in toks for w in ws],
            })

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100) \
        .select("doc_id", "text")
    return d.mapInPandas(tokenize, schema="doc_id long, token string")


@query(
    "udtf_apply_in_pandas", "udfs",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS user_total,
           COUNT(*) AS n,
           MIN(event_id) AS first_event_id
    FROM events
    GROUP BY user_id
    """,
    description="applyInPandas grouped-map: per-group pandas DataFrame in/out",
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64").sum()
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "user_total": [float(cents) / 100.0],
            "n": [len(pdf)],
            "first_event_id": [pdf["event_id"].min()],
        })

    e = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(
        summarize,
        schema="user_id long, user_total double, n long, first_event_id long")


@query(
    "udtf_map_in_arrow", "udfs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars
    FROM documents WHERE doc_id <= 400
    """,
    description="mapInArrow: RecordBatch-level transform (zero pandas overhead)",
)
def udtf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Arrow-native cousin of mapInPandas: the function sees raw
    # pyarrow.RecordBatch objects — no pandas conversion at all, the
    # cheapest possible Python boundary for columnar work
    import pyarrow as pa

    def token_stats(batches):
        for batch in batches:
            text = batch.column("text")
            n_tokens = pa.compute.list_value_length(
                pa.compute.split_pattern(text, " ")).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), n_tokens,
                 pa.compute.utf8_length(text).cast(pa.int64())],
                names=["doc_id", "n_tokens", "n_chars"])

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 400) \
        .select("doc_id", "text")
    return d.mapInArrow(token_stats,
                        "doc_id long, n_tokens long, n_chars long")


@query(
    "udtf_python_class", "udfs",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           CAST(length(unnest(string_split(text, ' '))) AS BIGINT) AS tok_len
    FROM documents
    WHERE doc_id < 100
    """,
    description="Python UDTF class API (@udtf eval/yield, LATERAL join)",
)
def udtf_python_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Spark 3.5+ table-function API proper (distinct from the
    # mapInPandas pattern): a class with eval() yielding 0..N rows per
    # input row, registered and invoked via LATERAL. Row-at-a-time by
    # design (API-parity query, bounded input) — bulk tokenization
    # stays on the Arrow paths (udtf_map_in_pandas / JVM split).
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, tok_len: bigint")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield tok, len(tok)

    spark.udtf.register("tokenize_udtf", Tokenize)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100) \
        .select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, tk.token, tk.tok_len
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) tk
    """)


@query(
    "udf_sql_function", "udfs",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="SQL-defined scalar UDFs (CREATE FUNCTION ... RETURN expr, Spark 4)",
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL scalar UDFs (SPARK-46246): declared in SQL text, inlined by
    # Catalyst into the calling plan — unlike Python UDFs they stay
    # JVM-side inside whole-stage codegen, so they are the ZERO-cost
    # way to package shared business expressions at 100 TB.
    from ..catalog import register_views
    register_views(spark, sf_dir, ("lineitem",))
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(q DOUBLE)
        RETURNS INT RETURN CASE WHEN q >= 25 THEN 1 ELSE 0 END
    """)
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(ROUND(disc_price(l_extendedprice, l_discount)
                                   * 10000) AS BIGINT)) AS DOUBLE) / 10000
                   AS sum_disc_price,
               CAST(SUM(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
        FROM lineitem
        GROUP BY l_returnflag
    """)
