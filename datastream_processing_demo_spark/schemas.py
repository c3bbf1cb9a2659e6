"""Explicit schemas for every engine table + the fixed-width message layout.

The reference's only schema is an implicit fixed-width carve-out of a
string message (DataStreamProcessingJob.java:53-60); here every schema is
an explicit StructType declared in one place (SURVEY.md §1.2 decision).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Fixed-width message layout (reference: DataStreamProcessingJob.java:47-63)
#
#   bytes [0,16)   module_name, space padded          (:53,55)
#   bytes [16,32)  send_time epoch-millis, space padded (:59-60)
#   bytes [32,64)  reserved, never read               (implied by :54)
#   bytes [64,..)  opaque payload tail                (:54)
#
# Records with length <= 64 are structurally invalid (:47-50).
# NOTE Spark substring() is 1-based where Java's is 0-based.
# ---------------------------------------------------------------------------
MSG_MODULE_START = 1      # 1-based, inclusive
MSG_MODULE_LEN = 16
MSG_SEND_TIME_START = 17
MSG_SEND_TIME_LEN = 16
MSG_HEADER_LEN = 64       # payload starts at byte 65 (1-based)
MSG_MIN_VALID_LEN = 65    # reference drops length <= 64
SESSION_MODULE = "session"  # the routed module (DataStreamProcessingJob.java:55)

MESSAGE_SCHEMA = T.StructType([
    T.StructField("module_name", T.StringType(), True),
    T.StructField("send_ts_ms", T.LongType(), True),
    T.StructField("payload", T.StringType(), True),
])

# ---------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §A) — TPC-H-ish star schema + events,
# documents, embeddings. Explicit schemas so readers never rely on inference.
# ---------------------------------------------------------------------------
LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), True),
    T.StructField("l_partkey", T.LongType(), True),
    T.StructField("l_suppkey", T.LongType(), True),
    T.StructField("l_linenumber", T.IntegerType(), True),
    T.StructField("l_quantity", T.DoubleType(), True),
    T.StructField("l_extendedprice", T.DoubleType(), True),
    T.StructField("l_discount", T.DoubleType(), True),
    T.StructField("l_tax", T.DoubleType(), True),
    T.StructField("l_returnflag", T.StringType(), True),
    T.StructField("l_linestatus", T.StringType(), True),
    T.StructField("l_shipdate", T.TimestampType(), True),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), True),
    T.StructField("o_custkey", T.LongType(), True),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
    T.StructField("o_orderdate", T.TimestampType(), True),
    T.StructField("o_orderpriority", T.StringType(), True),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), True),
    T.StructField("c_name", T.StringType(), True),
    T.StructField("c_nationkey", T.IntegerType(), True),
    T.StructField("c_acctbal", T.DoubleType(), True),
    T.StructField("c_mktsegment", T.StringType(), True),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), True),
    T.StructField("s_name", T.StringType(), True),
    T.StructField("s_nationkey", T.IntegerType(), True),
    T.StructField("s_acctbal", T.DoubleType(), True),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), True),
    T.StructField("p_name", T.StringType(), True),
    T.StructField("p_brand", T.StringType(), True),
    T.StructField("p_type", T.StringType(), True),
    T.StructField("p_size", T.IntegerType(), True),
    T.StructField("p_retailprice", T.DoubleType(), True),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), True),
    T.StructField("n_name", T.StringType(), True),
    T.StructField("n_regionkey", T.IntegerType(), True),
])

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), True),
    T.StructField("r_name", T.StringType(), True),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),  # JSON string, e.g. {"k": 87}
])

EVENT_PROPS_SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "lineitem": LINEITEM,
    "orders": ORDERS,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "nation": NATION,
    "region": REGION,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)

# Dimension tables small enough to broadcast-join at any scale factor.
# (region/nation/supplier are bounded; customer/part grow with SF but stay
# dimension-sized relative to lineitem — at 100 TB you'd broadcast
# region/nation always and let AQE decide for the rest.)
BROADCAST_DIMS = ("region", "nation", "supplier")
