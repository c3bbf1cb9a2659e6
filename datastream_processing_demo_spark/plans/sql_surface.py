"""SQL-text surface + file-source scans + range frames — §2.2 rows not
yet covered elsewhere: the engine's queries are equally expressible as
SQL over registered views (Catalyst produces the same plan), CSV/JSON
scans carry explicit schemas, and window frames support RANGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register_views
from ..sources.files import (read_binary_files, read_csv_with_schema,
                             read_json_with_schema, read_orc,
                             read_text_lines, read_xml_with_schema)
from ._util import oracle_exact_sum, t
from .registry import query


@query(
    "sql_q3_shipping_priority", "sql_surface",
    oracle=f"""
    SELECT l.l_orderkey,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 20
    """,
    description="TPC-H Q3 shape via spark.sql over registered views",
)
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(f"""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 20
    """)


@query(
    "sql_q5_local_supplier", "sql_surface",
    oracle=f"""
    SELECT n.n_name,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5 shape: 6-table join via spark.sql",
)
def sql_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir,
                   ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    return spark.sql("""
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY n.n_name
    """)


@query(
    "source_csv_scan", "sql_surface",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
           min(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    """,
    description="CSV scan with explicit schema (no inference)",
)
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_csv_with_schema(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@query(
    "source_json_scan", "sql_surface",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           MAX(s_acctbal) AS max_bal
    FROM supplier
    GROUP BY s_nationkey
    """,
    description="JSON-lines scan with explicit schema",
)
def source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_json_with_schema(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("s_acctbal").alias("max_bal"),
    )


@query(
    "win_range_frame", "sql_surface",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
               AS n_within_10k,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / 100.0 AS sum_within_10k
    FROM orders
    """,
    description="RANGE window frame (value-based bounds)",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_orderstatus").orderBy("o_totalprice")
         .rangeBetween(-10000, W.currentRow))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
        (F.sum(cents).over(w).cast("double") / 100.0).alias("sum_within_10k"),
    )


@query(
    "sql_q6_revenue_forecast", "sql_surface",
    oracle=f"""
    SELECT {oracle_exact_sum('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: selective filter + global agg (pushdown showcase)",
)
def sql_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """)


@query(
    "sql_q10_returned_items", "sql_surface",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue ranking",
)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql("""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """)


@query(
    "sql_q18_large_volume", "sql_surface",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
    description="TPC-H Q18 shape: large-volume orders (IN-subquery on grouped HAVING)",
)
def sql_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql("""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 50
    """)


@query(
    "sql_q13_order_distribution", "sql_surface",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13 shape: customer order-count distribution (outer join + double agg)",
)
def sql_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """)


@query(
    "source_orc_scan", "sql_surface",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {oracle_exact_sum('o_totalprice', 2)} AS total_value
    FROM orders
    GROUP BY o_orderstatus
    """,
    description="ORC scan (footer schema, vectorized reader, pushdown like parquet)",
)
def source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same derived-copy pattern as the CSV/JSON sources: the driver
    # testdata is parquet-only, so materialize an ORC copy once and
    # read it back. ORC carries exact types in its footer and gets the
    # vectorized columnar reader + predicate pushdown, so the scan
    # behaves like parquet at scale.
    o = read_orc(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (o.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 (F.sum(cents).cast("double") / 100.0).alias("total_value")))


@query(
    "source_text_scan", "sql_surface",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey,
           CAST(length(n_nationkey || '|' || n_name || '|' || n_regionkey)
                AS INT) AS line_len
    FROM nation
    """,
    description="line-oriented text scan (read.text) + delimited parse",
)
def source_text_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Raw-line ingest: the 100 TB path for logs / text dumps. Lines are
    # splittable, so the scan parallelizes per 128 MB split; the parse
    # is a narrow codegen projection (split_part + try_cast), the same
    # shape as the reference's fixed-width header carve-out
    # (DataStreamProcessingJob.java:53-54) generalized to delimited text.
    lines = read_text_lines(spark, sf_dir, "nation",
                            ["n_nationkey", "n_name", "n_regionkey"])
    v = F.col("value")
    return lines.select(
        F.split_part(v, F.lit("|"), F.lit(1)).try_cast("bigint")
            .alias("n_nationkey"),
        F.split_part(v, F.lit("|"), F.lit(2)).alias("n_name"),
        F.split_part(v, F.lit("|"), F.lit(3)).try_cast("bigint")
            .alias("n_regionkey"),
        F.length(v).alias("line_len"),
    )


@query(
    "source_binaryfile_scan", "sql_surface",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id <= 100
    """,
    description="binaryFile source: opaque per-file payloads (multimodal ingest)",
)
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The multimodal ingest scan (SURVEY.md §2.2 "multimodal columns"):
    # one opaque binary blob per file, identity carried in the path.
    # binaryFile lists lazily and prunes via pathGlobFilter; at 100 TB
    # this is the object-store image/audio reader feeding the
    # mm_* decode stages, with the blob kept as BinaryType end-to-end.
    files = read_binary_files(spark, sf_dir, max_doc_id=100)
    return files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("bigint").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "source_xml_scan", "sql_surface",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
               AS total_bal,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY s_nationkey
    """,
    description="native XML scan (Spark 4 xml format) with explicit schema",
)
def source_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4's built-in XML reader (SPARK-44265): row-tagged records,
    # explicit schema (inference = an extra full pass at 100 TB). The
    # agg proves types (bigint keys, double money) round-trip the
    # text encoding exactly.
    s = read_xml_with_schema(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    return (s.groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 (F.sum(cents).cast("double") / 100.0).alias("total_bal"),
                 F.min("s_name").alias("first_name")))


@query(
    "sql_pipe_syntax", "sql_surface",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           SUM(l_quantity) AS sum_qty,
           {oracle_exact_sum('l_extendedprice', 2)} AS sum_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount)', 4)}
               AS sum_disc_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="SQL pipe operator syntax (|> WHERE/EXTEND/AGGREGATE, Spark 4)",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4's pipe syntax (SPARK-49555): each |> stage is a full
    # table-to-table operator applied in reading order — the SQL-text
    # twin of the DataFrame fluent chain. Catalyst lowers it to the
    # identical logical plan as the ANSI form (the oracle), so pushdown,
    # partial aggregation, and codegen are unchanged; only the parser
    # differs. Q1-shaped so the plan exercises scan+filter+agg+sort.
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |> EXTEND CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
                  CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT) AS disc_price_c
        |> AGGREGATE COUNT(*) AS n_rows,
                     SUM(l_quantity) AS sum_qty,
                     CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_price,
                     CAST(SUM(disc_price_c) AS DOUBLE) / 10000.0
                         AS sum_disc_price
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
    """)


@query(
    "sql_modern_ergonomics", "sql_surface",
    oracle="""
    SELECT o_orderstatus, yr, n,
           CAST(cents AS DOUBLE) / 100.0 AS total_value,
           round((CAST(cents AS DOUBLE) / 100.0) / n, 6) AS avg_value
    FROM (
      SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS yr,
             count(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders WHERE o_totalprice > 50000.0
      GROUP BY ALL
    )
    ORDER BY ALL
    """,
    description="GROUP BY ALL / ORDER BY ALL / lateral column aliases / named SQL parameters",
)
def sql_modern_ergonomics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Modern SQL ergonomics, all lowered by the analyzer before
    # optimization (the plan is identical to the spelled-out form):
    # GROUP BY ALL infers the grouping keys, ORDER BY ALL the sort keys,
    # lateral column aliases let avg_value reference total_value within
    # the same SELECT, and the filter threshold binds as a named
    # parameter (spark.sql args= — server-side literal binding, no
    # string interpolation). DuckDB shares the GROUP BY ALL / ORDER BY
    # ALL / lateral-alias dialect, so the oracle differs only in
    # inlining the parameter.
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_orderstatus, yr, n,
               CAST(cents AS DOUBLE) / 100.0 AS total_value,
               round(total_value / n, 6) AS avg_value
        FROM (
          SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS yr,
                 count(*) AS n,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders WHERE o_totalprice > :minp
          GROUP BY ALL
        )
        ORDER BY ALL
    """, args={"minp": 50000.0})


@query(
    "sql_recursive_spine", "sql_surface",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00' AS m
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-12-01 00:00:00'
    )
    SELECT months.m AS month_start,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_value, 0.0) AS total_value
    FROM months
    LEFT JOIN (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_value
      FROM orders GROUP BY 1
    ) o ON o.mo = months.m
    """,
    description="recursive CTE month spine (WITH RECURSIVE) + left-joined rollup",
)
def sql_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4's WITH RECURSIVE: generate the 84-month calendar spine
    # recursively (bounded depth, well under the default recursion
    # limit), then left-join the per-month order rollup so empty months
    # surface as zeros. The spine is driver-free and tiny; at scale the
    # join broadcasts the spine against the aggregated (not raw) side.
    # DuckDB runs the identical statement.
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00' AS m
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-12-01 00:00:00'
        )
        SELECT months.m AS month_start,
               COALESCE(o.n_orders, CAST(0 AS BIGINT)) AS n_orders,
               COALESCE(o.total_value, 0.0) AS total_value
        FROM months
        LEFT JOIN (
          SELECT date_trunc('month', o_orderdate) AS mo,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / 100.0 AS total_value
          FROM orders GROUP BY 1
        ) o ON o.mo = months.m
    """)


@query(
    "source_file_lineage", "sql_surface",
    oracle="""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        FROM events),
    c AS (
        SELECT event_id, ts,
               (epoch_us(ts) - mn) * 5 // (mx - mn + 1) AS chunk
        FROM events, b)
    SELECT event_id,
           'chunk-' || lpad(CAST(chunk AS VARCHAR), 8, '0')
               || '.parquet' AS file_name,
           row_number() OVER (PARTITION BY chunk ORDER BY ts, event_id)
               - 1 AS row_index
    FROM c
    """,
    description="scan-time lineage stamping via _metadata (file_name, row_index)",
)
def source_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ingest lineage: every record stamped with its originating file and
    # in-file position via the parquet reader's hidden _metadata struct
    # — free at scan time (no shuffle, no UDF), and the provenance
    # column a 100 TB ingest job carries end-to-end for audit/replay.
    # The oracle reconstructs the (file, row) assignment from the
    # fixture's closed-form chunking (time-equal slices, each file
    # (ts, event_id)-sorted — _stream_chunk_dir) — so the lineage
    # itself is exact-checked, not just row-counted.
    from ..schemas import EVENTS
    from .streaming_live import _stream_chunk_dir
    d = _stream_chunk_dir(spark, sf_dir)
    return (spark.read.schema(EVENTS).parquet(d)
            .select("event_id",
                    F.col("_metadata.file_name").alias("file_name"),
                    F.col("_metadata.row_index").alias("row_index")))


def _interleave_expr() -> str:
    """16+16-bit Morton (z-order) interleave as pure integer arithmetic —
    the same text parses in Spark SQL and DuckDB, so the clustering key
    is oracle-checked bit for bit."""
    terms = []
    for i in range(16):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "storage_zorder_key", "sql_surface",
    oracle=f"""
    WITH b AS (
        SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
               min(CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT)) AS dmin,
               max(CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT)) AS dmax
        FROM orders),
    xy AS (
        SELECT o_orderkey,
               ((o_custkey - cmin) * 65535) // (cmax - cmin) AS x,
               ((CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT) - dmin)
                * 65535) // (dmax - dmin) AS y
        FROM orders, b)
    SELECT o_orderkey, x, y,
           {_interleave_expr()} AS zkey
    FROM xy
    """,
    description="z-order (Morton) clustering key: bit-interleaved multi-column sort key",
)
def storage_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The data-layout half of data skipping at 100 TB: sorting a write
    # by the Morton interleave of (customer, order-day) gives row
    # groups that are tight in BOTH dimensions, so min/max footer
    # stats prune scans filtered on EITHER column — a single-column
    # sort only prunes one (asserted on real parquet footers in
    # test_plans.py::test_zorder_layout_tightens_both_dimensions).
    # Each dimension is normalized to the full 16-bit domain with pure
    # INTEGER arithmetic (scale-then-floor-divide) — skipped-high-bits
    # would let one dimension dominate the interleave; integer math
    # keeps the key oracle-exact. Bounds come from one cheap min/max
    # pass (production: known domain constants or column stats); the
    # key itself is shuffle-free codegen. Intended write path:
    # df.repartitionByRange(N, zkey).sortWithinPartitions(zkey).write.
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(f"""
        WITH b AS (
            SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
                   min(CAST(datediff(CAST(o_orderdate AS DATE),
                                     DATE '1970-01-01') AS BIGINT)) AS dmin,
                   max(CAST(datediff(CAST(o_orderdate AS DATE),
                                     DATE '1970-01-01') AS BIGINT)) AS dmax
            FROM orders),
        xy AS (
            SELECT o_orderkey,
                   ((o_custkey - cmin) * 65535) div (cmax - cmin) AS x,
                   ((CAST(datediff(CAST(o_orderdate AS DATE),
                                   DATE '1970-01-01') AS BIGINT) - dmin)
                    * 65535) div (dmax - dmin) AS y
            FROM orders CROSS JOIN b)
        SELECT o_orderkey, x, y,
               {_interleave_expr()} AS zkey
        FROM xy
    """)


@query(
    "source_format_agreement", "sql_surface",
    oracle="""
    SELECT fmt,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents,
           CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
           COUNT(DISTINCT s_nationkey) AS n_nations
    FROM (SELECT unnest(['parquet', 'csv', 'json', 'orc', 'xml',
                     'jsonl_gz']) AS fmt),
         supplier
    GROUP BY fmt
    """,
    description="cross-format consistency: parquet/CSV/JSON/ORC/XML/gzip-JSONL scans agree exactly",
)
def source_format_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import read_jsonl_gzip_with_schema as _read_jsonl_gz
    # Every format reader must produce the SAME table: the same rows,
    # types, and aggregate fingerprints, whether the bytes came from
    # parquet footers, headered CSV, JSON lines, ORC stripes, or XML
    # rows. The oracle is one stanza cross-joined over the format
    # labels — any reader that drops a row, mangles a double, or
    # misparses a type breaks its row of the hash. (Types are always
    # DECLARED on text formats; see sources/files.py.)
    from ..catalog import load_table
    frames = {
        "parquet": load_table(spark, sf_dir, "supplier"),
        "csv": read_csv_with_schema(spark, sf_dir, "supplier"),
        "json": read_json_with_schema(spark, sf_dir, "supplier"),
        "orc": read_orc(spark, sf_dir, "supplier"),
        "xml": read_xml_with_schema(spark, sf_dir, "supplier"),
        "jsonl_gz": _read_jsonl_gz(spark, sf_dir, "supplier"),
    }
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    stats = [
        df.agg(F.count(F.lit(1)).alias("n_rows"),
               F.sum(cents).alias("bal_cents"),
               F.sum("s_suppkey").alias("key_sum"),
               F.countDistinct("s_nationkey").alias("n_nations"))
          .select(F.lit(fmt).alias("fmt"), "*")
        for fmt, df in frames.items()
    ]
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


@query(
    "source_csv_badrecords", "sql_surface",
    oracle="""
    SELECT COUNT(*) AS n_good,
           5 AS n_bad,
           CAST(SUM(s_suppkey) AS BIGINT) AS good_key_sum,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS good_bal_cents
    FROM supplier
    """,
    description="CSV bad-record side channel: malformed rows quarantined, not fatal",
)
def source_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PERMISSIVE parse: 5 injected garbage lines land in
    # _corrupt_record; every well-formed row parses to typed columns.
    # The aggregate proves the quarantine is exact — good-row stats
    # equal the clean table, bad count equals the injection. (The
    # reference would crash instead; see sources/files.py.)
    from ..sources.files import read_csv_with_badrecords
    df = read_csv_with_badrecords(spark, sf_dir, "supplier", n_bad=5)
    df = df.cache()  # corrupt-record parsing requires a stable pass
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    bad = F.col("_corrupt_record").isNotNull()
    return df.agg(
        F.sum(F.when(~bad, 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("int").alias("n_bad"),
        F.sum(F.when(~bad, F.col("s_suppkey"))).cast("long")
            .alias("good_key_sum"),
        F.sum(F.when(~bad, cents)).cast("long").alias("good_bal_cents"))


@query(
    "source_jsonl_gzip_scan", "sql_surface",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc
    FROM documents
    GROUP BY lang
    """,
    description="gzip-compressed JSON-lines scan (.jsonl.gz, the standard corpus wire format)",
)
def source_jsonl_gzip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import read_jsonl_gzip_with_schema
    d = read_jsonl_gzip_with_schema(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
    )
