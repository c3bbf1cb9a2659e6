"""Relational core: projection, filter, scalar function families, casts.

Covers SURVEY.md §2.2 rows: projection / filter / string fns / date fns /
math fns / conditional / cast. These generalize the reference's operators
P1-P7 (DataStreamProcessingJob.java:44-63: passthrough projection, length
filter, substring projection, equality predicate, string<->long casts,
derived arithmetic column) from one hardcoded message format to a full
scalar-expression surface.

Scale notes: every query here is a narrow (shuffle-free) scan->project->
filter pipeline except the flagship aggregate; filters and column
projections compile to parquet PushedFilters/ReadSchema, so at 100 TB the
scan reads only the referenced columns and skips row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import exact_avg, exact_sum, oracle_exact_avg, oracle_exact_sum, t
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan, pushed filter, projection
# arithmetic, partial+final hash aggregate, sort). SURVEY.md §7.2.
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "2000-09-02"


@query(
    "q1_pricing_summary", "relational",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {oracle_exact_sum('l_extendedprice', 2)} AS sum_base_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           {oracle_exact_avg('l_extendedprice', 2)} AS avg_price,
           {oracle_exact_avg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-shaped pricing summary report",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
            exact_avg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection: select / rename / derived expressions (reference P1/P3/P6).
# Per-row double arithmetic is bit-identical across engines — no rounding.
# ---------------------------------------------------------------------------

@query(
    "proj_derived_exprs", "relational",
    oracle="""
    SELECT l_orderkey, l_linenumber AS line_no,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2.0 + 1.0 AS qty_scaled
    FROM lineitem
    """,
    description="column select/rename + derived arithmetic expressions",
)
def proj_derived_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_no"),
        disc_price.alias("disc_price"),
        (disc_price * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty_scaled"),
    )


# ---------------------------------------------------------------------------
# Filter: comparison, boolean logic, IN, BETWEEN, LIKE, null-safe equality
# (reference P2/P4 generalized).
# ---------------------------------------------------------------------------

@query(
    "filter_predicates", "relational",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 300000
      AND (o_orderstatus = 'O' OR o_orderstatus = 'F')
      AND o_orderpriority LIKE '%-%'
      AND NOT (o_custkey IS NULL)
      AND o_orderstatus IS NOT DISTINCT FROM o_orderstatus
    """,
    description="comparison/boolean/IN/BETWEEN/LIKE/null-safe-eq predicates",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .filter(F.col("o_totalprice").between(100000, 300000))
        .filter((F.col("o_orderstatus") == "O") | (F.col("o_orderstatus") == "F"))
        .filter(F.col("o_orderpriority").like("%-%"))
        .filter(~F.col("o_custkey").isNull())
        .filter(F.col("o_orderstatus").eqNullSafe(F.col("o_orderstatus")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# String functions (reference P3's substring/trim generalized).
# ---------------------------------------------------------------------------

@query(
    "fn_string", "relational",
    oracle=r"""
    SELECT p_partkey,
           substring(p_name, 1, 5) AS name_head,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           length(p_name) AS name_len,
           concat_ws('-', p_brand, p_type) AS brand_type,
           lpad(p_brand, 10, '*') AS brand_pad,
           trim(lpad(p_brand, 12, ' ')) AS brand_trim,
           ltrim(concat('  ', p_type)) AS type_ltrim,
           rtrim(concat(p_type, '  ')) AS type_rtrim,
           regexp_replace(p_brand, 'Brand#', 'B') AS brand_short,
           regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
           instr(p_name, ' ') AS first_space,
           replace(p_name, ' ', '_') AS name_snake,
           len(string_split(p_name, ' ')) AS n_words
    FROM part
    """,
    description="substring/trim/length/case/concat/pad/regexp/instr/replace/split",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("name_head"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_brand", 10, "*").alias("brand_pad"),
        F.trim(F.lpad("p_brand", 12, " ")).alias("brand_trim"),
        F.ltrim(F.concat(F.lit("  "), F.col("p_type"))).alias("type_ltrim"),
        F.rtrim(F.concat(F.col("p_type"), F.lit("  "))).alias("type_rtrim"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.instr("p_name", " ").cast("long").alias("first_space"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# Date/time functions (reference's epoch-millis handling, P6, generalized).
# ---------------------------------------------------------------------------

@query(
    "fn_date", "relational",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts) AS day,
           date_trunc('hour', ts) AS hour_ts,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(dayofmonth(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           epoch_ms(date_trunc('millisecond', ts)) AS ts_millis,
           CAST(datediff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS days_since,
           CAST(CAST(ts AS DATE) + 7 AS TIMESTAMP) AS plus_week,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_roundtrip
    FROM events
    """,
    description="date_trunc/year/month/day/hour/unix_millis/datediff/date_add/to_timestamp",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.unix_millis(F.date_trunc("millisecond", F.col("ts"))).alias("ts_millis"),
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp"))
            .cast("long").alias("days_since"),
        F.date_add(F.col("ts"), 7).cast("timestamp").alias("plus_week"),
        F.to_timestamp(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).alias("ts_roundtrip"),
    )


# ---------------------------------------------------------------------------
# Math functions. Transcendentals (sqrt/ln/exp) ROUND(,6)ed: JVM Math vs
# libm can differ in the last ulp. The rounded values are emitted as
# SCALED BIGINTs (×10 / ×1e6) so the hash basis is an exact integer,
# never double or decimal *rendering* — CORRECTNESS_r01 hash-mismatched
# here on a driver DuckDB whose round(double, n) renders the last digit
# differently (values themselves verified bit-identical against DuckDB
# 1.0.0). round(x * 10^n) with scale 0 is a pure nearest-integer
# decision on identical input bits in both engines (both half-away-from-
# zero for positives), so the BIGINTs agree exactly.
# ---------------------------------------------------------------------------

@query(
    "fn_math", "relational",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 10) AS BIGINT) AS price_r1_x10,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(round(abs(l_discount - 0.05) * 1000000) AS BIGINT) AS disc_dev_e6,
           CAST(round(sqrt(l_quantity) * 1000000) AS BIGINT) AS qty_sqrt_e6,
           CAST(round(pow(l_quantity, 2.0) * 1000000) AS BIGINT) AS qty_sq_e6,
           CAST(round(ln(l_extendedprice) * 1000000) AS BIGINT) AS price_ln_e6,
           CAST(round(exp(l_discount) * 1000000) AS BIGINT) AS disc_exp_e6,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
           CAST(((l_linenumber - 3) % 5 + 5) % 5 AS BIGINT) AS line_pmod
    FROM lineitem
    """,
    description="round/floor/ceil/abs/sqrt/pow/ln/exp/sign/pmod",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 10, 0).cast("long")
            .alias("price_r1_x10"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05) * 1e6, 0).cast("long")
            .alias("disc_dev_e6"),
        F.round(F.sqrt("l_quantity") * 1e6, 0).cast("long")
            .alias("qty_sqrt_e6"),
        F.round(F.pow("l_quantity", F.lit(2.0)) * 1e6, 0).cast("long")
            .alias("qty_sq_e6"),
        F.round(F.log(F.col("l_extendedprice")) * 1e6, 0).cast("long")
            .alias("price_ln_e6"),
        F.round(F.exp("l_discount") * 1e6, 0).cast("long")
            .alias("disc_exp_e6"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        F.pmod(F.col("l_linenumber") - 3, F.lit(5)).cast("long").alias("line_pmod"),
    )


# ---------------------------------------------------------------------------
# Conditional expressions.
# ---------------------------------------------------------------------------

@query(
    "fn_conditional", "relational",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS size_band,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
           nullif(o_orderstatus, 'O') AS status_nullif
    FROM orders
    """,
    description="CASE WHEN / coalesce / nullif / if",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
         .when(F.col("o_totalprice") > 150000, "mid")
         .otherwise("small").alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending"))
         .alias("status_or_pending"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
         .cast("int").alias("is_urgent"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_nullif"),
    )


# ---------------------------------------------------------------------------
# Casts (reference P5/P7: string<->long). Engine semantics under ANSI mode
# (Spark 4 default): CAST of garbage throws — same behavior as the
# reference's Long.parseLong (DataStreamProcessingJob.java:60) — and
# try_cast is the explicit NULL-tolerant path. The oracle mirrors with
# TRY_CAST.
# ---------------------------------------------------------------------------

@query(
    "fn_cast", "relational",
    oracle="""
    SELECT event_id,
           CAST(value AS VARCHAR) AS value_str,
           TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip,
           TRY_CAST(event_type AS BIGINT) AS garbage_cast,
           CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS id_roundtrip,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS ts_date,
           CAST(CAST('2024-01-15 12:30:00' AS TIMESTAMP) AS VARCHAR) AS const_ts_str,
           CAST(trunc(value) AS BIGINT) AS value_int  -- Spark double->long truncates; DuckDB rounds
    FROM events
    """,
    description="scalar casts incl. garbage->NULL (P5/P7 semantics)",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("value").cast("string").alias("value_str"),
        F.col("value").cast("string").cast("double").alias("value_roundtrip"),
        F.col("event_type").try_cast("long").alias("garbage_cast"),
        F.col("event_id").cast("string").cast("long").alias("id_roundtrip"),
        F.col("ts").cast("date").cast("timestamp").alias("ts_date"),
        F.lit("2024-01-15 12:30:00").cast("timestamp").cast("string").alias("const_ts_str"),
        F.col("value").cast("long").alias("value_int"),
    )


@query(
    "fn_string_extended", "relational",
    oracle="""
    SELECT s_suppkey,
           levenshtein(s_name, 'Supplier') AS edit_dist,
           upper(substring(n_name, 1, 1)) || lower(substring(n_name, 2))
               AS nation_title,
           translate(n_name, 'AEIOU', 'aeiou') AS translated,
           printf('%s#%05d', n_name, s_suppkey) AS formatted,
           reverse(n_name) AS reversed,
           ascii(n_name) AS first_code,
           repeat(substring(n_name, 1, 2), 3) AS repeated
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    description="levenshtein/initcap/translate/format_string/reverse/ascii/repeat",
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    j = s.join(n, s.s_nationkey == n.n_nationkey)
    return j.select(
        "s_suppkey",
        F.levenshtein("s_name", F.lit("Supplier")).alias("edit_dist"),
        # initcap on a single-token string (spelled out in the oracle)
        F.initcap(F.lower("n_name")).alias("nation_title"),
        F.translate("n_name", "AEIOU", "aeiou").alias("translated"),
        F.format_string("%s#%05d", F.col("n_name"), F.col("s_suppkey"))
            .alias("formatted"),
        F.reverse("n_name").alias("reversed"),
        F.ascii("n_name").alias("first_code"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("repeated"),
    )


@query(
    "fn_regexp_family", "relational",
    oracle="""
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '([a-z]{5,})'), ' ')
               AS long_words,
           len(regexp_extract_all(text, '[aeiou]{2}')) AS n_double_vowels,
           regexp_matches(text, 'data|model') AS mentions_ml,
           regexp_extract(text, '([a-z]+)ing', 1) AS first_ing_stem
    FROM documents
    WHERE doc_id <= 300
    """,
    description="regexp_extract_all / regexp_count / regexp_like / group extract",
)
def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `long_words` is joined to one string: the driver's canonicalizer can't
    # hash array cells (CORRECTNESS_r01: "unhashable type: 'list'"), same
    # trick agg_ordered_first_last uses.
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit("([a-z]{5,})"), F.lit(1)), " "
        ).alias("long_words"),
        F.regexp_count("text", F.lit("[aeiou]{2}")).cast("long")
            .alias("n_double_vowels"),
        F.regexp_like("text", F.lit("data|model")).alias("mentions_ml"),
        F.regexp_extract("text", "([a-z]+)ing", 1).alias("first_ing_stem"),
    )


@query(
    "fn_date_extended", "relational",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS iso_week,
           dayofweek(o_orderdate) + 1 AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)
               AS plus_3_months,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    description="quarter/weekofyear/dayofweek/last_day/add_months/date_format",
)
def fn_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3_months"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "fn_try_family", "relational",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / nullif(o_orderkey % 3, 0) AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN 'garbage'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS INTEGER)
               AS safe_int,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE o_orderkey + 1 END AS safe_add,
           ([o_orderkey, o_orderkey * 2])[CAST(o_orderkey % 4 AS INTEGER) + 1]
               AS safe_elem,
           coalesce(TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not a date'
                             ELSE '2024-06-01 12:00:00' END AS TIMESTAMP),
                    TIMESTAMP '1970-01-01 00:00:00') AS safe_ts
    FROM orders WHERE o_orderkey <= 1000
    """,
    description="try_divide/try_cast/try_add/try_element_at/try_to_timestamp (ANSI-safe)",
)
def fn_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4 runs ANSI mode: plain CAST/divide/add THROW on bad input
    # (the reference would crash the task the same way,
    # DataStreamProcessingJob.java:60); the try_* family is the engine's
    # NULL-on-error escape hatch, P5 semantics done right
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    long_max = 9223372036854775807
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_div"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("garbage"))
            .otherwise(F.col("o_orderkey").cast("string")), F.lit("999999"))
            .cast("int").alias("safe_int"),
        F.try_add(
            F.when(F.col("o_orderkey") % 5 == 0, F.lit(long_max))
            .otherwise(F.col("o_orderkey")), F.lit(1)).alias("safe_add"),
        F.try_element_at(F.array(F.col("o_orderkey"), F.col("o_orderkey") * 2),
                         (F.col("o_orderkey") % 4).cast("int") + 1).alias("safe_elem"),
        F.coalesce(
            F.try_to_timestamp(
                F.when(F.col("o_orderkey") % 3 == 0, F.lit("not a date"))
                .otherwise(F.lit("2024-06-01 12:00:00"))),
            F.lit("1970-01-01 00:00:00").cast("timestamp")).alias("safe_ts"),
    )


@query(
    "sample_bernoulli", "relational",
    # The sampled ROW SET is engine-internal (seeded per-partition
    # XORShift), so no ANSI oracle can reproduce it — but the sampling
    # CONTRACT is still driver-checkable: the exact population count and
    # a 5-sigma binomial bound on the sample size. If Spark's sampler
    # drifted out of bounds the boolean flips and the hash mismatches.
    # Content-deterministic sampling (same rows in every engine) is the
    # sample_hash_bernoulli query.
    oracle="""
    SELECT 'bernoulli_p10_seed42' AS sample_kind,
           COUNT(*) AS n_total,
           CAST(1 AS BIGINT) AS within_5sigma
    FROM lineitem
    """,
    description="Bernoulli row sampling with fixed seed; binomial-bound property oracle",
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-partition Bernoulli draw — no shuffle, scales linearly; the
    # seed fixes the draw so repeated runs return identical samples
    li = t(spark, sf_dir, "lineitem")
    n_sampled = (li.sample(fraction=0.1, seed=42)
                 .agg(F.count(F.lit(1)).alias("n_sampled")))
    n_total = li.agg(F.count(F.lit(1)).alias("n_total"))
    return n_sampled.crossJoin(n_total).select(
        F.lit("bernoulli_p10_seed42").alias("sample_kind"),
        "n_total",
        (F.abs(F.col("n_sampled") - 0.1 * F.col("n_total"))
         <= 5.0 * F.sqrt(0.1 * 0.9 * F.col("n_total")))
        .cast("long").alias("within_5sigma"))


_STRATA_FRACTIONS = {"R": 0.05, "A": 0.10, "N": 0.20}


@query(
    "sample_stratified", "relational",
    # Same property-oracle shape as sample_bernoulli, per stratum: exact
    # stratum sizes plus a 5-sigma binomial bound on each stratum's
    # sampled count. Content-deterministic stratified sampling is the
    # sample_hash_stratified query.
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_total,
           CAST(1 AS BIGINT) AS within_5sigma
    FROM lineitem GROUP BY l_returnflag
    """,
    description="stratified sampling via sampleBy; per-stratum binomial-bound property oracle",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-key fractions (downsample hot strata, keep rare ones whole) —
    # the balance-a-training-corpus primitive; map-side only, no shuffle
    li = t(spark, sf_dir, "lineitem")
    sampled_counts = (li.sampleBy("l_returnflag", _STRATA_FRACTIONS, seed=7)
                      .groupBy("l_returnflag")
                      .agg(F.count(F.lit(1)).alias("n_sampled")))
    totals = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_total"))
    # the bound must test the SAME fractions sampleBy draws with — build
    # the expression from the one dict so they cannot drift
    strata = iter(_STRATA_FRACTIONS.items())
    k0, f0 = next(strata)
    frac = F.when(F.col("l_returnflag") == k0, f0)
    for k, fr in strata:
        frac = frac.when(F.col("l_returnflag") == k, fr)
    frac = frac.otherwise(None)
    return (totals.join(sampled_counts, "l_returnflag", "left")
            .select(
                "l_returnflag", "n_total",
                (F.abs(F.coalesce(F.col("n_sampled"), F.lit(0))
                       - frac * F.col("n_total"))
                 <= 5.0 * F.sqrt(frac * (1.0 - frac) * F.col("n_total")))
                .cast("long").alias("within_5sigma")))


@query(
    "sample_hash_bernoulli", "relational",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                        || CAST(l_linenumber AS VARCHAR)), 1, 2) <= '19'
    """,
    description="content-hash Bernoulli sample (~10%): md5(key) threshold, engine-portable",
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    # seeded rand() sampling (sample_bernoulli) is reproducible only within
    # one engine+partitioning; hashing the row KEY makes the sample a pure
    # function of the data — stable across engines, repartitions, and
    # re-runs, which is what a 100 TB corpus snapshot needs. '00'..'19'
    # covers 26 of 256 two-hex-digit prefixes ~= 10.2%. Map-side only.
    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey").cast("string"),
                      F.col("l_linenumber").cast("string"))
    return (li.filter(F.substring(F.md5(key), 1, 2) <= "19")
            .select("l_orderkey", "l_linenumber", "l_returnflag"))


@query(
    "sample_hash_stratified", "relational",
    oracle="""
    SELECT l_returnflag, count(*) AS n_sampled
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                        || CAST(l_linenumber AS VARCHAR)), 1, 2)
          <= CASE l_returnflag WHEN 'R' THEN '0c'
                               WHEN 'A' THEN '19'
                               ELSE '33' END
    GROUP BY l_returnflag
    """,
    description="content-hash stratified sample: per-stratum md5 thresholds, exact oracle",
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic counterpart of sample_stratified (sampleBy): per-key
    # keep-fractions via hash thresholds — R ~5% (13/256), A ~10% (26/256),
    # N ~20% (52/256). Downsampling hot strata this way is reproducible
    # and mergeable across incremental corpus builds (same rows survive).
    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey").cast("string"),
                      F.col("l_linenumber").cast("string"))
    thresh = (F.when(F.col("l_returnflag") == "R", "0c")
              .when(F.col("l_returnflag") == "A", "19")
              .otherwise("33"))
    return (li.filter(F.substring(F.md5(key), 1, 2) <= thresh)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_sampled")))


@query(
    "fn_timestamp_arith", "relational",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00')
               AS days_to_1999,
           o_orderdate + INTERVAL 30 DAY AS plus_30d,
           o_orderdate - INTERVAL 6 HOUR AS minus_6h,
           make_timestamp(CAST(year(o_orderdate) AS BIGINT), 7, 1, 12, 0, 0.0)
               AS july_noon
    FROM orders WHERE o_orderkey <= 1500
    """,
    description="timestampdiff/timestampadd/interval +- /make_timestamp",
)
def fn_timestamp_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day-aligned data only: Spark timestampdiff counts complete units,
    # DuckDB date_diff counts boundary crossings — identical exactly when
    # both operands sit on the unit boundary (orderdates are midnight)
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1500)
    return o.select(
        "o_orderkey",
        F.expr("timestampdiff(DAY, o_orderdate, TIMESTAMP '1999-01-01 00:00:00')")
            .alias("days_to_1999"),
        F.expr("timestampadd(DAY, 30, o_orderdate)").alias("plus_30d"),
        (F.col("o_orderdate") - F.expr("INTERVAL 6 HOURS")).alias("minus_6h"),
        F.expr("make_timestamp(year(o_orderdate), 7, 1, 12, 0, 0)")
            .alias("july_noon"),
    )


@query(
    "fn_binary_encoding", "relational",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           to_base64(encode(substring(text, 1, 12))) AS head_b64,
           lower(hex(encode(substring(text, 1, 8)))) AS head_hex,
           octet_length(encode(text)) AS n_bytes,
           substring(text, 1, 12) AS roundtrip
    FROM documents WHERE doc_id <= 200
    """,
    description="md5/sha2/base64/hex/encode-decode binary functions",
)
def fn_binary_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    head12 = F.substring("text", 1, 12)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.base64(F.encode(head12, "utf-8")).alias("head_b64"),
        # Spark hex is uppercase, DuckDB lowercase — normalize here
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "utf-8")))
            .alias("head_hex"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.decode(F.encode(head12, "utf-8"), "utf-8").alias("roundtrip"),
    )


@query(
    "fn_string_distance", "relational",
    oracle="""
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           a.p_name AS a_name, b.p_name AS b_name,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    description="edit-distance fuzzy matching: blocked pair join + bounded levenshtein",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fuzzy string matching, the scalar backbone of fuzzy dedup.
    # Scale shape (r4 rewrite, caught by the sf1 rehearsal): the naive
    # brand-blocked self-join enumerates Σ block² id pairs BEFORE the
    # distance test — 1.6B pairs at sf1 (25 brands), 58x the sf0.1 wall
    # time for 10x the data. But the VALUE space is tiny (64 distinct
    # names), so compress the quadratic step onto it: (1) distance
    # matrix over DISTINCT names only (64² bounded-levenshtein calls,
    # the 3-arg DP early-exits past the bound), (2) keep surviving name
    # pairs (a few hundred, broadcast), (3) two hash joins fan the name
    # pairs back out to id pairs — enumerated rows = the OUTPUT, never
    # the block square. The classic distinct-before-quadratic move
    # (same insight as array_distinct-before-explode in the dedup
    # family). For genuinely high-cardinality names the swap is
    # SymSpell/PassJoin candidate generation (deletion neighborhoods /
    # segment pigeonhole) + the same verify; this corpus is the
    # low-cardinality regime where the distinct matrix is optimal.
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    dn = p.select("p_name").distinct()
    na, nb = dn.alias("na"), dn.alias("nb")
    dist = F.levenshtein(F.col("na.p_name"), F.col("nb.p_name"), 3)
    name_pairs = (na.crossJoin(nb)           # 64 x 64 — broadcast-sized
                  .select(F.col("na.p_name").alias("name_a"),
                          F.col("nb.p_name").alias("name_b"),
                          dist.alias("edit_dist"))
                  .filter(F.col("edit_dist") >= 0))
    a, b = p.alias("a"), p.alias("b")
    return (a.join(F.broadcast(name_pairs),
                   F.col("a.p_name") == F.col("name_a"))
            .join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
                  & (F.col("b.p_name") == F.col("name_b"))
                  & (F.col("a.p_partkey") < F.col("b.p_partkey")))
            .select(F.col("a.p_partkey").alias("a_key"),
                    F.col("b.p_partkey").alias("b_key"),
                    F.col("a.p_name").alias("a_name"),
                    F.col("b.p_name").alias("b_name"),
                    "edit_dist"))


@query(
    "fn_bitwise", "relational",
    oracle="""
    SELECT o_orderkey,
           (o_orderkey << 3) AS shl,
           (o_orderkey >> 2) AS shr,
           (o_orderkey & 255) AS low_byte,
           (o_orderkey | 4096) AS with_flag,
           xor(o_orderkey, 1365) AS toggled,
           CAST(bit_count(o_orderkey) AS INT) AS popcount,
           (~o_orderkey) AS flipped
    FROM orders WHERE o_orderkey <= 2000
    """,
    description="bitwise scalar family: shifts, and/or/xor/not, popcount",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bit manipulation on a bigint key — the building blocks of hash
    # mixing, bloom-filter addressing, and bitmap indexes. All pure
    # codegen projections (no shuffle); the filter pushes to the scan.
    k = F.col("o_orderkey")
    return (t(spark, sf_dir, "orders").filter(k <= 2000)
            .select(
                "o_orderkey",
                F.shiftleft(k, 3).alias("shl"),
                F.shiftright(k, 2).alias("shr"),
                k.bitwiseAND(F.lit(255)).alias("low_byte"),
                k.bitwiseOR(F.lit(4096)).alias("with_flag"),
                k.bitwiseXOR(F.lit(1365)).alias("toggled"),
                F.bit_count(k).alias("popcount"),
                F.bitwise_not(k).alias("flipped"),
            ))


@query(
    "fn_engine_introspection", "relational",
    # The VALUES (row uids, partition ids, file paths) are engine-
    # physical, but their CONTRACTS are driver-checkable: exact row
    # count, uid uniqueness, every source path a parquet file, at least
    # one partition. A uid collision or broken file stamping flips a
    # flag and hash-fails; the raw per-row surface stays available via
    # the same select in tests.
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(1 AS BIGINT) AS uids_unique,
           CAST(1 AS BIGINT) AS files_parquet,
           CAST(1 AS BIGINT) AS has_partitions
    FROM lineitem
    """,
    description="engine introspection contracts: unique row uids, parquet file lineage, live partitions",
)
def fn_engine_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # physical-introspection functions: unique-but-not-contiguous row
    # ids, the executing partition, and the originating file — the
    # lineage columns a 100 TB ingest job stamps on every record
    li = t(spark, sf_dir, "lineitem")
    d = li.select(
        F.monotonically_increasing_id().alias("row_uid"),
        F.spark_partition_id().alias("part_id"),
        F.input_file_name().alias("src_file"),
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.countDistinct("row_uid") == F.count(F.lit(1)))
        .cast("long").alias("uids_unique"),
        F.min(F.col("src_file").endswith(".parquet").cast("long"))
        .alias("files_parquet"),
        (F.countDistinct("part_id") >= 1).cast("long").alias("has_partitions"),
    )


@query(
    "fn_url_parse", "relational",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           'n=' || CAST(n_chars AS VARCHAR) || '&tag=doc' AS query,
           CAST(n_chars AS VARCHAR) AS n_param,
           replace(lang || ' ' || source, ' ', '+') AS encoded,
           lang || ' ' || source AS decoded
    FROM documents
    """,
    description="URL functions: parse_url HOST/PATH/QUERY/param + url_encode/decode",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build a URL per document from typed columns, then take it apart
    # with parse_url; the oracle reconstructs each component from the
    # same columns directly. url_encode is exercised on a space-bearing
    # payload (Java URLEncoder: space -> '+') and round-tripped with
    # url_decode. All shuffle-free codegen'd projections.
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?n="), F.col("n_chars").cast("string"), F.lit("&tag=doc"))
    payload = F.concat(F.col("lang"), F.lit(" "), F.col("source"))
    u = d.select("doc_id", url.alias("url"), payload.alias("payload"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("n")).alias("n_param"),
        F.url_encode("payload").alias("encoded"),
        F.url_decode(F.url_encode("payload")).alias("decoded"))


@query(
    "fn_xml_parse", "relational",
    oracle="""
    SELECT event_id,
           event_id AS xml_id,
           event_type AS xml_type,
           CAST(ROUND(value * 100) AS BIGINT) AS xml_cents,
           event_type AS xpath_type
    FROM events
    """,
    description="XML functions: from_xml schema extraction + xpath_string",
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build an XML document per event from typed columns, parse it back
    # with from_xml (explicit schema) and xpath_string; the oracle
    # reconstructs the extracted fields from the same columns directly
    # (same pattern as fn_url_parse). Cents are carried as an integer
    # element so the round-trip has no float-formatting ambiguity.
    e = t(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<e><id>"), F.col("event_id").cast("string"),
        F.lit("</id><type>"), F.col("event_type"),
        F.lit("</type><cents>"),
        F.round(F.col("value") * 100).cast("long").cast("string"),
        F.lit("</cents></e>"))
    u = e.select("event_id", xml.alias("xml"))
    parsed = F.from_xml("xml", "id BIGINT, type STRING, cents BIGINT")
    return u.select(
        "event_id",
        parsed.getField("id").alias("xml_id"),
        parsed.getField("type").alias("xml_type"),
        parsed.getField("cents").alias("xml_cents"),
        F.xpath_string("xml", F.lit("/e/type")).alias("xpath_type"))


@query(
    "fn_csv_parse", "relational",
    oracle="""
    SELECT event_id,
           event_type AS csv_type,
           event_id AS csv_id,
           event_type || ',' || CAST(event_id AS VARCHAR) AS rebuilt
    FROM events
    """,
    description="inline CSV functions: from_csv schema extraction + to_csv",
)
def fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inline CSV codec (from_csv/to_csv work on COLUMNS, unlike the
    # file-source CSV scan): build a line from typed columns, parse it
    # back with an explicit schema, re-serialize. Reconstruction oracle.
    e = t(spark, sf_dir, "events")
    line = F.concat(F.col("event_type"), F.lit(","),
                    F.col("event_id").cast("string"))
    parsed = F.from_csv(line, F.lit("t STRING, id BIGINT"))
    return e.select(
        "event_id",
        parsed.getField("t").alias("csv_type"),
        parsed.getField("id").alias("csv_id"),
        F.to_csv(F.struct(F.col("event_type").alias("a"),
                          F.col("event_id").alias("b"))).alias("rebuilt"))


@query(
    "sample_fixed_per_stratum", "relational",
    # Exact-size stratified sampling: EXACTLY min(k, |stratum|) docs per
    # source, selected by md5('s:' || doc_id) order — the build-an-
    # eval-set primitive (fraction-based sampleBy cannot hit an exact
    # count). Content-addressed, so re-sharding or re-running yields the
    # identical sample, and both engines rank the same lowercase-hex
    # strings. One shuffle on the stratum key; k rows survive per
    # stratum. If one stratum dominates at 100 TB, swap the window for
    # operators/ranking.global_rank within that stratum — same output.
    oracle="""
    SELECT doc_id, source, pick_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS pick_rank
        FROM documents) r
    WHERE pick_rank <= 20
    """,
    description="exact-count stratified sample: top-20 per source by content hash (deterministic eval-set builder)",
)
def sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.ranking import salted_key
    d = t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
         .orderBy(salted_key("doc_id", "s:"), "doc_id"))
    return (d.select("doc_id", "source",
                     F.row_number().over(w).alias("pick_rank"))
            .filter(F.col("pick_rank") <= 20))


@query(
    "sample_temperature_mixture", "relational",
    # Temperature-based mixture sampling (the multilingual-LM source
    # rebalancing rule, alpha = 0.5): target share of stratum s is
    # n_s^alpha / SUM(n_t^alpha), so tail languages are UPsampled
    # relative to their corpus share within a budget of floor(N/2)
    # rows. Fully deterministic and engine-portable: per-stratum
    # weights ride an exact integer 1e-6 grid (sqrt is IEEE
    # correctly-rounded, the grid makes the SUM order-independent),
    # the keep probability is one double division of exact integers,
    # and the per-row draw is the first 8 md5 hex digits of the
    # 't:'-salted doc id against floor(p * 2^32) — the same
    # content-hash idiom as sample_hash_bernoulli, so the sample is a
    # pure function of the data. Scale shape: one low-cardinality
    # map-side-combinable groupBy builds the weight table, which joins
    # back as a BROADCAST; the corpus itself is filtered map-side,
    # never shuffled.
    oracle="""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_s,
               CAST(ROUND(sqrt(COUNT(*)) * 1e6, 0) AS BIGINT) AS w_s
        FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n_s) AS n_total, SUM(w_s) AS w_total FROM counts),
    thresh AS (
        -- every factor cast to DOUBLE BEFORE multiplying: budget*w_s and
        -- w_total*n_s in BIGINT overflow 2^63 around 1e9-row strata (the
        -- ratio only needs ~1 ulp, and each factor is < 2^53 so the
        -- double products round identically in both engines)
        SELECT lang,
               CAST(floor(least(
                   1.0,
                   (CAST(CAST(floor(n_total / 2) AS BIGINT) AS DOUBLE)
                        * CAST(w_s AS DOUBLE))
                       / (CAST(w_total AS DOUBLE) * CAST(n_s AS DOUBLE)))
                   * 4294967296.0)
                    AS BIGINT) AS t_s
        FROM counts, tot)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thresh s USING (lang)
    WHERE CAST('0x' || substring(
              md5('t:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          < s.t_s
    """,
    description="temperature mixture sampling (alpha=0.5): n_s^0.5-weighted per-lang budget, content-hash draw, broadcast weights",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import salted_key
    d = t(spark, sf_dir, "documents")
    counts = (d.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n_s"))
              .withColumn("w_s", F.round(F.sqrt(F.col("n_s")) * 1e6, 0)
                          .cast("long")))
    tot = counts.agg(F.sum("n_s").alias("n_total"),
                     F.sum("w_s").alias("w_total"))
    # cast each factor to double BEFORE the multiply: the BIGINT products
    # budget*w_s / w_total*n_s pass 2^63 around 1e9-row strata and would
    # error under ANSI mode at exactly the scale this operator targets
    thresh = (counts.crossJoin(F.broadcast(tot))
              .select("lang", F.floor(F.least(
                  F.lit(1.0),
                  (F.floor(F.col("n_total") / 2).cast("long").cast("double")
                   * F.col("w_s").cast("double"))
                  / (F.col("w_total").cast("double")
                     * F.col("n_s").cast("double")))
                  * F.lit(4294967296.0)).cast("long").alias("t_s")))
    draw = F.conv(F.substring(salted_key("doc_id", "t:"), 1, 8),
                  16, 10).cast("long")
    return (d.join(F.broadcast(thresh), "lang")
            .filter(draw < F.col("t_s"))
            .select("doc_id", "lang"))


# ---------------------------------------------------------------------------
# fn_string_distance scale lanes (VERDICT r7 task #3 / r8 task #3)
#
# The distinct-name-matrix lane above is quadratic in DISTINCT names —
# the right trade at <=10k names (SCALE.md), 13x/decade past that. The
# scale swap is PassJoin segment-pigeonhole candidate generation (Li,
# Deng, Feng: "PassJoin: A Partition-based Method for Similarity Joins",
# PVLDB 5(3), public algorithm): split every indexed name into D+1
# contiguous segments; if edit(a, b) <= D then at least one segment of
# the SHORTER string survives unedited and appears verbatim in the
# longer one, shifted by at most D. Candidate generation is therefore an
# EQUI-join on (segment text, segment index, indexed length) — linear
# index (D+1 rows/name), bounded probe fan-out ((D+1) lengths x (D+1)
# segments x (2D+1) positions ~ 112 keys/name at D=3) — instead of the
# N² name matrix. The bounded-levenshtein verify is shared with the
# matrix lane, so both lanes emit identical rows by construction and
# carry the SAME oracle.
_SD_BOUND = 3                      # the query's edit-distance threshold
_SD_SEGMENTS = _SD_BOUND + 1       # pigeonhole segment count
# matrix lane wins while distinct-names² bounded-DP calls stay cheaper
# than the posting machinery (SCALE.md: 6.4k names = 29 s at sf10; the
# crossover measured in tests/test_string_distance_lanes.py)
STRING_DISTANCE_MATRIX_CAP = 10_000


def _sd_segment_cols(l_col: str):
    """Segment geometry for splitting a length-`l_col` string into
    _SD_SEGMENTS contiguous pieces: first (K - l%K) of length l DIV K,
    the rest one longer. Returns (seg_len, seg_start) column exprs for a
    row that already has an `i` segment-index column."""
    base = F.expr(f"{l_col} DIV {_SD_SEGMENTS}")
    rem = F.col(l_col) % _SD_SEGMENTS
    n_short = F.lit(_SD_SEGMENTS) - rem
    seg_len = base + F.when(F.col("i") >= n_short, 1).otherwise(0)
    seg_start = (F.col("i") * base
                 + F.greatest(F.lit(0), F.col("i") - n_short))
    return seg_len, seg_start


def _sd_passjoin_name_pairs(dn: DataFrame) -> DataFrame:
    """All ordered pairs (name_a, name_b, edit_dist) with
    edit_dist <= _SD_BOUND over the distinct-name table `dn` (one
    string column `p_name`) — the PassJoin way.

    Index side: D+1 (segment, index, length) rows per name.
    Probe side: for each name of length m, every substring that a
    segment of a MATCHING shorter name (length l in [m-D, m]) could
    occupy — segment-length substrings at starts within +-D of the
    segment's home position. Equi-join, dedupe, bounded-DP verify,
    then symmetrize and add the trivial self-pairs (distance 0), so
    the output contract is identical to the matrix lane's name_pairs.
    """
    seg_idx = F.explode(
        F.sequence(F.lit(0), F.lit(_SD_SEGMENTS - 1))).alias("i")
    n = dn.select(F.col("p_name").alias("name"),
                  F.length("p_name").alias("l"))

    seg_len, seg_start = _sd_segment_cols("l")
    idx = (n.select("name", "l", seg_idx)
           .withColumn("seg_len", seg_len)
           .withColumn("seg_start", seg_start)
           .select(F.col("name").alias("name_idx"), "l", "i",
                   F.expr("substring(name, seg_start + 1, seg_len)")
                   .alias("seg")))

    pr = (n.select(F.col("name").alias("probe"), F.col("l").alias("m"))
          .withColumn("l", F.explode(F.sequence(
              F.greatest(F.lit(1), F.col("m") - _SD_BOUND), F.col("m"))))
          .select("probe", "m", "l", seg_idx))
    seg_len, seg_start = _sd_segment_cols("l")
    pr = (pr.withColumn("seg_len", seg_len)
          .withColumn("seg_start", seg_start)
          # pigeonhole shift window: an unedited segment moves <= D
          .withColumn("p", F.explode(F.sequence(
              F.greatest(F.lit(0), F.col("seg_start") - _SD_BOUND),
              F.least(F.col("m") - F.col("seg_len"),
                      F.col("seg_start") + _SD_BOUND))))
          .select("probe", "m", "l", "i",
                  F.expr("substring(probe, p + 1, seg_len)").alias("sub")))

    # Both join sides grow linearly with distinct names (index 4/name,
    # probe ~112/name) — at the >=10^5-name cardinalities this lane is
    # FOR, neither fits a broadcast (50k names already OOMed the
    # driver's auto-broadcast). Pin the scalable plan: shuffled hash
    # join building on the 28x-smaller index side.
    cand = (idx.hint("shuffle_hash")
            .join(pr, (idx["seg"] == pr["sub"])
                     & (idx["l"] == pr["l"]) & (idx["i"] == pr["i"])
                     # unordered pairs: shorter (or lex-smaller on ties)
                     # name is always the indexed side
                     & ((idx["l"] < pr["m"])
                        | ((idx["l"] == pr["m"])
                           & (idx["name_idx"] < pr["probe"]))))
            .select("name_idx", "probe").distinct())

    dist = F.levenshtein(F.col("name_idx"), F.col("probe"), _SD_BOUND)
    verified = (cand.select("name_idx", "probe", dist.alias("edit_dist"))
                .filter(F.col("edit_dist") >= 0))
    return (verified
            .select(F.col("name_idx").alias("name_a"),
                    F.col("probe").alias("name_b"), "edit_dist")
            .unionAll(verified.select(
                F.col("probe").alias("name_a"),
                F.col("name_idx").alias("name_b"), "edit_dist"))
            .unionAll(dn.select(
                F.col("p_name").alias("name_a"),
                F.col("p_name").alias("name_b"),
                F.lit(0).alias("edit_dist"))))


def _sd_fanout(p: DataFrame, name_pairs: DataFrame) -> DataFrame:
    """Shared tail of both lanes: broadcast the surviving name pairs and
    fan them back out to brand-blocked id pairs — enumerated rows = the
    OUTPUT, never a block square."""
    a, b = p.alias("a"), p.alias("b")
    return (a.join(F.broadcast(name_pairs),
                   F.col("a.p_name") == F.col("name_a"))
            .join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
                  & (F.col("b.p_name") == F.col("name_b"))
                  & (F.col("a.p_partkey") < F.col("b.p_partkey")))
            .select(F.col("a.p_partkey").alias("a_key"),
                    F.col("b.p_partkey").alias("b_key"),
                    F.col("a.p_name").alias("a_name"),
                    F.col("b.p_name").alias("b_name"),
                    "edit_dist"))


def string_distance_lane_decision(
        spark: SparkSession, sf_dir: str,
        matrix_cap: int = STRING_DISTANCE_MATRIX_CAP) -> dict:
    """The pick-by-cardinality rule as EXECUTABLE code (the
    tfidf_lane_decision pattern): one metadata-scale count decides.
    matrix work ~ n_distinct² bounded-DP calls; passjoin work ~
    n_distinct x ~112 probe keys + verified candidates. The quadratic
    term loses past ~10k distinct names (SCALE.md crossover)."""
    n = (t(spark, sf_dir, "part").select("p_name").distinct().count())
    return {"n_distinct_names": n, "matrix_cap": matrix_cap,
            "lane": "matrix" if n <= matrix_cap else "passjoin"}


_SD_ORACLE = """
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           a.p_name AS a_name, b.p_name AS b_name,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """


@query(
    "fn_string_distance_passjoin", "relational",
    oracle=_SD_ORACLE,
    description="edit-distance fuzzy matching, PassJoin segment-pigeonhole lane: equi-join candidates + bounded-DP verify",
)
def fn_string_distance_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    return _sd_fanout(p, _sd_passjoin_name_pairs(p.select("p_name")
                                                 .distinct()))


@query(
    "fn_string_distance_auto", "relational",
    # The twins under ONE entry point (the sim_tfidf_auto_lane pattern):
    # output and oracle identical to both lanes by construction, so the
    # driver gate also proves the dispatch doesn't perturb results.
    oracle=_SD_ORACLE,
    description="edit-distance fuzzy matching with executable lane pick: distinct-name matrix vs PassJoin by name cardinality",
)
def fn_string_distance_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    lane = string_distance_lane_decision(spark, sf_dir)["lane"]
    if lane == "matrix":
        return fn_string_distance(spark, sf_dir)
    return fn_string_distance_passjoin(spark, sf_dir)
