"""Window functions: ranking, analytic, frame aggregates, top-k per group
(SURVEY.md §2.2 window rows; absent from the reference — §2.1.1).

Determinism: every window ORDER BY ends in a unique tiebreak key so
ranking/lag/lead are reproducible. Running/moving SUMs over doubles use
the integer-cents trick (plans/_util.py) because engines may group
frame additions differently (e.g. segment trees); integer adds are
associative so any grouping agrees.

Scale notes: window partitions are bounded (per supplier / per user);
a partitionBy with a single giant key would serialize — the top-k query
keys on suppkey precisely so partitions stay small at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "win_ranking", "windows",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
    """,
    description="row_number/rank/dense_rank/ntile with unique tiebreak",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # partition key is the bounded-cardinality suppkey: ranking within a
    # 3-value key (returnflag) would put ~1/3 of the table on ONE task at
    # 100 TB — that shape belongs to the global-sort family, not windows
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_analytic", "windows",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_or_default,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_val_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="lag/lead (with default)/first_value/last_value over frames",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("last_val_so_far"),
    )


@query(
    "win_frames", "windows",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / 100.0 AS running_total,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / 100.0
               / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
               AS moving_avg4,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_so_far
    FROM events
    """,
    description="running sum + moving average over row frames (exact cents)",
)
def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = w.rowsBetween(-3, W.currentRow)
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id", "user_id",
        (F.sum(cents).over(running).cast("double") / 100.0).alias("running_total"),
        (F.sum(cents).over(moving).cast("double") / 100.0
            / F.count(F.lit(1)).over(moving)).alias("moving_avg4"),
        F.count(F.lit(1)).over(running).alias("n_so_far"),
    )


@query(
    "win_topk_per_group", "windows",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC,
                                           l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ) ranked
    WHERE rn <= 3
    """,
    description="top-k per group via row_number filter (the scalable top-k idiom)",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


@query(
    "win_dist_functions", "windows",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(percent_rank() OVER w, 9) AS pct_rank,
           ROUND(cume_dist() OVER w, 9) AS cume,
           nth_value(c_name, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS third_name
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
    """,
    description="percent_rank / cume_dist / nth_value distribution windows",
)
def win_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey", "c_nationkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.nth_value("c_name", 3).over(w_full).alias("third_name"),
    )


@query(
    "win_interval_range_frame", "windows",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_2h,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE)
               / 100.0 AS sum_last_2h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)
    """,
    description="time-interval RANGE frame (trailing 2h per user)",
)
def win_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id", "user_id", "ts",
        F.expr("""COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)""")
            .alias("n_last_2h"),
        (F.expr("""SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)""")
            .cast("double") / 100.0).alias("sum_last_2h"),
    )


@query(
    "win_ignore_nulls", "windows",
    oracle="""
    SELECT event_id, user_id,
           last_value(big_val IGNORE NULLS) OVER w AS last_big_seen,
           first_value(big_val IGNORE NULLS) OVER w AS first_big_seen
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN value > 400 THEN value END AS big_val
        FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    description="first/last_value IGNORE NULLS (last-observation-carried-forward)",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "ts",
        F.when(F.col("value") > 400, F.col("value")).alias("big_val"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return base.select(
        "event_id", "user_id",
        F.last("big_val", ignorenulls=True).over(w).alias("last_big_seen"),
        F.first("big_val", ignorenulls=True).over(w).alias("first_big_seen"),
    )


@query(
    "win_running_median", "windows",
    oracle="""
    SELECT o_orderkey, o_custkey,
           quantile_cont(cents, 0.5) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0
             AS run_median
    FROM (SELECT o_orderkey, o_custkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders) b
    """,
    description="running median over a row frame (percentile window fn)",
)
def win_running_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Windowed exact median (Spark: percentile() over a frame; median()
    # itself rejects frames). Interpolation runs on integer cents, where
    # the 0.5 midpoint (a+b)/2 is exact in IEEE for either op order, so
    # Spark's and DuckDB's different interpolation formulas agree bit
    # for bit; the /100.0 is one identical final division. Keyed per
    # customer (bounded ~dozens of orders) so window partitions stay
    # small at 100 TB — never a handful of giant priority-class keys.
    o = t(spark, sf_dir, "orders")
    o.select("o_orderkey", "o_custkey",
             F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
             ).createOrReplaceTempView("win_median_base")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               percentile(cents, 0.5) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0
                 AS run_median
        FROM win_median_base
    """)


@query(
    "win_funnel_stages", "windows",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               min(CASE WHEN event_type = 'view' THEN ts END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_view
        FROM events),
    c AS (
        SELECT *,
               min(CASE WHEN event_type = 'click'
                         AND prior_view IS NOT NULL THEN ts END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_ok_click
        FROM o)
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT CASE WHEN event_type = 'view'
                               THEN user_id END) AS n_viewed,
           COUNT(DISTINCT CASE WHEN event_type = 'click'
                                AND prior_view IS NOT NULL
                               THEN user_id END) AS n_clicked_after_view,
           COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                AND prior_ok_click IS NOT NULL
                               THEN user_id END) AS n_purchased_after_click
    FROM c
    """,
    description="ordered-sequence funnel (view -> click -> purchase), strict event order, single-sort window chain",
)
def win_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: a click counts only if a view happened
    STRICTLY earlier for that user, a purchase only if such a click
    happened strictly earlier — "earlier" under the total (ts,
    event_id) order, so ties are deterministic cross-engine.

    The stage chain is two running-min windows over the SAME
    (user_id; ts, event_id) window spec — Catalyst plans them in one
    Exchange + one Sort (asserted in test_plans.py): at 100 TB the
    whole N-stage funnel costs a single shuffle of the events table,
    not one pass per stage (the naive agg-join-agg chain would
    shuffle N times). The final count-distincts sit on the already
    partitioned data.
    """
    e = t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    prior_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    o = e.select("user_id", "event_type", "ts", "event_id",
                 prior_view.alias("prior_view"))
    prior_ok_click = F.min(
        F.when((F.col("event_type") == "click")
               & F.col("prior_view").isNotNull(), F.col("ts"))).over(w)
    c = o.withColumn("prior_ok_click", prior_ok_click)
    return c.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.when(F.col("event_type") == "view",
                               F.col("user_id"))).alias("n_viewed"),
        F.countDistinct(F.when((F.col("event_type") == "click")
                               & F.col("prior_view").isNotNull(),
                               F.col("user_id")))
            .alias("n_clicked_after_view"),
        F.countDistinct(F.when((F.col("event_type") == "purchase")
                               & F.col("prior_ok_click").isNotNull(),
                               F.col("user_id")))
            .alias("n_purchased_after_click"))


@query(
    "win_cohort_retention", "windows",
    oracle="""
    WITH f AS (
        SELECT user_id, event_type, ts,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events)
    SELECT date_trunc('week', first_ts) AS cohort_week,
           CAST(floor(date_diff('day', CAST(date_trunc('week', first_ts) AS DATE),
                                 CAST(ts AS DATE)) / 7) AS BIGINT)
               AS week_offset,
           COUNT(DISTINCT user_id) AS n_active,
           COUNT(*) AS n_events
    FROM f
    GROUP BY 1, 2
    """,
    description="cohort retention matrix: first-seen week x weekly activity offset",
)
def win_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention analysis: bucket each user into the Monday-
    anchored week of their first event (their cohort), then count
    distinct active users per (cohort, weeks-since-cohort) cell.

    The cohort assignment is a window min over user_id — it rides the
    same shuffle the final aggregate needs anyway (user-correlated
    keys), so the whole matrix costs the events table two hash
    shuffles regardless of scale. Week arithmetic is date-only integer
    math, bit-deterministic cross-engine.
    """
    e = t(spark, sf_dir, "events")
    first_ts = F.min("ts").over(W.partitionBy("user_id"))
    f = e.select("user_id", "event_type", "ts", first_ts.alias("first_ts"))
    cohort = F.date_trunc("week", F.col("first_ts"))
    offset = F.floor(
        F.datediff(F.col("ts").cast("date"), cohort.cast("date")) / 7)
    return (f.groupBy(cohort.alias("cohort_week"),
                      offset.cast("long").alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("n_active"),
                 F.count(F.lit(1)).alias("n_events")))


@query(
    "win_time_weighted_avg", "windows",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts,
               min(ts) OVER (PARTITION BY user_id) AS first_ts,
               max(ts) OVER (PARTITION BY user_id) AS last_ts
        FROM events),
    w AS (
        SELECT user_id,
               SUM(CAST(cents AS HUGEINT)
                   * date_diff('microseconds', ts, next_ts)) AS wsum,
               date_diff('microseconds', min(first_ts), min(last_ts)) AS span_us,
               COUNT(*) AS n_events
        FROM o WHERE next_ts IS NOT NULL
        GROUP BY user_id)
    SELECT user_id, n_events + 1 AS n_events,
           ROUND(CAST(wsum AS DOUBLE)
                 / CAST(span_us AS DOUBLE) / 100.0, 6) AS twap
    FROM w WHERE span_us > 0
    """,
    description="time-weighted average value per user (TWAP): interval-weighted, exact integer accumulation",
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user — each reading is
    weighted by how long it was current (until the next event), the
    standard downsampling semantics for irregular time series (the
    hypertable-rollup companion: rollups answer "per bucket", TWAP
    answers "over the whole span").

    Exactness: weights are integer microseconds, values are exact
    integer cents, and the accumulation is a DECIMAL(38,0) sum
    (DuckDB HUGEINT) — order-independent, so the one double division
    at the end is bit-identical cross-engine. One shuffle: lead/min/max
    windows and the final per-user aggregate all share the user_id
    partitioning.
    """
    e = t(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    wp = W.partitionBy("user_id")
    o = e.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lead("ts").over(wo).alias("next_ts"),
        F.min("ts").over(wp).alias("first_ts"),
        F.max("ts").over(wp).alias("last_ts"))
    us = (F.unix_micros(F.col("next_ts"))
          - F.unix_micros(F.col("ts")))
    span = (F.unix_micros(F.min("last_ts"))
            - F.unix_micros(F.min("first_ts")))
    w = (o.filter(F.col("next_ts").isNotNull())
         .groupBy("user_id")
         .agg(F.sum((F.col("cents").cast("decimal(38,0)")
                     * us).cast("decimal(38,0)")).alias("wsum"),
              span.alias("span_us"),
              F.count(F.lit(1)).alias("n_events")))
    return (w.filter(F.col("span_us") > 0)
            .select("user_id",
                    (F.col("n_events") + 1).alias("n_events"),
                    F.round(F.col("wsum").cast("double")
                            / F.col("span_us").cast("double") / 100.0, 6)
                        .alias("twap")))


@query(
    "win_scd2_intervals", "windows",
    oracle="""
    WITH chg AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
    starts AS (
        SELECT user_id, event_type, ts, event_id
        FROM chg
        WHERE prev_type IS NULL OR prev_type <> event_type),
    iv AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM starts)
    SELECT user_id, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM iv
    """,
    description="SCD Type-2 history build: run-length validity intervals from an event stream",
)
def win_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) history from raw events: runs
    of the same event_type per user collapse into validity intervals
    [valid_from, valid_to), open-ended on the latest run — the standard
    way a dimension table's change history is materialized from a
    change stream.

    Run detection (lag != current) and interval closing (lead over the
    surviving run-starts) are two windows on the same (user_id; ts,
    event_id) spec with a filter between them — one shuffle + one sort
    of the events table total; no self-join, no aggregation. Ties are
    deterministic under the (ts, event_id) total order.
    """
    e = t(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(wo).alias("prev_type"))
    starts = chg.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type")))
    iv = starts.select(
        "user_id", "event_type", F.col("ts").alias("valid_from"),
        F.lead("ts").over(wo).alias("valid_to"))
    return iv.select("user_id", "event_type", "valid_from", "valid_to",
                     F.col("valid_to").isNull().alias("is_current"))
