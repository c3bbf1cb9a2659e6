"""Batch-form window operators (oracle-checked value semantics for the
streaming layer).

The window logic lives in streaming/windows.py and is IDENTICAL for
batch and streaming frames; tests/test_streaming.py proves
stream-batch equivalence by replaying events through a file source.
Here the batch form is proven value-exact against DuckDB (which has no
window()/session_window(): tumbling/sliding become epoch-bucket
arithmetic, session windows become gaps-and-islands).

Spark's window() aligns to the 1970 epoch; make_timestamp(µs) keeps the
oracle timestamps naive (DuckDB to_timestamp would produce TIMESTAMPTZ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..streaming.windows import session_windows, sliding_counts, tumbling_counts
from ._util import t
from .registry import query

_6H = 6 * 3600


@query(
    "stream_tumbling_window", "streaming",
    oracle=f"""
    SELECT make_timestamp(CAST(floor(epoch(ts) / {_6H}) * {_6H} AS BIGINT) * 1000000)
               AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description="tumbling event-time window (epoch-aligned) + exact sums",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(t(spark, sf_dir, "events"), width="6 hours")


@query(
    "stream_sliding_window", "streaming",
    oracle=f"""
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM (
        SELECT make_timestamp(
                   (CAST(floor(epoch(ts) / {_6H}) * {_6H} AS BIGINT)
                    - {_6H} * shift.i) * 1000000) AS window_start,
               value
        FROM events, (SELECT unnest([0, 1]) AS i) shift
    )
    GROUP BY window_start
    """,
    description="sliding window 12h/6h: each event in two windows",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(t(spark, sf_dir, "events"),
                          width="12 hours", slide="6 hours")


@query(
    "stream_session_window", "streaming",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event_id
    FROM islands
    GROUP BY user_id, sess_no
    """,
    description="session windows (30 min gap) == gaps-and-islands in SQL",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(t(spark, sf_dir, "events"), gap="30 minutes")


@query(
    "stream_stream_join", "streaming",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           epoch_ms(p.ts) - epoch_ms(v.ts) AS ms_to_purchase,
           p.value AS purchase_value
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 6 HOUR
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    description="stream-stream interval join (view->purchase attribution), batch form",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import view_purchase_attribution
    return view_purchase_attribution(t(spark, sf_dir, "events"))


@query(
    "stream_hypertable_rollup", "streaming",
    oracle="""
    SELECT CASE WHEN resolution = 0 THEN 'minute'
                WHEN resolution = 1 THEN 'hour'
                ELSE 'day' END AS resolution,
           bucket, event_type, n_events,
           CAST(total_cents AS DOUBLE) / 100.0 AS total_value
    FROM (
        SELECT CASE WHEN GROUPING(m) = 0 THEN 0
                    WHEN GROUPING(h) = 0 THEN 1
                    ELSE 2 END AS resolution,
               coalesce(m, h, d) AS bucket, event_type,
               COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_cents
        FROM (
            SELECT date_trunc('minute', ts) AS m,
                   date_trunc('hour', ts) AS h,
                   date_trunc('day', ts) AS d,
                   event_type, value
            FROM events
        ) b
        GROUP BY GROUPING SETS ((m, event_type), (h, event_type),
                                (d, event_type))
    ) r
    """,
    description="hypertable-style continuous aggregate: minute->hour->day cascade",
)
def stream_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TimescaleDB-style multi-resolution rollup, single-pass: aggregate
    # raw data to minute grain ONCE (the only shuffle of raw rows),
    # then one GROUPING SETS pass over the tiny minute table emits
    # minute/hour/day together. A naive unionByName of cascaded
    # aggregates LOOKS the same but plans as three full raw rescans
    # (Spark shares no subplans across union branches — measured: 3x
    # "Scan parquet", zero ReusedExchange); grouping sets over the
    # reduced table keeps one raw scan + one Expand of ~minute-grain
    # cardinality, which is the plan that survives 100 TB.
    from pyspark.sql import functions as F
    e = t(spark, sf_dir, "events")
    minute = (e.select(F.date_trunc("minute", "ts").alias("m"),
                       "event_type",
                       F.round(F.col("value") * 100).cast("long").alias("cents"))
              .groupBy("m", "event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum("cents").alias("total_cents")))
    minute.select("m", F.date_trunc("hour", "m").alias("h"),
                  F.date_trunc("day", "m").alias("d"),
                  "event_type", "n_events", "total_cents") \
        .createOrReplaceTempView("ht_minute_grain")
    return spark.sql("""
        SELECT CASE WHEN grouping(m) = 0 THEN 'minute'
                    WHEN grouping(h) = 0 THEN 'hour'
                    ELSE 'day' END AS resolution,
               coalesce(m, h, d) AS bucket, event_type,
               SUM(n_events) AS n_events,
               CAST(SUM(total_cents) AS DOUBLE) / 100.0 AS total_value
        FROM ht_minute_grain
        GROUP BY GROUPING SETS ((m, event_type), (h, event_type),
                                (d, event_type))
    """)


@query(
    "stream_gap_fill", "streaming",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY event_type, bucket
    ), spans AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM hourly GROUP BY event_type
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM spans
    )
    SELECT g.event_type, g.bucket,
           coalesce(h.n_events, 0) AS n_events,
           CAST(coalesce(h.cents, 0) AS DOUBLE) / 100.0 AS total_value,
           (h.bucket IS NULL) AS is_gap,
           CAST(last_value(h.cents IGNORE NULLS) OVER (
                PARTITION BY g.event_type ORDER BY g.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS locf_value
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.bucket = h.bucket
    """,
    description="time-series gap fill: dense hour grid + zero-fill + LOCF carry-forward",
)
def stream_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hypertable-style densification (the other half of the rollup
    # cascade): aggregate to hour grain, then LEFT JOIN against a
    # generated dense per-type hour grid (sequence+explode — generated
    # from the tiny span table, never from raw data) and fill gaps two
    # ways: zero-fill and last-observation-carried-forward via an
    # IGNORE NULLS running window. At 100 TB the grid side is
    # (n_types x hours) rows — trivially broadcastable — and the only
    # shuffle of real data is the hour-grain aggregate itself.
    from pyspark.sql import functions as F
    e = t(spark, sf_dir, "events")
    hourly = (e.select("event_type", F.date_trunc("hour", "ts").alias("bucket"),
                       F.round(F.col("value") * 100).cast("long").alias("cents"))
              .groupBy("event_type", "bucket")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum("cents").alias("cents")))
    grid = (hourly.groupBy("event_type")
            .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
            .select("event_type",
                    F.explode(F.sequence("lo", "hi", F.expr(
                        "INTERVAL 1 HOUR"))).alias("bucket")))
    j = grid.join(hourly, ["event_type", "bucket"], "left")
    w = (Window.partitionBy("event_type").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        "event_type", "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (F.coalesce("cents", F.lit(0)).cast("double") / 100.0)
            .alias("total_value"),
        F.col("cents").isNull().alias("is_gap"),
        (F.last("cents", ignorenulls=True).over(w).cast("double") / 100.0)
            .alias("locf_value"))


@query(
    "stream_session_dynamic_gap", "streaming",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               ts + CASE event_type
                        WHEN 'purchase' THEN INTERVAL 60 MINUTE
                        WHEN 'view' THEN INTERVAL 15 MINUTE
                        ELSE INTERVAL 30 MINUTE END AS ev_end
        FROM events),
    o AS (
        SELECT *, max(ev_end) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) AS prev_end
        FROM g),
    f AS (SELECT *, CASE WHEN prev_end IS NULL OR ts > prev_end
                         THEN 1 ELSE 0 END AS is_new FROM o),
    isl AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sess
            FROM f)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ev_end) AS session_end,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event_id
    FROM isl GROUP BY user_id, sess
    """,
    description="dynamic-gap session windows (per-event-type gap, union-merge ends)",
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window with a PER-EVENT gap expression: a purchase keeps
    # the session alive for 60 min, a view only 15. Each event spans
    # [ts, ts+gap) and overlapping spans union-merge, so session_end is
    # the MAX member end, not last-event + gap — the oracle states that
    # via a running-max gaps-and-islands. Same shuffle shape as the
    # fixed-gap form: one hash exchange on user_id, then state merges
    # in-partition; the gap CASE is a free codegen expression.
    gap = F.expr("CASE event_type WHEN 'purchase' THEN '60 minutes' "
                 "WHEN 'view' THEN '15 minutes' "
                 "ELSE '30 minutes' END")
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("first_event_id"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "first_event_id"))
