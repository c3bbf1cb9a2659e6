"""Reference-pipeline parity queries (batch form, oracle-checked).

These validate the exact parse/route/derive semantics of the reference's
ProcessFunction (DataStreamProcessingJob.java:41-66) — P2 length guard,
P3 fixed-width carve-out, P4 session routing, P5 try-cast, P6 delay
metric, K1 error-drop — by synthesizing the fixed-width messages
deterministically from `events` in BOTH engines (see
streaming/messages.py for the layout and the synthesis rule) and
comparing parsed outputs. The same parse/split code paths run in the
real Structured Streaming pipeline (streaming/pipeline.py), which the
streaming tests exercise; here the logic is proven value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.messages import ORACLE_MESSAGE_VALUE_SQL, messages_from_events, parse_messages
from ..streaming.pipeline import split_branches
from ._util import t
from .registry import query
from .text import QUALITY_SCORE_SQL

_ORACLE_PARSED = f"""
    WITH msgs AS (
        SELECT {ORACLE_MESSAGE_VALUE_SQL} AS value FROM events
    ),
    parsed AS (
        SELECT trim(substring(value, 1, 16)) AS module_name,
               TRY_CAST(trim(substring(value, 17, 16)) AS BIGINT) AS send_ts_ms,
               substring(value, 65) AS payload,
               value
        FROM msgs
        WHERE length(value) > 64
    )
"""


@query(
    "pipeline_parse_fields", "pipeline",
    oracle=_ORACLE_PARSED + """
    SELECT module_name, send_ts_ms, payload, length(value) AS msg_len
    FROM parsed
    """,
    description="fixed-width parse: P2 length guard + P3 carve-out + P5 cast",
)
def pipeline_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = messages_from_events(t(spark, sf_dir, "events"))
    parsed = parse_messages(msgs)
    return parsed.select(
        "module_name", "send_ts_ms", "payload",
        F.length("value").cast("long").alias("msg_len"),
    )


@query(
    "pipeline_route_session", "pipeline",
    oracle=_ORACLE_PARSED + """
    SELECT payload FROM parsed WHERE module_name = 'session'
    """,
    description="R1/P4 routing: session branch payload tails",
)
def pipeline_route_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = messages_from_events(t(spark, sf_dir, "events"))
    return split_branches(msgs, now_ms=F.lit(0)).session_tails


@query(
    "pipeline_delay_metric", "pipeline",
    oracle=_ORACLE_PARSED + """
    , now_fixed AS (SELECT MAX(epoch_ms(ts)) + 60000 AS now_ms FROM events)
    SELECT date_trunc('day', epoch_ms(send_ts_ms)) AS day,
           COUNT(*) AS n_msgs,
           CAST(SUM(now_ms - send_ts_ms) AS DOUBLE) / COUNT(*) AS avg_delay_ms,
           MAX(now_ms - send_ts_ms) AS max_delay_ms
    FROM parsed, now_fixed
    WHERE module_name = 'session' AND send_ts_ms IS NOT NULL
    GROUP BY date_trunc('day', epoch_ms(send_ts_ms))
    """,
    description="P6+A2: derived latency with frozen now + windowed avg",
)
def pipeline_delay_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE plan, one scan (r9; was a driver-side scalar collect + a
    # second scan — the collect alone cost ~0.2 s of the query's
    # ~0.75 s at sf0.1): the frozen `now` rides a single-row broadcast
    # cross-join (the sample_temperature_mixture pattern), and
    # delay_ms = _now_ms - send_ts_ms is computed per row pre-agg, so
    # the SUM/MAX integer arithmetic is bit-identical to the oracle's
    # SUM(now_ms - send_ts_ms).
    e = t(spark, sf_dir, "events")
    now_df = e.agg((F.max(F.unix_millis("ts")) + 60000).alias("_now_ms"))
    msgs = messages_from_events(e)
    sends = (split_branches(msgs, now_ms=F.lit(0)).delays
             .select("send_ts_ms")
             .crossJoin(F.broadcast(now_df)))
    delay = F.col("_now_ms") - F.col("send_ts_ms")
    return (
        sends.groupBy(F.date_trunc("day", F.timestamp_millis("send_ts_ms"))
                      .alias("day"))
        .agg(F.count(F.lit(1)).alias("n_msgs"),
             (F.sum(delay).cast("double") / F.count(F.lit(1)))
                 .alias("avg_delay_ms"),
             F.max(delay).alias("max_delay_ms"))
    )


@query(
    "pipeline_bulk_error_drop", "pipeline",
    oracle=_ORACLE_PARSED + """
    SELECT payload, COUNT(*) AS n
    FROM parsed
    WHERE module_name = 'session' AND payload != 'error'
    GROUP BY payload
    """,
    description="K1 sink error-drop (CTSDBSink.java:120-123) as explicit filter",
)
def pipeline_bulk_error_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = messages_from_events(t(spark, sf_dir, "events"))
    tails = split_branches(msgs, now_ms=F.lit(0)).session_tails
    return (tails.filter(F.col("payload") != "error")
            .groupBy("payload").agg(F.count(F.lit(1)).alias("n")))


@query(
    "pipeline_eval_set", "pipeline",
    # Composed eval-set builder, one Catalyst plan: quality gate (the
    # shared bit-deterministic score expression) -> exact content-hash
    # dedup (window-min over md5(text), ONE hash shuffle) -> exact-count
    # per-source pick (top-10 by content hash, one source shuffle) ->
    # deterministic final ordering by md5('0:' || doc_id). The final
    # ordering rides operators/ranking.global_rank (two-phase total
    # sort) — no partition-less Window anywhere, so the lane scales to
    # unbounded survivor sets unchanged.
    oracle=rf"""
    WITH gated AS (
        SELECT doc_id, source, text FROM documents
        WHERE ({QUALITY_SCORE_SQL}) >= 0.5),
    dd AS (
        SELECT doc_id, source,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        FROM gated),
    picked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS pick_rank
        FROM dd WHERE doc_id = keeper)
    SELECT doc_id, source,
           row_number() OVER (
               ORDER BY md5('0:' || CAST(doc_id AS VARCHAR))) AS eval_order
    FROM picked WHERE pick_rank <= 10
    """,
    description="composed eval-set builder: quality gate -> exact dedup -> exact-count per-source pick -> deterministic order",
)
def pipeline_eval_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..operators.ranking import salted_key
    from ..operators.text import quality_cols

    d = t(spark, sf_dir, "documents")
    gated = d.filter(quality_cols("text")["quality_score"] >= 0.5)
    wd = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    kept = (gated
            .withColumn("_keeper", F.min("doc_id").over(wd))
            .filter(F.col("doc_id") == F.col("_keeper")))
    ws = (Window.partitionBy("source")
          .orderBy(salted_key("doc_id", "s:"), "doc_id"))
    picked = (kept.withColumn("pick_rank", F.row_number().over(ws))
              .filter(F.col("pick_rank") <= 10))
    from ..operators.ranking import global_rank
    keyed = picked.select("doc_id", "source",
                          salted_key("doc_id", "0:").alias("_okey"))
    return (global_rank(keyed, "_okey", rank_col="eval_order")
            .select("doc_id", "source", "eval_order"))
