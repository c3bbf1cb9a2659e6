"""Stream-stream join (SURVEY.md §2.2 streaming — beyond the reference,
which has no joins at all, §2.1.1): correlate two event streams within a
bounded event-time horizon.

The canonical shape: attribute each purchase to the views that preceded
it within `horizon` for the same user. Both sides carry watermarks and
the join condition bounds event time in BOTH directions — that is what
lets Spark expire buffered state; an unbounded stream-stream join would
hold both streams forever (state O(stream), impossible at 100 TB/day;
with the bound it is O(horizon × rate)).

Works identically on batch frames (watermarks skipped) — the
stream-batch equivalence test relies on that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_attribution(events: DataFrame, horizon: str = "6 hours",
                              watermark: str = "1 hour",
                              how: str = "inner") -> DataFrame:
    """Join purchases to same-user views within the preceding `horizon`;
    one row per (view, purchase) pair. how='left_outer' additionally
    emits every unconverted view with NULL purchase columns — in a
    stream those rows appear only once the watermark proves no matching
    purchase can still arrive (state eviction = result emission)."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"))
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        views.join(purchases, cond, how)
        .select(F.col("v_user").alias("user_id"), "view_id", "purchase_id",
                (F.unix_millis("purchase_ts")
                 - F.unix_millis("view_ts")).alias("ms_to_purchase"),
                "purchase_value")
    )
