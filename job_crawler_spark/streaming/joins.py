"""Watermarked stream-stream interval join.

The streaming twin of ``plans/events_plans.q_multi_touch_attribution``
(all clicks in the 24 h window before each purchase): two unbounded
sources joined on an equality key plus a time-range condition. This is
the one join shape Structured Streaming can run with BOUNDED state —
the watermarks on both sides plus the two-sided time bound let the
engine compute, per input row, the latest future match it must wait
for, and evict buffered rows past that horizon (clicks older than
``watermark + window`` can never match a future purchase). Without the
time bound the state store grows forever; without one watermark the
join is rejected outright in append mode.

Batch/streaming parity is the unified-API contract: the same condition
run as a batch join over the same events yields bit-identical pairs —
pinned by tests/test_streaming_joins.py against the binned range-join
batch plan (two independent implementations: the streaming join buffers
and probes per micro-batch, the batch plan bucket-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project a (streaming or batch) events frame into the click / purchase
    sides of the attribution join, with join-safe disjoint column names."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks, purchases


def attribution_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    window_hours: int = 24,
    watermark: str = "48 hours",
) -> DataFrame:
    """Inner stream-stream join: every (purchase, click) pair of the same
    user with the click inside the ``window_hours`` window at-or-before
    the purchase (inclusive both ends — identical bounds to the batch
    range join). ``watermark`` bounds late data on BOTH sides; click
    state is evictable once older than watermark + window relative to
    the purchase-side event-time frontier. Output matches the batch
    query's column contract, gap_seconds included."""
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (c["c_user_id"] == p["user_id"])
        & (
            c["click_ts"]
            >= p["purchase_ts"] - F.expr(f"INTERVAL {window_hours} HOURS")
        )
        & (c["click_ts"] <= p["purchase_ts"])
    )
    return c.join(p, cond, "inner").select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("gap_seconds"),
    )
