"""Time-window aggregations over the `events` table — written once,
runnable as a batch DataFrame plan AND as a Structured Streaming plan
(the transforms take whatever DataFrame they are given; only the
source/sink differ — see ingest.py).

The reference has no streaming (SURVEY.md §2.3: no watermarks, no
windows, no stateful processing — its nearest analogue is interval
algebra over VAD segments, S6/S7). This module is the scale-out
extension the BASELINE grid asks for: append-only event ingest with
tumbling / sliding / session windows and late-data handling.

Scale notes: window aggs shuffle once on (window, keys) with map-side
partial aggregation; watermarks bound streaming state (old windows are
evicted, late rows dropped); session windows are Spark's native
stateful `session_window` operator, which merges overlapping gaps
inside the state store without a per-user sort of history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.queries.common import dsum


def _value_aggs() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
    ]


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.
    Epoch-aligned windows (identical to DuckDB's time_bucket).
    With `watermark` set on a streaming input, state for windows older
    than max(ts) - watermark is evicted and later arrivals are dropped."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(*_value_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in
    window/slide overlapping frames; the explode is handled by Spark's
    native window() expression, not a manual self-join."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(*_value_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows (gap-based): a session extends while
    consecutive events are within `gap`. Spark's native session_window
    is the stateful merge operator; in batch mode it degenerates to the
    classic gaps-and-islands computation (the oracle expresses it that
    way)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            *_value_aggs(),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's clicks in the preceding `attribution_window`. On streaming
    inputs both sides carry watermarks and the time-bound predicate
    lets Spark expire join state (the unbounded-state hazard of
    stream-stream joins); on batch inputs the same code is a plain
    interval join. Returns (click_id, purchase_id, user_id, click_ts,
    purchase_ts, value)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}"))
    )
    return c.join(p, cond).select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id"),
        "click_ts", "purchase_ts", "value",
    )
