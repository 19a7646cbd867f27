"""Streaming analytics over event streams (beyond-reference, SURVEY.md §7.5).

Watermarked event-time windowed aggregation — the Structured Streaming
counterpart of the batch ``events_tumbling`` query. The watermark bounds
state: windows older than (max event time − watermark) are finalized and
dropped; later-arriving rows for them are discarded as late data. In
append mode only finalized windows emit, which is what a downstream
consumer (e.g. a feature store) wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows per event_type: count, value sum,
    distinct-ish user count (exact count distinct is unsupported in
    streaming — ``approx_count_distinct`` is the streaming-native choice).

    Works on BOTH a streaming and a batch DataFrame (the plan is identical;
    batch just has no watermark state) — the equivalence test relies on
    this dual use.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window_duration), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
            "approx_users",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per key: a session extends while events arrive
    within ``gap`` of the previous one; ``session_end`` is last event +
    gap (Spark ``session_window`` semantics).

    Dual batch/stream like ``windowed_event_stats``; on a stream the
    watermark closes sessions once event time passes ``session_end +
    watermark``, bounding state. Batch results are oracle-expressible as
    gaps-and-islands SQL — the ``events_session_window`` queries() entry
    pins Spark's session assignment against DuckDB's lag/cumsum form.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
