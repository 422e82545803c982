"""Sessionization: gap-based session assignment and per-session
rollups.

Batch formulation (window lag + cumulative gap counter) — the standard
Spark sessionization idiom; the streaming formulation uses
``F.session_window`` which shares the gap semantics. Both are exposed
so the same analysis runs over historical parquet and a live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session ids per user (batch path).

    A new session starts when the time since the previous event of the
    same user exceeds the gap. Adds ``session_seq`` (1-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(ts_col).over(w)
    # interval comparison keeps sub-second precision (unix_timestamp
    # would floor to seconds and mis-bucket sub-second gaps)
    is_new = (
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap_minutes} MINUTES"))
    ).cast("int")
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregate: bounds, event count, exact value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("session_value"),
        )
    )


def streaming_session_window(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming-native equivalent via session_window (state merges
    windows as events arrive; watermark bounds state)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
