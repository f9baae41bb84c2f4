"""Sessionization over an event stream (gap-based session windows).

Batch version: pure window functions (lag + cumulative sum), SQL-oracle
checkable. Streaming version: Structured Streaming ``session_window`` with a
watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize_batch(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_seconds``.
    Output: (user_id, session_id, n_events, session_start, session_end).
    session_id is 0-based per user in time order."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull()
        | (ts.cast("long") - prev.cast("long") > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sid = events.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(w) - F.lit(1)
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
        .select(user_col, "session_id", "n_events", "session_start", "session_end")
    )


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Structured Streaming equivalent: session_window + watermark.
    ``events`` must be a streaming DataFrame (readStream)."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.withColumn("__ts", ts)
        .withWatermark("__ts", watermark)
        .groupBy(
            F.session_window("__ts", f"{gap_seconds} seconds"),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
