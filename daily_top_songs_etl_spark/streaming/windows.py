"""Event-time window operators, stream/batch-symmetric.

The same expressions run in both modes (Structured Streaming's unified
model): batch queries in ``__spark_entry__`` (tumbling/session oracles)
reuse these builders on static DataFrames; under ``readStream`` they gain a
watermark so state is bounded and late events beyond the watermark drop —
the late-data policy the reference never needed (its daily batch IS the
window, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
