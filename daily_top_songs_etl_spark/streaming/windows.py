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


def first_event_per_key(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream/batch-symmetric event deduplication.

    Streaming: ``dropDuplicatesWithinWatermark`` — per-key state is dropped
    once the watermark passes, so state size is bounded by (keys arriving
    within the watermark horizon), not by stream history; the survivor is
    the first ARRIVAL. Batch: the deterministic event-time-first row per
    key (ties broken by event_id), one shuffle on the key. The two agree on
    the surviving KEY SET always, and on the surviving rows whenever
    arrival order matches event time (the stream≡batch test checks keys).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col("event_id"))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def clicks_before_purchase(
    purchases: DataFrame,
    clicks: DataFrame,
    interval_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every (purchase, click) pair from the
    same user with the click in the hour before the purchase.

    Streaming: both sides watermarked; the time-range condition lets Spark
    bound join state — buffered rows are evicted once the other side's
    watermark passes their eligibility window (state ∝ watermark horizon ×
    arrival rate, independent of stream length). Batch: same expression
    compiles to an equi-join on user_id with the range as a join residual.
    """
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
        clicks = clicks.withWatermark("ts", watermark)
    p, c = purchases.alias("p"), clicks.alias("c")
    cond = (
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr(f"INTERVAL {interval_s} SECOND"))
        & (F.col("c.ts") < F.col("p.ts"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("c.ts").alias("click_ts"),
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: decorate each event with dimension
    attributes. STATELESS under streaming — the static side is joined
    fresh per micro-batch (Spark re-plans it each trigger, so a dim
    snapshot refresh is picked up on the next batch), so there is no
    watermark and no state store; the dim broadcasts, so the stream side
    never shuffles. This is the feature-lookup hop every training-log
    pipeline has in front of its windowed aggregations."""
    return events.join(
        F.broadcast(dim), F.col(key) == F.col(dim_key), how
    ).drop(dim_key)
