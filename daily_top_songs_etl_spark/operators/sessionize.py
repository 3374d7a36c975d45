"""Gap-based sessionization over an event stream (batch face).

The reference's W2/W3 window patterns (create_schema_behavior.sql:129-147:
LAG over (partition, order) to compare consecutive snapshots) generalized to
event time: a new session starts whenever the gap to the previous event of
the same user exceeds a threshold. This is the canonical clickstream /
training-log preprocessing operator — at 100 TB the only shuffle is the
single hash exchange on the user key; both the window pass and the
per-session aggregate reuse that same partitioning (HashPartitioning(user)
satisfies ClusteredDistribution(user, session), so Catalyst inserts no
second exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    A session boundary is an event whose distance from the user's previous
    event (ordered by ``(ts, tiebreak)`` — the tiebreak makes the order
    total, hence the output deterministic) exceeds ``gap_minutes``. The
    session id is the running count of boundaries, so ids are dense,
    per-user, and start at 1.

    Returns ``(user, session_id, session_start, session_end, n_events)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTE")
    prev = F.lag(ts_col).over(w)
    is_new = (prev.isNull() | (F.col(ts_col) > prev + gap)).cast("bigint")
    with_session = events.withColumn(
        "session_id", F.sum(is_new).over(run)
    )
    return with_session.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
