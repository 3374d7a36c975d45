"""As-of join: for each left row, the most recent right row at-or-before
the left row's time, per key.

The reference's closest construct is the two-snapshot self-join J2
(``create_schema_behavior.sql:36-54`` — exact dates rather than
nearest-preceding); this operator generalizes it to true event-time as-of
semantics (the TimescaleDB/kdb ``asof``/DuckDB ``ASOF JOIN`` shape).

Spark-first plan: UNION the two sides with a side tag, then ONE window
pass per key ordered by (ts, tag) carrying the right side's payload
forward with ``last(..., ignorenulls=True)``. Right rows sort before left
rows at equal timestamps, so the match is inclusive (ts_right <= ts_left).

Scale: a single shuffle on the key — same cost as one window function,
versus the naive range-join which is quadratic per key. Skewed keys
behave like any window (AQE-salvageable); the state carried per row is
just the right payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join.

    ``right`` MUST be unique per (*on, ts) — pre-aggregate it otherwise
    (ties at the same timestamp would make "the" most recent row
    ambiguous; engines would disagree arbitrarily).

    Returns every left row with ``<payload><suffix>`` columns from the
    latest right row where ``right.ts <= left.ts`` (NULL when none).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    r = right.select(
        *[
            F.col(c) if c in on or c == ts else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.col(ts).alias("__r_ts"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
