"""Skew-mitigation operators.

AQE's skew-join splitting handles skewed JOINS at runtime, but a skewed
GROUP BY key (few distinct values, e.g. 5 event types across billions of
rows) still funnels each key through one reducer. ``salted_agg`` is the
explicit two-phase rewrite: aggregate on (key, salt) first — fan-out
bounded by ``n_salts`` — then combine partials per key. For algebraic
aggregates (sum/count/min/max) the result is exactly the unsalted answer.

Note Spark's own partial aggregation already gives map-side combine; the
salt matters when the FINAL merge per key is itself the bottleneck (very
wide partials, e.g. large collect-style states, or extreme executor
counts). The operator exists so pipelines can opt in per aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: list[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``aggs`` maps output column name -> (input expression, combiner) where
    combiner ∈ {"sum", "count", "min", "max"}; phase 1 computes the
    partial per (key, salt), phase 2 re-combines per key ("count" partials
    re-combine with SUM).
    """
    salt = (F.spark_partition_id() % F.lit(n_salts)).alias("__salt")
    phase1_aggs = []
    for name, (expr, how) in aggs.items():
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how]
        phase1_aggs.append(fn(expr).alias(name))
    partial = df.withColumn("__salt", salt).groupBy(*key, "__salt").agg(*phase1_aggs)
    phase2_aggs = []
    for name, (_, how) in aggs.items():
        fn = F.sum if how in ("sum", "count") else {"min": F.min, "max": F.max}[how]
        phase2_aggs.append(fn(name).alias(name))
    return partial.groupBy(*key).agg(*phase2_aggs)
