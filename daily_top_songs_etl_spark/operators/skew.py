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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Skew-mitigating equi-join: salt the big side, replicate the small
    side ``n_salts``×, join on (key, salt).

    A hot key on the big side lands on ``n_salts`` reducers instead of
    one; the small side pays an ``n_salts``× blow-up (explode of a
    sequence — no extra scan). Each big row carries exactly one salt and
    the small side carries every salt, so the joined row-set is
    IDENTICAL to the unsalted join for ``inner`` and ``left`` — the salt
    only changes placement. Use when the small side is too big to
    broadcast (broadcast joins have no skew problem) and AQE's runtime
    skew splitting isn't available/enough; ``force_shuffle`` pins the
    shuffle-hash strategy so the salted path is actually exercised at
    test scale.
    """
    assert how in ("inner", "left")
    small_key = small_key or key
    salted_big = big.withColumn(
        "__salt", F.spark_partition_id() % F.lit(n_salts)
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    if force_shuffle:
        salted_small = salted_small.hint("shuffle_hash")
    joined = salted_big.join(
        salted_small,
        (F.col(key) == F.col(small_key)) & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return joined.drop("__salt")


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
