"""Snapshot reconciliation: keyed diff of two table versions.

The reference publishes its state twice per run — Postgres tables and the
CSV append mirror (``etl_pipeline.py:614-619`` etc.) — and relies on both
staying in lockstep. This operator is the audit for that property, and
the general migration/validation tool: given two snapshots of a keyed
table, report what was added, removed, or changed.

Scale notes (100 TB): one full-outer shuffle join on the key; unchanged
rows (the overwhelming majority in a reconciliation) are dropped by a
codegen struct comparison before anything is materialized, so the output
is bounded by the true drift, not the table size. Side presence uses
injected markers — never attribute nullability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key: list[str],
    compare: list[str],
) -> DataFrame:
    """Keyed diff of ``after`` against ``before``.

    Returns one row per key that differs, with ``status`` ∈
    {'added', 'removed', 'changed'} and flattened
    ``before_<col>`` / ``after_<col>`` values for every compared column
    (NULL on the absent side). Keys whose compared columns are equal
    (null-safely) are omitted.
    """
    b = before.select(
        *key, *compare, F.lit(1).alias("_b_marker")
    ).alias("b")
    a = after.select(
        *key, *compare, F.lit(1).alias("_a_marker")
    ).alias("a")
    has_b = F.col("b._b_marker").isNotNull()
    has_a = F.col("a._a_marker").isNotNull()
    same = F.struct(*[F.col(f"b.{c}") for c in compare]).eqNullSafe(
        F.struct(*[F.col(f"a.{c}") for c in compare])
    )
    status = (
        F.when(has_b & ~has_a, F.lit("removed"))
        .when(~has_b & has_a, F.lit("added"))
        .otherwise(F.lit("changed"))
    )
    return (
        b.join(a, on=key, how="full_outer")
        .filter(~(has_b & has_a & same))
        .select(
            *key,
            status.alias("status"),
            *[F.col(f"b.{c}").alias(f"before_{c}") for c in compare],
            *[F.col(f"a.{c}").alias(f"after_{c}") for c in compare],
        )
    )
