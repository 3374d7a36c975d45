"""Per-group top-k — the rank-1..10 domain invariant as an operator.

The reference's top-10 is enforced at extract time (``etl_pipeline.py:322``
limit=10) and by CHECK/UNIQUE constraints (``create_schema_structure.sql:
64-69``). Generalized here as the standard window top-k (SURVEY.md §2.8 O5),
used by the extension queries and by positional rank assignment (P6).

Scale: one shuffle on the group key; skewed groups are bounded because the
window truncates at k — with AQE skew-join splitting on, the sort per group
is the only O(n log n) term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def assign_positional_ranks(batch: DataFrame) -> DataFrame:
    """P6 (``etl_pipeline.py:839-850``): the daily batch arrives with a
    0-based fetch position per source; rank = position + 1."""
    return batch.withColumn("rank", (F.col("position") + F.lit(1)).cast("int"))
