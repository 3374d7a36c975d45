"""Exact distributed heavy hitters: two-pass candidate generation +
verification.

"Which items exceed φ of the corpus?" at 100 TB cannot be a full
groupBy over the long tail (the shuffle would carry every distinct item).
The two-pass rewrite bounds the shuffle by the CANDIDATE set:

1. **Candidates**: within each scan partition p, keep items whose local
   count exceeds N_p·φ. Pigeonhole guarantee: if c(x) > N·φ globally,
   then c_p(x) > N_p·φ in at least one partition (otherwise
   c(x) = Σ_p c_p(x) ≤ Σ_p N_p·φ = N·φ) — so NO true heavy hitter can
   be missed, and the candidate set is at most P/φ items by
   construction (each partition contributes < 1/φ of them) —
   broadcast-sized regardless of corpus size.
2. **Verify**: exact global counts of the candidates only (broadcast
   semi-join + one vocabulary-bounded aggregate), then the exact
   threshold filter drops false positives.

The map-side partial aggregation means pass 1's exchange moves only
per-partition (partition, item) summaries, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    items: DataFrame, col: str, phi: float = 0.005
) -> DataFrame:
    """Items with global frequency > ``phi`` of all rows, with exact
    counts and exact share. ``items`` is a one-column-of-interest
    relation (explode upstream for token-level analysis)."""
    with_pid = items.select(
        F.col(col).alias("item"), F.spark_partition_id().alias("__pid")
    )
    local = with_pid.groupBy("__pid", "item").agg(
        F.count(F.lit(1)).alias("c_local")
    )
    part_sizes = with_pid.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("n_local")
    )
    candidates = (
        local.join(part_sizes, "__pid")
        .filter(
            F.col("c_local").cast("double")
            > F.col("n_local").cast("double") * F.lit(phi)
        )
        .select("item")
        .distinct()
    )
    total = items.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        with_pid.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_count"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("item_count").cast("double")
            > F.col("n_total").cast("double") * F.lit(phi)
        )
        .select(
            "item",
            F.col("item_count").cast("bigint").alias("item_count"),
            F.col("n_total").cast("bigint").alias("n_total"),
        )
    )
