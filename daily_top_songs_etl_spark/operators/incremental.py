"""Incremental aggregate maintenance (IVM): mergeable per-key partial
aggregate state.

The reference recomputes nothing — each daily run appends ~10 fact rows and
Postgres maintains the views on read (SURVEY.md §3.1). At 100 TB the Spark
analog of "don't recompute history" is a *state table* of per-key partial
aggregates that each micro-batch MERGES into: count/sum/min/max form a
commutative monoid, so `state ⊕ delta-agg` equals the full re-aggregation
over all rows ever seen, while touching only |keys| + |batch| rows instead
of the whole history.

Plan shape: the delta side partial-aggregates map-side (combiner) before one
shuffle on the key; the merge is a key-colocated union + re-agg (a single
hash aggregate — no join needed, because monoid merge is itself an
aggregation). Finalization (avg = sum/count) is a pure projection deferred
to read time, the standard IVM trick for non-distributive measures.

Sums go through DECIMAL so state merge is exact and order-independent —
float partial sums would drift between the incremental and recomputed
answers (same rule as the DuckDB-oracle contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "sum_val", "min_val", "max_val")


def agg_state(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Aggregate rows into per-key monoid state (count/sum/min/max)."""
    v = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v).alias("sum_val"),
        F.min(F.col(value_col)).alias("min_val"),
        F.max(F.col(value_col)).alias("max_val"),
    )


def merge_states(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Monoid merge of two state tables: union-by-name, one hash re-agg.

    `sum(cnt)` / `sum(sum_val)` / `min(min_val)` / `max(max_val)` are the
    monoid operations; a key present on only one side passes through
    unchanged (union, not join, so no NULL-padding to repair).
    """
    return (
        state.select(*keys, *STATE_COLS)
        .unionByName(delta.select(*keys, *STATE_COLS))
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection of the state into user-facing measures."""
    return state.select(
        *keys,
        F.col("cnt").cast("bigint").alias("n_rows"),
        F.col("sum_val").cast("double").alias("sum_value"),
        F.round(
            F.col("sum_val").cast("double") / F.col("cnt").cast("double"), 6
        ).alias("avg_value"),
        F.col("min_val").alias("min_value"),
        F.col("max_val").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Incremental DISTINCT: mergeable HLL sketch state
# --------------------------------------------------------------------------
# count-distinct is NOT a monoid on scalars (you cannot merge two distinct
# counts), but it IS one on HLL sketches: union is a per-register max, so
# merge is associative, commutative, and idempotent — estimate accuracy
# does not degrade with the NUMBER of merges (unlike resketching counts),
# staying within the sketch's configured error regardless of how history
# was batched. (Not bit-exact vs a single-shot sketch: DataSketches HLL
# promotes sparse→dense lazily, and the promotion point differs between
# the union path and the direct-build path.) That makes per-key sketch
# columns the incremental analogue of the count/sum/min/max state above:
# each micro-batch contributes a delta sketch, history is never rescanned.
# Spark's hll_sketch_agg / hll_union_agg / hll_sketch_estimate are the
# Apache DataSketches HLL, binary-stable for storage in a state table.

def distinct_state(
    df: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``value_col`` (the distinct-count state)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll_state")
    )


def merge_distinct_states(
    state: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Union-by-key of two sketch state tables: union-all + one
    ``hll_union_agg`` re-aggregation (no join — sketch union is itself an
    aggregate, exactly like the scalar monoid merge above)."""
    cols = [*keys, "hll_state"]
    return (
        state.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(F.hll_union_agg("hll_state").alias("hll_state"))
    )


def finalize_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time estimate projection from the sketch state."""
    return state.select(
        *keys,
        F.hll_sketch_estimate("hll_state").cast("bigint").alias(
            "approx_n_distinct"
        ),
    )
