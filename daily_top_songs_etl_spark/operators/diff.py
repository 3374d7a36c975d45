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

from pyspark.sql import Column, DataFrame
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


def histogram_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    bin_edges: list[float],
) -> DataFrame:
    """Binned distribution drift between two snapshots of the same
    relation — the monitor a continuous-ingest pipeline runs over each
    crawl batch's quality scores / document lengths / token counts to
    catch a source going bad BEFORE it pollutes a training mix (the
    population-stability-index shape, reported as raw shares rather
    than the PSI scalar: ln() is not bit-reproducible across engines,
    single divisions of exact counts are).

    ``bin_edges`` must be a sorted list; rows land in
    ``(-inf, e0), [e0, e1), ..., [ek, inf)`` = bins ``0..k+1``. FIXED
    edges, not quantiles — a drift report against a moving baseline
    hides exactly the drift it exists to catch, and fixed edges keep
    the report integer-exact and engine-reproducible. NULLs are
    excluded (they are a separate data-quality signal, not a bin).

    Returns one row per non-empty bin: ``(bin, n_old, n_new,
    share_old, share_new, share_delta)`` where shares are UNROUNDED
    single divisions of exact counts (identical IEEE ops on identical
    integers in any engine — the ``bigram_lm_score`` determinism
    argument) and ``share_delta = share_new - share_old``.

    Scale shape: one map-side-combinable aggregate per snapshot
    (output bounded by the bin count), a broadcast-sized full-outer
    align on the bin id, and two broadcast one-row totals — the
    snapshots themselves never shuffle."""

    def binned(df: DataFrame) -> Column:
        b = F.lit(len(bin_edges))  # the open top bin
        for i in range(len(bin_edges) - 1, -1, -1):
            b = F.when(
                F.col(col) < F.lit(float(bin_edges[i])), F.lit(i)
            ).otherwise(b)
        return b

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(binned(df).alias("bin"))
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    c_old, c_new = counts(old, "n_old"), counts(new, "n_new")
    tot_old = old.filter(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("__to")
    )
    tot_new = new.filter(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("__tn")
    )
    share_old = F.col("n_old").cast("double") / F.col("__to").cast("double")
    share_new = F.col("n_new").cast("double") / F.col("__tn").cast("double")
    return (
        c_old.join(c_new, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .crossJoin(F.broadcast(tot_old))
        .crossJoin(F.broadcast(tot_new))
        .select(
            "bin",
            "n_old",
            "n_new",
            share_old.alias("share_old"),
            share_new.alias("share_new"),
            (share_new - share_old).alias("share_delta"),
        )
    )
