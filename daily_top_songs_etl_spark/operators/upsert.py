"""Upsert / merge operators — the Spark rewrite of ``ON CONFLICT``.

The reference loads every table with set-based array inserts ending in
``ON CONFLICT DO NOTHING RETURNING *`` (``etl_pipeline.py:594-612, 699-728,
768-786, 824-851``; seed path ``load_seed_data.sql``): duplicate keys —
whether against the existing table or *within* the incoming batch — are
silently dropped, and only the rows actually inserted come back.

Spark-on-Parquet has no MERGE, so the operator family is explicit
(SURVEY.md §2.2 K1/K2, §2.5 J4/J5):

1. ``priority_dedup``  — deterministic intra-batch conflict collapse.
   Postgres processes the UNNEST array in order, so "first row wins";
   Spark has no row order, so priority must be an explicit ORDER BY
   (the reference itself does this for the seed: ``ORDER BY
   apple_music_url NULLS LAST`` so the richer duplicate wins,
   ``load_seed_data.sql:22-23``).
2. ``upsert``          — dedup + left-anti join against existing keys +
   append; returns the inserted delta (the RETURNING set, which also
   drives the CSV mirror sinks, SURVEY.md §4 Q10).
3. ``merge_song``      — the K2/J5 merge-matched update: patch
   ``apple_music_url`` where the stored row has NULL and the batch has a
   value (``etl_pipeline.py:649-697``).

Scale notes: the anti-join shuffles only on the key columns; with the fact
table partitioned by date, a daily micro-batch's anti-join prunes to the
touched dates. Dimension merges rewrite a broadcast-sized table. At 100 TB
the same operators run unchanged — the anti-join becomes a shuffle join on
the upsert key, which AQE converts to broadcast whenever the batch side is
small (the common case: batch ≪ table).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def priority_dedup(
    batch: DataFrame, key: list[str], priority: list[Column] | None = None
) -> DataFrame:
    """Collapse intra-batch key conflicts deterministically.

    ``priority`` columns order candidates ascending; the first row per key
    survives (O3: ``asc_nulls_last`` on the richness column reproduces the
    reference's NULLS-LAST trick). With no priority given, a stable
    tie-break over all non-key columns keeps the result deterministic —
    unlike ``dropDuplicates``, which keeps an arbitrary first row.
    """
    order = priority or [
        F.col(c).asc_nulls_last() for c in batch.columns if c not in key
    ]
    if not order:  # key-only relation (e.g. the bridge table)
        return batch.dropDuplicates(key)
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@dataclass
class UpsertResult:
    """``inserted`` is the RETURNING set; ``table`` the new table state."""

    table: DataFrame
    inserted: DataFrame


def upsert(
    existing: DataFrame,
    batch: DataFrame,
    key: list[str],
    priority: list[Column] | None = None,
) -> UpsertResult:
    """``INSERT ... ON CONFLICT DO NOTHING RETURNING *`` as DataFrames."""
    cols = existing.columns
    deduped = priority_dedup(batch.select(*cols), key, priority)
    inserted = deduped.join(existing.select(*key), key, "left_anti")
    return UpsertResult(table=existing.unionByName(inserted), inserted=inserted)


@dataclass
class MergeSongResult:
    table: DataFrame
    updated: DataFrame  # rows patched in place (K2's RETURNING set)
    inserted: DataFrame  # rows appended (K1's RETURNING set)


def merge_patch(
    existing: DataFrame, batch: DataFrame, key: list[str], col: str
) -> DataFrame:
    """Generic K2/J5 merge-matched update: fill ``existing.col`` from
    ``batch.col`` wherever the stored value IS NULL and the batch has one
    (``UPDATE ... SET col = $1 WHERE key = $2`` driven by a pre-SELECT of
    NULL rows, ``etl_pipeline.py:649-697``, as ONE broadcast-able join).

    ``batch`` must be unique per key. Returns the patched table plus a
    ``__patched`` flag column (the K2 RETURNING set is
    ``.filter("__patched")``).
    """
    b = batch.select(*key, F.col(col).alias("__b"))
    joined = existing.join(b, key, "left")
    return joined.select(
        *[c for c in existing.columns if c != col],
        F.coalesce(F.col(col), F.col("__b")).alias(col),
        (F.col(col).isNull() & F.col("__b").isNotNull()).alias("__patched"),
    )


def merge_touched_partitions(
    catalog,
    table: str,
    batch: DataFrame,
    key: list[str],
    patch_col: str | None = None,
    priority: list[Column] | None = None,
) -> DataFrame:
    """Partition-scoped merge: rewrite ONLY the partitions the batch
    touches (the 100 TB form of K1/K2 — ``operators/upsert.py`` merges
    were documented as full-table rewrites; this makes the
    partition-pruned answer code, not a comment).

    Steps: (1) the batch's distinct partition values are collected —
    driver-side metadata bounded by touched days, not data rows; (2) the
    existing table is filtered with ``isin`` over those literals, which
    Catalyst turns into partition pruning (only touched partitions are
    scanned); (3) K2 NULL-fill patch (``patch_col``) or K1 ON CONFLICT DO
    NOTHING (default) runs against that slice; (4)
    ``Catalog.overwrite_partitions`` snapshots untouched partitions via
    hardlink and writes only the touched ones.

    Returns the new state of the touched partitions (post-merge slice).
    """
    from ..catalog import PARTITIONED

    pcol = PARTITIONED[table][0]
    touched = [
        r[0] for r in batch.select(pcol).distinct().collect()
    ]  # bounded: one value per touched partition
    if not touched:
        return catalog.read(table).limit(0)
    slice_ = catalog.read(table).filter(F.col(pcol).isin(touched))
    if patch_col is None:
        merged = upsert(slice_, batch, key, priority).table
    else:
        merged = merge_patch(slice_, batch, key, patch_col).drop("__patched")
    catalog.overwrite_partitions(merged, table, touched)
    return catalog.read(table).filter(F.col(pcol).isin(touched))


def merge_song(existing: DataFrame, batch: DataFrame) -> MergeSongResult:
    """The song-table merge (``etl_pipeline.py:622-742``):

    WHEN MATCHED AND existing.apple_music_url IS NULL
                 AND batch.apple_music_url IS NOT NULL THEN
        UPDATE SET apple_music_url = batch.apple_music_url
    WHEN NOT MATCHED THEN INSERT

    One outer-shaped join replaces the reference's SELECT + per-row prepared
    UPDATE loop (Q5/Q6). The updated/inserted deltas drive the CSV mirrors.
    """
    cols = existing.columns
    deduped = priority_dedup(
        batch.select(*cols), ["isrc"], [F.col("apple_music_url").asc_nulls_last()]
    )
    b = deduped.select(
        F.col("isrc").alias("isrc"),
        *[F.col(c).alias(f"b_{c}") for c in cols if c != "isrc"],
    )
    joined = existing.join(b, "isrc", "left")
    patched = joined.select(
        "isrc",
        "song_name",
        "song_duration_ms",
        "is_explicit",
        "spotify_url",
        F.coalesce("apple_music_url", "b_apple_music_url").alias("apple_music_url"),
        (
            F.col("apple_music_url").isNull()
            & F.col("b_apple_music_url").isNotNull()
        ).alias("__patched"),
    )
    updated = patched.filter("__patched").drop("__patched")
    table_matched = patched.drop("__patched")
    inserted = deduped.join(existing.select("isrc"), "isrc", "left_anti")
    return MergeSongResult(
        table=table_matched.unionByName(inserted),
        updated=updated,
        inserted=inserted,
    )
