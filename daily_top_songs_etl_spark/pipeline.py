"""Daily micro-batch orchestration — the ETL ``main()`` re-expressed.

The reference's load phase (``etl_pipeline.py:874-1034``) runs four upserts
over two FK-ordered waves on two pooled connections, then Postgres triggers
fire per row. Here the same DAG is one declarative batch:

    daily_batch (nested, rank-ordered)
      ├─ explode artists        → upsert artist           (wave 1)
      ├─ project song fields    → merge_song              (wave 1)
      ├─ explode (isrc,artist)  → upsert artist_song_map  (wave 2)
      └─ positional ranks (P6)  → validate → upsert ranking (wave 2)
    then maintain() (T1→T2→T3) and CSV mirrors of each RETURNING delta.

The FK barrier survives as operator ordering (dims before facts); the
reference's connection-pool parallelism is subsumed by Spark scheduling
(SURVEY.md §3.1). Under Structured Streaming the same function is the
``foreachBatch`` body (streaming/daily_stream.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog
from .pins import release_new_pins, snapshot_pins
from .operators.maintain import Tables, maintain
from .operators.topk import assign_positional_ranks
from .operators.upsert import merge_song, upsert
from .operators.validate import validate_ranking
from .sources.sinks import write_csv_mirror


@dataclass
class BatchDeltas:
    """The RETURNING sets — what the reference mirrors to CSV (Q10)."""

    artist: DataFrame
    song_inserted: DataFrame
    song_updated: DataFrame
    artist_song_map: DataFrame
    ranking: DataFrame


def run_daily_batch(
    catalog: Catalog, daily_batch: DataFrame, csv_mirror_dir: str | None = None
) -> BatchDeltas:
    """Apply one daily batch (DAILY_BATCH schema) to the star schema."""
    artist_t = catalog.read("artist")
    song_t = catalog.read("song")
    map_t = catalog.read("artist_song_map")
    ranking_t = catalog.read("ranking")

    # Wave 1a — artists: explode the nested struct array (P5,
    # etl_pipeline.py:607-611), upsert on artist_id.
    artist_batch = daily_batch.select(F.explode("artists").alias("a")).select(
        "a.artist_id", "a.artist_name"
    )
    artist_res = upsert(artist_t, artist_batch, ["artist_id"])

    # Wave 1b — songs: merge (patch apple url when newly known) + insert.
    song_batch = daily_batch.select(
        "isrc",
        "song_name",
        "song_duration_ms",
        "is_explicit",
        "spotify_url",
        "apple_music_url",
    )
    song_res = merge_song(song_t, song_batch)

    # Wave 2a — bridge rows (P5, etl_pipeline.py:781-785).
    map_batch = daily_batch.select(
        "isrc", F.explode("artists").alias("a")
    ).select("a.artist_id", "isrc")
    map_res = upsert(map_t, map_batch, ["artist_id", "isrc"])

    # Wave 2b — fact rows: positional rank (P6), validated (F8). The
    # reference stamps now(UTC).date() at load time (etl_pipeline.py:843);
    # a replayed/streamed batch may instead carry its own ``batch_date``
    # column (backlog drains keep their original dates).
    date_col = (
        F.col("batch_date")
        if "batch_date" in daily_batch.columns
        else F.current_date()
    )
    ranking_batch = validate_ranking(
        assign_positional_ranks(daily_batch).select(
            "isrc",
            date_col.cast("date").alias("ranking_date"),
            "rank",
            F.col("source").alias("ranking_source"),
        )
    )
    ranking_res = upsert(ranking_t, ranking_batch, ["isrc", "ranking_date", "ranking_source"])

    # Pin the batch-sized RETURNING set once: the max-date probe, the
    # touched-date listing, and the fact union all consume it, and each
    # would otherwise re-run the anti-join against the full fact table.
    ranking_ins = ranking_res.inserted.localCheckpoint(eager=True)
    # Snapshot the persisted-RDD ids AFTER the (kept) ranking pin and
    # BEFORE maintain()'s dimension pins: DataFrame.unpersist() is a
    # no-op for localCheckpoint blocks (it only clears CacheManager
    # entries — the same gap bench.py works around), so the precise way
    # to release the dim pins after the commit is to unpersist exactly
    # the RDD ids maintain() adds. Single-writer, like the catalog.
    sc = daily_batch.sparkSession.sparkContext
    pre_pin_ids = snapshot_pins(sc)

    # Trigger cascade (T1→T2→T3) relative to the batch's max date.
    # materialize=True pins each GC'd dimension so the cascade (and the
    # fact distinct feeding it) runs once, not once per consumer below.
    max_date_row = ranking_ins.agg(F.max("ranking_date")).first()
    new_max_date = max_date_row[0] if max_date_row else None
    tables = maintain(
        Tables(
            artist=artist_res.table,
            song=song_res.table,
            artist_song_map=map_res.table,
            ranking=ranking_t.unionByName(ranking_ins),
        ),
        new_max_date,
        materialize=True,
    )

    # Persist. Deltas are materialized (cached implicitly via write) before
    # the table swap so the mirror reflects exactly what was inserted.
    deltas = BatchDeltas(
        artist=artist_res.inserted,
        song_inserted=song_res.inserted,
        song_updated=song_res.updated,
        artist_song_map=map_res.inserted,
        ranking=ranking_ins,
    )
    if csv_mirror_dir:
        from . import schemas

        for name, df in (
            ("artist", deltas.artist),
            ("song", deltas.song_inserted),
            ("artist_song_map", deltas.artist_song_map),
            ("ranking", deltas.ranking),
        ):
            write_csv_mirror(
                df,
                os.path.join(csv_mirror_dir, name),
                columns=schemas.TABLE_SCHEMAS[name].fieldNames(),
            )

    # One snapshot-consistent commit across all four tables — the Spark
    # analog of the reference wrapping its four upsert waves in a single
    # Postgres transaction (etl_pipeline.py:898-911). Sequential
    # catalog.write calls left a crash window where the new song table
    # was visible next to the old artist_song_map (round-8 verdict
    # stretch); commit_tables publishes all four under one intent
    # manifest with roll-forward recovery.
    #
    # The fact table commits PARTITION-SCOPED: a daily batch touches the
    # batch's date partitions and the T1 purge drops a trailing date
    # range — every other partition is byte-identical to the current
    # snapshot and is staged as a hardlink (manifest reuse on an object
    # store), not rewritten. At 100 TB this is the difference between a
    # one-partition write and a full-table rewrite per day; at the 10x
    # replay it cut the per-day wall 2.2x (BENCH_sf1.json
    # maintain_replay_round9). Dimension tables stay full snapshot
    # writes — they are broadcast-sized by the data model.
    try:
        # Hold the writer lock across the WHOLE stage+commit sequence:
        # each catalog method self-locks, but the staged fact version and
        # the manifest publication below are one logical transaction — a
        # second concurrent run_daily_batch interleaving between them
        # could overwrite the staged version dir. With the explicit hold
        # (reentrant for the nested calls), the second writer fails
        # loudly at its first mutation instead (ConcurrentWriterError —
        # the serialization the reference gets from Postgres row locks).
        with catalog.writer_lock():
            return _commit_batch(
                catalog, tables, deltas, ranking_t, ranking_ins, new_max_date
            )
    finally:
        # Release the dimension pins (their data is committed to parquet;
        # a long-lived foreachBatch session would otherwise accumulate
        # checkpoint blocks until GC thrash — the effect bench.py
        # measured). ranking_ins's pin predates the snapshot and stays
        # alive: it is returned in deltas and is batch-sized.
        release_new_pins(sc, pre_pin_ids, "run_daily_batch")


def _commit_batch(catalog, tables, deltas, ranking_t, ranking_ins, new_max_date):
    """The snapshot-consistent publication tail of :func:`run_daily_batch`
    (runs under the caller's held writer lock — the nested catalog calls
    below re-enter it)."""
    dims = {
        "artist": tables.artist,
        "song": tables.song,
        "artist_song_map": tables.artist_song_map,
    }
    if not catalog.exists("ranking"):
        catalog.commit_tables({**dims, "ranking": tables.ranking})
        return deltas
    spark = ranking_ins.sparkSession
    inserted_dates = [
        r[0]
        for r in ranking_ins.select("ranking_date").distinct().collect()
    ]  # bounded: one value per touched day
    if new_max_date is not None:
        cutoff = (
            spark.createDataFrame([(new_max_date,)], "d date")
            .select(F.add_months("d", -12).alias("c"))
            .first()[0]
        )
        purged = [
            r[0]
            for r in ranking_t.select("ranking_date")
            .distinct()
            .filter(F.col("ranking_date") <= F.lit(cutoff))
            .collect()
        ]  # partition metadata, bounded by retained dates
        touched = [d for d in inserted_dates if d > cutoff]
    else:
        purged, touched = [], inserted_dates
    if not touched and not purged:
        # ranking is bit-identical to the current snapshot — commit
        # only the dimensions (their upsert deltas may be non-empty)
        catalog.commit_tables(dims)
        return deltas
    # touched is never empty here: a purge implies >=1 inserted row,
    # and the max inserted date is always > its own 1-year cutoff
    staged_v = catalog.stage_partition_delta(
        tables.ranking.filter(F.col("ranking_date").isin(touched)),
        "ranking",
        touched,
        drop=purged,
    )
    catalog.commit_tables(dims, staged={"ranking": staged_v})
    return deltas
