"""Batch maintenance pass — the trigger cascade, set-level.

The reference maintains retention and referential invariants with per-row
AFTER triggers (``create_schema_behavior.sql:56-93``). The Spark rewrite
runs them as **one set-level pass per micro-batch**, in the reference's
cascade order (SURVEY.md §2.10):

  T1  retention purge   — AFTER INSERT ON ranking: drop rows dated
                          <= new_date - 1 year (``:74-80``)
  (FK cascade)          — song deletion cascades to artist_song_map
                          (``create_schema_structure.sql:49``)
  T2  orphan-song GC    — AFTER DELETE ON ranking: drop songs no ranking
                          references (``:65-72``)
  T3  orphan-artist GC  — AFTER DELETE ON map: drop artists unmapped
                          (``:56-63``)

Each GC step is a ``left_semi`` join (keep referenced rows) — the batch dual
of the reference's per-row ``NOT EXISTS`` delete. On the partitioned fact
table the retention filter is pure partition pruning: dropping a year-old
date range never touches surviving files.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Tables:
    artist: DataFrame
    song: DataFrame
    artist_song_map: DataFrame
    ranking: DataFrame


def maintain(
    tables: Tables,
    new_max_date: dt.date | None = None,
    materialize: bool = False,
    broadcast_gc: bool = True,
) -> Tables:
    """Run T1 → cascade → T2 → T3 and return the new table states.

    ``new_max_date`` is the max ranking_date of the just-inserted batch
    (the trigger's NEW.ranking_date); None skips retention (no insert
    happened — e.g. a pure replay of the GC pass).

    ``materialize=True`` eagerly localCheckpoints each GC'd DIMENSION
    state (never the fact): the batch-commit path consumes every stage
    several times (each dim write, plus the next stage's broadcast build
    side), and without pinning, Spark recomputes the whole cascade —
    including the fact-table distinct — once per consumer. Dimensions
    are broadcast-sized by the data model, so the pin is a few MB; the
    caller should unpersist after its commit.

    ``broadcast_gc`` controls the GC semi-join build strategy.

    True (default): force-broadcast each build side. Valid because the
    build sides are DOMAIN-BOUNDED here, not merely assumed small: the
    distinct charted isrcs are capped by the CHECK-constrained rank
    domain (10 ranks × sources × ≤366 retained days —
    ``create_schema_structure.sql`` rank CHECK 1..10), and ``song`` /
    ``artist_song_map`` are GC'd against exactly that set every batch,
    so the dims can never outgrow it between batches. The explicit hint
    deliberately overrides ``spark.sql.autoBroadcastJoinThreshold`` —
    at 100 TB the alternative is shuffling the scaled fact during
    maintenance. (It also sidesteps a Spark 4 AQE artifact: a
    sort-merge semi-join over a union claiming propagated hash
    partitioning zips 32-vs-64 partition RDDs.)

    False: a deployment whose dims are NOT bounded by this data model
    (wider rank domain, unboundedly many sources) drops the broadcast
    hint — a shuffle join instead of a driver OOM. The build side is
    pre-repartitioned on its join key (which also breaks the propagated
    partitioning claim behind the AQE zip artifact above); the probe
    side is left to the planner, which adds its own exchange — this is
    NOT a co-located join, just a broadcast-free one. Pick this when
    the distinct-key set can exceed executor/driver broadcast memory."""
    _build = (
        F.broadcast
        if broadcast_gc
        else (lambda side: side.repartition(*side.columns))
    )
    ranking = tables.ranking
    if new_max_date is not None:
        # T1: ranking_date <= NEW.ranking_date - INTERVAL '1 year' is purged
        # (keep-side rewrite; interval-year arithmetic = add_months -12).
        cutoff = F.add_months(F.lit(new_max_date), -12)
        ranking = ranking.filter(F.col("ranking_date") > cutoff)

    # T2: songs must still be referenced by some ranking row. The build
    # side (distinct charted isrcs) is bounded by the domain — 10 ranks ×
    # sources × retained days — so every GC semi-join BROADCASTS its key
    # set instead of shuffling the scaled fact/dim: the distinct
    # partial-aggregates map-side to a dim-sized relation, and the big
    # side never moves. (Also sidesteps a Spark 4 AQE artifact where a
    # sort-merge semi-join over a union that claims propagated hash
    # partitioning zips 32-vs-64 partition RDDs.)
    song = tables.song.join(
        _build(ranking.select("isrc").distinct()), "isrc", "left_semi"
    )
    if materialize:
        song = song.localCheckpoint(eager=True)
    # FK ON DELETE CASCADE song -> artist_song_map
    # (create_schema_structure.sql:49): map rows of deleted songs go too.
    artist_song_map = tables.artist_song_map.join(
        _build(song.select("isrc")), "isrc", "left_semi"
    )
    if materialize:
        artist_song_map = artist_song_map.localCheckpoint(eager=True)
    # T3: artists must still be mapped to some surviving song.
    artist = tables.artist.join(
        _build(artist_song_map.select("artist_id").distinct()),
        "artist_id",
        "left_semi",
    )
    if materialize:
        artist = artist.localCheckpoint(eager=True)
    return Tables(
        artist=artist, song=song, artist_song_map=artist_song_map, ranking=ranking
    )
