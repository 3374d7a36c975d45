"""Explicit schemas for every table and in-flight record.

Mirrors the reference DDL (``db/sql/create_schema_structure.sql:19-70``) and
the in-flight nested song document (``etl_pipeline.py:350-363``). Spark does
not enforce PK/FK/CHECK constraints; those become validation predicates in
``operators.validate`` and dedup keys in ``operators.upsert``.

The Postgres ``SERIAL ranking_id`` (``create_schema_structure.sql:56``) is
dropped deliberately: it is never consumed downstream (SURVEY.md §7.4.7), and
a global auto-increment is an anti-pattern at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- dimension: artist (create_schema_structure.sql:19-24) -----------------
ARTIST = T.StructType(
    [
        T.StructField("artist_id", T.StringType(), nullable=False),
        T.StructField("artist_name", T.StringType(), nullable=False),
    ]
)
ARTIST_KEY = ["artist_id"]

# --- dimension: song (create_schema_structure.sql:28-39) -------------------
SONG = T.StructType(
    [
        T.StructField("isrc", T.StringType(), nullable=False),
        T.StructField("song_name", T.StringType(), nullable=False),
        T.StructField("song_duration_ms", T.IntegerType(), nullable=False),
        T.StructField("is_explicit", T.BooleanType(), nullable=False),
        T.StructField("spotify_url", T.StringType(), nullable=False),
        T.StructField("apple_music_url", T.StringType(), nullable=True),
    ]
)
SONG_KEY = ["isrc"]

# --- bridge: artist_song_map (create_schema_structure.sql:43-50) -----------
ARTIST_SONG_MAP = T.StructType(
    [
        T.StructField("artist_id", T.StringType(), nullable=False),
        T.StructField("isrc", T.StringType(), nullable=False),
    ]
)
ARTIST_SONG_MAP_KEY = ["artist_id", "isrc"]

# --- fact: ranking (create_schema_structure.sql:54-70) ---------------------
# UNIQUE (isrc, ranking_date, ranking_source) and
# UNIQUE (ranking_date, rank, ranking_source); CHECK rank in [1,10] and
# ranking_date <= CURRENT_DATE.
RANKING = T.StructType(
    [
        T.StructField("isrc", T.StringType(), nullable=False),
        T.StructField("ranking_date", T.DateType(), nullable=False),
        T.StructField("rank", T.IntegerType(), nullable=False),
        T.StructField("ranking_source", T.StringType(), nullable=False),
    ]
)
RANKING_KEY = ["isrc", "ranking_date", "ranking_source"]
RANKING_SLOT_KEY = ["ranking_date", "rank", "ranking_source"]

# music_source_enum_type ('Spotify', 'Apple Music') —
# create_schema_structure.sql:16. Declaration ORDER matters for sorting
# (SURVEY.md §1.2): Spotify sorts before Apple Music.
MUSIC_SOURCES = ["Spotify", "Apple Music"]

# --- in-flight daily batch (etl_pipeline.py:350-363, 839-850) --------------
ARTIST_STRUCT = T.StructType(
    [
        T.StructField("artist_id", T.StringType(), nullable=False),
        T.StructField("artist_name", T.StringType(), nullable=False),
    ]
)
DAILY_BATCH = T.StructType(
    [
        T.StructField("position", T.IntegerType(), nullable=False),
        T.StructField("source", T.StringType(), nullable=False),
        T.StructField("isrc", T.StringType(), nullable=False),
        T.StructField("artists", T.ArrayType(ARTIST_STRUCT), nullable=False),
        T.StructField("song_name", T.StringType(), nullable=False),
        T.StructField("song_duration_ms", T.IntegerType(), nullable=False),
        T.StructField("is_explicit", T.BooleanType(), nullable=False),
        T.StructField("spotify_url", T.StringType(), nullable=False),
        T.StructField("apple_music_url", T.StringType(), nullable=True),
    ]
)

# --- raw Spotify /v1/tracks response, the subset P2 projects ---------------
# (etl_pipeline.py:326-363): external_ids.isrc, artists[].{id,name},
# duration_ms, explicit, external_urls.spotify, name.
SPOTIFY_TRACK = T.StructType(
    [
        T.StructField(
            "external_ids",
            T.StructType([T.StructField("isrc", T.StringType())]),
        ),
        T.StructField(
            "artists",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("explicit", T.BooleanType()),
        T.StructField(
            "external_urls",
            T.StructType([T.StructField("spotify", T.StringType())]),
        ),
        T.StructField("name", T.StringType()),
    ]
)
SPOTIFY_TRACKS_RESPONSE = T.StructType(
    [T.StructField("tracks", T.ArrayType(SPOTIFY_TRACK))]
)

TABLE_SCHEMAS = {
    "artist": ARTIST,
    "song": SONG,
    "artist_song_map": ARTIST_SONG_MAP,
    "ranking": RANKING,
}
TABLE_KEYS = {
    "artist": ARTIST_KEY,
    "song": SONG_KEY,
    "artist_song_map": ARTIST_SONG_MAP_KEY,
    "ranking": RANKING_KEY,
}
