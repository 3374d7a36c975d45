"""Ingest shim — S1-S5/P1-P3 as offline-first operators.

The reference's extract phase (``etl_pipeline.py:177-568``) is asyncio HTTP:
OAuth token (S3), playlist HTML fetch (S1), meta-tag URL extraction limited
to the top 10 (P1), one batched ``/v1/tracks?ids=...`` lookup for all 10
tracks (S4 — "More efficient to make 1 request for 10 tracks",
``etl_pipeline.py:398``), and a nested-JSON projection (P2).

Spark-native split:

- **Parsing/projection is DataFrame work** and runs distributed: HTML meta
  extraction via ``regexp_extract_all``, track-response shredding via
  ``from_json`` with a declared schema + ``posexplode`` — no Python loop
  touches row data.
- **Network I/O is an edge concern**: ``fetch_url``/``fetch_token`` are thin
  driver-side helpers gated behind an import-try (offline environments and
  all tests feed fixture payloads instead). At scale a URL list becomes a
  DataFrame and ``fetch_batch_udf``-style ``mapInPandas`` does batched
  requests per partition, preserving the reference's own batching argument.

The Apple Music path (S5/P3/U1) is implemented but **gated off by default**,
mirroring the reference's disabled state (``etl_pipeline.py:923-999``
commented out; ``README.md:5-6``).
"""

from __future__ import annotations

import base64
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

APPLE_MUSIC_ENABLED = False  # mirrors the reference's disabled Apple path

# P1: <meta name="music:song" content="URL"> in rank order
# (etl_pipeline.py:296-323); the Apple variant uses property= (:416-445).
_SPOTIFY_META = '<meta name="music:song" content="([^"]+)"'
_APPLE_META = '<meta property="music:song" content="([^"]+)"'


def song_urls_from_html(
    spark: SparkSession, html: str, source: str = "Spotify", limit: int = 10
) -> DataFrame:
    """P1 as a plan: 1-row raw DataFrame -> exploded (position, url) rows.

    ``regexp_extract_all`` + ``slice`` keep the top-``limit`` tags in
    document order = rank order; ``posexplode`` carries the position that
    later becomes the rank (P6).
    """
    pattern = _SPOTIFY_META if source == "Spotify" else _APPLE_META
    raw = spark.createDataFrame([(html,)], "html string")
    return (
        raw.select(
            F.slice(
                F.regexp_extract_all("html", F.lit(pattern), F.lit(1)), 1, limit
            ).alias("urls")
        )
        .select(F.posexplode("urls").alias("position", "url"))
        .withColumn("source", F.lit(source))
        .withColumn(
            # P4: track id = last path segment (etl_pipeline.py:397).
            "track_id",
            F.element_at(F.split("url", "/"), -1),
        )
    )


def tracks_response_to_daily_batch(
    spark: SparkSession, response_json: str, source: str = "Spotify"
) -> DataFrame:
    """P2: shred one batched ``/v1/tracks`` response into the daily-batch
    shape (``etl_pipeline.py:326-363``) — array order is rank order
    (``:398,407``), preserved via ``posexplode``.
    """
    raw = spark.createDataFrame([(response_json,)], "payload string")
    parsed = raw.select(
        F.from_json("payload", schemas.SPOTIFY_TRACKS_RESPONSE).alias("r")
    )
    return (
        parsed.select(F.posexplode("r.tracks").alias("position", "t"))
        .select(
            F.col("position").cast("int"),
            F.lit(source).alias("source"),
            F.col("t.external_ids.isrc").alias("isrc"),
            F.transform(
                "t.artists",
                lambda a: F.struct(
                    a["id"].alias("artist_id"), a["name"].alias("artist_name")
                ),
            ).alias("artists"),
            F.col("t.name").alias("song_name"),
            F.col("t.duration_ms").alias("song_duration_ms"),
            F.col("t.explicit").alias("is_explicit"),
            F.col("t.external_urls.spotify").alias("spotify_url"),
            F.lit(None).cast("string").alias("apple_music_url"),
        )
    )


def stamp_apple_urls(apple_batch: DataFrame, apple_urls: DataFrame) -> DataFrame:
    """The reference's URL-patch loop (``etl_pipeline.py:992-997``): the
    scraped Apple playlist links are in 1-10 order, keyed positionally onto
    the Apple batch — each Apple row's ``apple_music_url`` becomes its
    playlist link. A broadcast join on position (≤10 rows each side)."""
    links = apple_urls.select("position", F.col("url").alias("__apple_url"))
    return (
        apple_batch.join(F.broadcast(links), "position", "left")
        .withColumn(
            "apple_music_url",
            F.coalesce(F.col("__apple_url"), F.col("apple_music_url")),
        )
        .drop("__apple_url")
    )


def combine_source_batches(
    spotify_batch: DataFrame, apple_batch: DataFrame
) -> DataFrame:
    """U1/U2 (``etl_pipeline.py:985-997`` — the dict-union the reference
    has commented out): ordered concatenation, Spotify rows first, Apple
    rows second. The right-bias of ``spotify | apple`` (Apple's song data
    wins on a duplicate ISRC) is realized downstream by the song upsert's
    priority dedup (``operators/upsert.py:169`` — ``apple_music_url NULLS
    LAST``): the Apple row carries a non-null apple_music_url after
    :func:`stamp_apple_urls`, so it outranks the Spotify duplicate.
    Positional ranks stay per-source (U3: each source's positions are
    0-9, so rank = position+1 within its own ranking_source)."""
    return spotify_batch.unionByName(apple_batch)


def fetch_batch_udf(urls: DataFrame, headers: dict[str, str] | None = None) -> DataFrame:
    """S1/S4 at scale: fetch a DataFrame of URLs with one HTTP session per
    partition, batched Arrow-side. Offline environments never call this."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        urls.schema.fields
        + [
            T.StructField("status", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request

        for pdf in batches:
            statuses, ctypes, payloads = [], [], []
            for url in pdf["url"]:
                try:
                    req = urllib.request.Request(url, headers=headers or {})
                    with urllib.request.urlopen(req, timeout=30) as resp:
                        statuses.append(resp.status)
                        ctypes.append(resp.headers.get("Content-Type", ""))
                        payloads.append(resp.read().decode("utf-8", "replace"))
                except Exception as exc:  # noqa: BLE001 — per-row error column
                    statuses.append(-1)
                    ctypes.append("")
                    payloads.append(str(exc))
            yield pdf.assign(status=statuses, content_type=ctypes, payload=payloads)

    return urls.mapInPandas(fetch_partition, out_schema)


def content_type_guard(df: DataFrame) -> DataFrame:
    """F10 (``etl_pipeline.py:212-222``): keep only HTML/JSON responses."""
    return df.filter(
        F.col("content_type").rlike("^(text/html|application/json)")
    )


def basic_auth_header(client_id: str, client_secret: str) -> str:
    """S3's credential encoding (``etl_pipeline.py:284-286``)."""
    token = base64.b64encode(f"{client_id}:{client_secret}".encode()).decode()
    return f"Basic {token}"


def apple_song_data_from_ldjson(html: str) -> dict:
    """P3 (dead code in the reference, ``etl_pipeline.py:448-484``): pull the
    ``<script id="schema:song" type="application/ld+json">`` body and project
    name + byArtist names. Driver-side; gated off with the Apple path."""
    import re

    m = re.search(
        r'<script id="schema:song" type="application/ld\+json">(.*?)</script>',
        html,
        re.DOTALL,
    )
    if not m:
        raise ValueError("no schema:song ld+json script found")
    doc = json.loads(m.group(1))
    return {
        "song_name": doc["name"],
        "artist_names": [a["name"] for a in doc.get("audio", {}).get("byArtist", [])],
    }
