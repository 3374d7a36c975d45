"""Seed-replay golden tests (SURVEY.md §5).

The committed leaderboard ``/root/reference/README.md:12-21`` is the golden
output for 2026-07-24 — the flagship delta view must reproduce it, including
Billie Jean +3, Self Aware -4, and "—" holds.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from daily_top_songs_etl_spark.plans.report import render_markdown, report_rows
from daily_top_songs_etl_spark.plans.views import (
    all_rankings_view,
    all_rankings_with_delta_view,
    rank_delta_between_dates,
)

GOLDEN_DATE = dt.date(2026, 7, 24)

# /root/reference/README.md:12-21 — (delta display, song label)
GOLDEN_SPOTIFY = [
    ("—", "Burna Boy, Shakira - Dai Dai"),
    ("—", "Justin Bieber, Nicki Minaj - Beauty And A Beat"),
    ("—", "Ariana Grande - hate that i made you love me"),
    ("—", "Malcolm Todd - Earrings"),
    ("+3", "Michael Jackson - Billie Jean"),
    ("+1", "Dominic Fike - Babydoll"),
    ("-1", "Oasis - Wonderwall - Remastered"),
    ("+1", "BTS - SWIM"),
    ("-4", "Temper City - Self Aware"),
    ("—", "Katy Perry - The One That Got Away"),
]


def _tables(cat):
    return (
        cat.read("ranking"),
        cat.read("artist"),
        cat.read("song"),
        cat.read("artist_song_map"),
    )


def test_bootstrap_invariants(spark, seeded_catalog):
    ranking, artist, song, amap = _tables(seeded_catalog)
    # Key uniqueness (UNIQUE constraints) survived the replay. The raw CSVs
    # contain exact duplicates (artist 217→207, song 388→363, map 536→533)
    # that ON CONFLICT DO NOTHING collapses — so must we.
    assert artist.count() == artist.select("artist_id").distinct().count() == 207
    assert song.count() == song.select("isrc").distinct().count() == 363
    assert amap.count() == amap.distinct().count() == 533
    assert (
        ranking.groupBy("isrc", "ranking_date", "ranking_source")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    # Exactly 10 ranks per (date, source) group; ranks within [1,10].
    groups = ranking.groupBy("ranking_date", "ranking_source").count()
    assert groups.filter("count != 10").count() == 0
    assert ranking.filter(~F.col("rank").between(1, 10)).count() == 0


def test_flagship_delta_view_golden(spark, seeded_catalog):
    ranking, artist, song, amap = _tables(seeded_catalog)
    view = all_rankings_with_delta_view(ranking, artist, song, amap)
    rows = report_rows(view, GOLDEN_DATE).collect()
    spotify = [r for r in rows if r["platform"] == "Spotify"]
    assert len(spotify) == 10
    got = [(r["delta_display"], r["song_md"].replace("\\", "")) for r in spotify]
    assert got == GOLDEN_SPOTIFY
    # Apple Music stopped 2025-03-10 — no rows for the golden date.
    assert not [r for r in rows if r["platform"] == "Apple Music"]


def test_render_markdown_matches_reference_rows(spark, seeded_catalog):
    ranking, artist, song, amap = _tables(seeded_catalog)
    view = all_rankings_with_delta_view(ranking, artist, song, amap)
    rows = [r.asDict() for r in report_rows(view, GOLDEN_DATE).collect()]
    md = render_markdown(rows, GOLDEN_DATE)
    ref = open("/root/reference/README.md").read()
    # Every golden table line appears verbatim in our rendering.
    for line in ref.splitlines():
        if line.startswith("| ") and "Rank" not in line and "---" not in line:
            assert line.rstrip() in md, f"missing line: {line}"
    assert "Friday, July 24, 2026" in md


def test_all_rankings_view_shape(spark, seeded_catalog):
    ranking, artist, song, amap = _tables(seeded_catalog)
    view = all_rankings_view(ranking, artist, song, amap)
    assert view.columns == ["date", "platform", "rank", "song"]
    assert view.count() == ranking.count()
    # Enum ordinal ordering: for a date with both platforms, Spotify first.
    day = view.filter(F.col("date") == F.lit(dt.date(2025, 3, 1))).collect()
    platforms = [r["platform"] for r in day]
    assert platforms == ["Spotify"] * 10 + ["Apple Music"] * 10


def test_rank_delta_between_dates_sign(spark, seeded_catalog):
    ranking, artist, song, amap = _tables(seeded_catalog)
    # X2 sign convention: comparison - baseline (positive = dropped).
    out = rank_delta_between_dates(
        ranking, dt.date(2026, 7, 23), GOLDEN_DATE
    ).collect()
    by_isrc = {r["isrc"]: r["delta"] for r in out}
    # Billie Jean moved up 3 (8 -> 5): delta here must be -3 (opposite of W3).
    bj = (
        ranking.filter(
            (F.col("ranking_date") == GOLDEN_DATE) & (F.col("rank") == 5)
        )
        .select("isrc")
        .first()["isrc"]
    )
    assert by_isrc[bj] == -3


def test_rank_delta_udtf_matches_dataframe_form(spark, seeded_catalog):
    """The SQL-surface UDTF (TABLE arg, PARTITION BY group) must produce
    exactly the DataFrame table-function's rows."""
    import datetime as dt

    from daily_top_songs_etl_spark.functions.udtfs import register_udtfs
    from daily_top_songs_etl_spark.plans.views import rank_delta_between_dates

    register_udtfs(spark)
    ranking = seeded_catalog.read("ranking")
    ranking.createOrReplaceTempView("ranking_v")
    d1, d2 = dt.date(2026, 7, 23), dt.date(2026, 7, 24)
    via_sql = spark.sql(
        f"""SELECT * FROM rank_delta(
              TABLE(ranking_v) PARTITION BY (isrc, ranking_source),
              DATE'{d1}', DATE'{d2}')"""
    )
    # the DataFrame form renames ranking_source -> platform (P8)
    from pyspark.sql import functions as F

    via_df = rank_delta_between_dates(ranking, d1, d2).select(
        F.col("platform").alias("ranking_source"), "isrc", "delta"
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )
    assert via_sql.count() > 0
