"""Scalar expression library (SURVEY.md §2.9)."""

from .enum_order import source_ordinal
from .song_info import song_info
from .strings import embed_spotify_url, escape_markdown

__all__ = ["source_ordinal", "song_info", "escape_markdown", "embed_spotify_url"]
