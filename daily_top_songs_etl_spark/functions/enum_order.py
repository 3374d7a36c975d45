"""Enum declaration-order sort key.

Postgres enums sort by declaration order, not lexicographically:
``music_source_enum_type`` declares ``('Spotify', 'Apple Music')``
(``create_schema_structure.sql:16``), so ``ORDER BY ranking_source``
(``create_schema_behavior.sql:106-107``) puts Spotify first. A raw string
sort would reverse that. Every view sort goes through this ordinal
(SURVEY.md §1.2, §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import schemas


def source_ordinal(col: Column | str = "ranking_source") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(len(schemas.MUSIC_SOURCES))
    for i, name in reversed(list(enumerate(schemas.MUSIC_SOURCES))):
        expr = F.when(c == name, F.lit(i)).otherwise(expr)
    return expr
