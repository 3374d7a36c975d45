"""SQL-surface table functions (Python UDTFs).

The reference exposes ``calculate_rank_delta_between_dates_fn`` as a
set-returning SQL function (``create_schema_behavior.sql:36-54``) callable
from any SQL client. The engine's primary implementation is the
DataFrame-composed ``plans.views.rank_delta_between_dates`` (pure Catalyst,
broadcast join); this module adds the equivalent **SQL entry point** via a
Spark Python UDTF with a TABLE argument, so ``spark.sql`` users get the
same call shape:

    SELECT * FROM rank_delta(
        TABLE(ranking) PARTITION BY (isrc, ranking_source),
        DATE'2026-07-23', DATE'2026-07-24')

The UDTF receives one (isrc, source) group per partition, buffers only
that group's ≤2 relevant rows, and emits the delta in ``terminate()`` —
state is O(1) per group, sharded by the PARTITION BY shuffle. For bulk
analytics prefer the DataFrame form; the UDTF exists for SQL-surface
parity and as the template for per-group logic that Catalyst can't
express.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.functions import udtf
from pyspark.sql.session import SparkSession


@udtf(returnType="ranking_source string, isrc string, delta int")
class RankDeltaUDTF:
    """Per (isrc, source) group: delta = comparison.rank - baseline.rank
    (the reference's J2 sign convention: positive = dropped)."""

    def __init__(self) -> None:
        self._baseline: int | None = None
        self._comparison: int | None = None
        self._key: tuple[str, str] | None = None

    def eval(self, row, baseline_date: dt.date, comparison_date: dt.date):
        self._key = (row["ranking_source"], row["isrc"])
        if row["ranking_date"] == baseline_date:
            self._baseline = row["rank"]
        elif row["ranking_date"] == comparison_date:
            self._comparison = row["rank"]

    def terminate(self):
        if (
            self._key is not None
            and self._baseline is not None
            and self._comparison is not None
        ):
            yield (*self._key, self._comparison - self._baseline)


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("rank_delta", RankDeltaUDTF)
