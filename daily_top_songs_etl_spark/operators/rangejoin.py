"""Bucketed event-time range join.

"For each probe row, aggregate build rows of the same key within a
trailing time interval" — the shape behind attribution windows, rate
counters, and feature lookback joins. Spark has no native range join; the
naive formulation (equi-join on the key + range predicate) degenerates to
per-key cross products that the range filter prunes only AFTER

materialization.

Spark-first rewrite: quantize time into interval-sized buckets, explode
each probe row to the 2 buckets its trailing window can touch, equi-join
on (key, bucket) — candidates are then at most the build rows of two
buckets, and the exact range predicate runs on that pruned set. One
shuffle on a compound key, no cross product; bucket count scales with
data span, not row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, interval_s: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / F.lit(interval_s)).cast("bigint")


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    interval_s: int,
    out: str = "n_in_range",
) -> DataFrame:
    """Count build rows with ``build_ts`` in ``[probe_ts - interval,
    probe_ts)`` per probe row. Returns probe columns + the count."""
    pb = probe.withColumn(
        "__bucket",
        F.explode(
            F.array(
                _bucket(F.col(probe_ts), interval_s) - F.lit(1),
                _bucket(F.col(probe_ts), interval_s),
            )
        ),
    )
    bd = build.select(
        F.col(key),
        F.col(build_ts).alias("__bts"),
        _bucket(F.col(build_ts), interval_s).alias("__bucket"),
    )
    in_range = (
        F.col("__bts") >= F.col(probe_ts) - F.expr(f"INTERVAL {interval_s} SECOND")
    ) & (F.col("__bts") < F.col(probe_ts))
    joined = pb.join(bd, [key, "__bucket"], "left")
    return (
        joined.groupBy(*probe.columns)
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0)).cast("bigint").alias(out)
        )
    )
