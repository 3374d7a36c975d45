"""Conditional small-scan fan-out for CPU-heavy corpus operators.

A corpus that arrives as one (or few) files scans as one (or few)
partitions, so a tokenize/regex-heavy first stage runs on one core no
matter how many the session has. At production scale the input is
thousands of files and the scan is already wider than the executor pool —
so the fan-out must be a NO-OP there and only trigger on
under-partitioned inputs (the same guard extensions.multimodal uses for
its Python kernel).

Only operators whose plan already contains a shuffle (explode → groupBy
families) use this: for them the extra round-robin exchange of the raw
corpus exists only at toy scale. Pure-projection operators (redact,
winnow, chunking, encode) stay shuffle-free by design — their zero-
Exchange plan IS the contract, and their single-threaded cost at toy
scale is bounded by the tiny input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session default parallelism — but
    ONLY when the input arrives narrower than that (small/few files).
    At scale (partitions >= parallelism) this returns ``df`` unchanged
    and adds nothing to the plan."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
