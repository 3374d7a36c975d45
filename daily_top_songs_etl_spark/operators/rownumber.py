"""Distributed exact global row numbering.

A bare ``row_number() OVER (ORDER BY ...)`` (and ``ntile``) funnels every
row through ONE task — the classic scale cliff. The distributed rewrite is
the textbook two-phase scheme Spark's own ``sortWithinPartitions`` +
range-exchange machinery makes cheap:

1. ``repartitionByRange`` on the sort key — the same exchange a global
   ``orderBy`` plans, so partition *p* holds exactly the rows ranked after
   every row in partitions < *p* (the sort key must be a total order:
   callers pass a unique tie-break column, enforced here by requiring at
   least one key).
2. Per-partition sizes (a count per ``spark_partition_id`` — tiny, one row
   per partition) are collected, prefix-summed on the driver, and joined
   back as broadcast offsets.
3. Within each partition an ordinary windowed ``row_number`` (partitioned
   by the physical partition id, so ~|rows|/|partitions| per group instead
   of everything in one group) plus the offset gives the exact global rank.

Cost: one range exchange + one broadcast — versus the single-task sort.
Numbers are identical to the single-partition answer because the range
exchange preserves key order *between* partitions and the window orders
*within* them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def global_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Append an exact 1-based global row number under a total order.

    ``order`` must define a total order (include a unique tie-break key);
    equal-key rows could otherwise straddle a range boundary and the
    between-partition guarantee would not pin their relative numbers.

    The ranged relation feeds TWO actions (the per-partition count pass
    and the numbered output); Spark does not reuse an exchange across
    separate queries, so without ``persist`` the range shuffle runs
    twice. MEMORY_AND_DISK persistence costs one materialization — the
    same disk traffic the second shuffle would have paid — and halves
    the job. Callers doing their own caching can pass ``persist=False``.
    """
    if not order:
        raise ValueError("order must contain at least one column")
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    if persist:
        with_pid = with_pid.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    rows = sorted((r["__pid"], r["__n"]) for r in sizes.collect())
    offsets, acc = [], 0
    for pid, n in rows:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__pid int, __offset bigint")
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            (F.row_number().over(w) + F.col("__offset")).cast("bigint"),
        )
        .drop("__pid", "__offset")
    )


def global_running_sum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact inclusive running total of ``value_col`` under a total
    order, by the same two-phase scheme as :func:`global_row_number`:
    range exchange, per-partition value sums prefix-summed on the
    driver (one row per partition), windowed partial sum within each
    partition + broadcast offset. A bare ``SUM() OVER (ORDER BY ...)``
    would funnel the corpus through one task; this costs one range
    exchange and sums exact BIGINTs, so the totals are identical to the
    single-partition answer.

    The running total is the primitive behind corpus planning: token
    budgets, shard cut-points, quota lines — anywhere "the first N
    units under this order" must be answered exactly at scale.
    """
    if not order:
        raise ValueError("order must contain at least one column")
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    if persist:
        with_pid = with_pid.persist(StorageLevel.MEMORY_AND_DISK)
    sums = with_pid.groupBy("__pid").agg(
        F.sum(F.col(value_col).cast("bigint")).alias("__s")
    )
    rows = sorted((r["__pid"], r["__s"]) for r in sums.collect())
    offsets, acc = [], 0
    for pid, s in rows:
        offsets.append((pid, acc))
        acc += s
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__pid int, __voff bigint")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            (
                F.sum(F.col(value_col).cast("bigint")).over(w)
                + F.col("__voff")
            ).cast("bigint"),
        )
        .drop("__pid", "__voff")
    )
