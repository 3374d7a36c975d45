"""Physical data layout: range-clustered, sorted Parquet writes.

The reference's only layout lever is a Postgres composite index
(create_schema_behavior.sql:10-12, `(ranking_date DESC, ranking_source,
rank)`). The columnar equivalent at 100 TB is *file skipping*: write the
table range-partitioned and sorted on the hot filter columns, so every
file (and every row group inside it) covers a narrow, non-overlapping
value range, and Parquet min/max statistics let a filtered scan drop
whole files without opening them. Combined with the catalog's
date-partition pruning this is the difference between "scan a year" and
"open three files".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_by(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Arrange ``df`` so a write produces ``n_files`` files with pairwise
    non-overlapping ranges of ``cols``.

    ``repartitionByRange`` samples the key distribution and assigns
    contiguous, non-overlapping key ranges to partitions (skew-resistant:
    boundaries follow quantiles, not fixed widths); the within-partition
    sort tightens per-row-group min/max so skipping works at row-group
    granularity too. Cost is one range shuffle at write time, paid once,
    amortized over every filtered read.
    """
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def write_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    cluster_by(df, cols, n_files).write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed, per-bucket-sorted Parquet table.

    Bucketing is the *pre-paid shuffle*: rows are hash-distributed into
    ``n_buckets`` files on the join/aggregation key at write time, and the
    catalog records that layout. Every later equi-join or aggregation on
    the bucket key between co-bucketed tables then plans with NO exchange
    on either side (the scan already satisfies the required
    HashPartitioning) — at 100 TB this removes the dominant cost of
    fact-to-fact joins that repeat across a workload. The per-bucket
    ``sortBy`` additionally lets sort-merge joins skip their sort step.

    Requires ``saveAsTable`` (bucket metadata lives in the catalog, not in
    the files); ``path`` makes it an external table so tests can point it
    at a temp directory.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
