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


def z16_sql(x: str, y: str) -> str:
    """SQL expression for a 32-bit Morton (Z-order) value interleaving the
    low 16 bits of two integer columns — engine-portable (identical text
    runs in Spark SQL and DuckDB; only `>>`/`&`/`*`/`+` on integers).

    Z-ordering is the multi-column generalization of :func:`cluster_by`:
    range-clustering on the interleaved value gives every file a tight
    bounding box in BOTH dimensions, so min/max file skipping works for
    filters on either column (or both) — one sort order serving two
    predicate columns, where a lexicographic sort serves only the leading
    one. The bit-interleave is built as a flat sum of 32 masked terms:
    pure integer codegen, no UDF, no lambda.
    """
    xm, ym = f"(({x}) & 65535)", f"(({y}) & 65535)"
    terms = [f"((({xm} >> {i}) & 1) * {1 << (2 * i)})" for i in range(16)]
    terms += [f"((({ym} >> {i}) & 1) * {1 << (2 * i + 1)})" for i in range(16)]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_cluster(
    df: DataFrame, x: str, y: str, n_files: int
) -> DataFrame:
    """Arrange ``df`` for a write producing ``n_files`` files tightly
    bounded in the (x, y) plane: compute the Morton value, range-cluster
    on it, drop the helper column at write time if unwanted."""
    from pyspark.sql import functions as F

    return cluster_by(
        df.withColumn("__z", F.expr(z16_sql(x, y))), ["__z"], n_files
    )


def compact(
    spark,
    src: str,
    dest: str,
    target_file_bytes: int = 128 << 20,
    preserve_cluster: list[str] | None = None,
) -> int:
    """Small-file compaction (the lakehouse OPTIMIZE pass): bin-pack a
    directory of parquet files into ~``target_file_bytes`` outputs.

    Micro-batch appends (the reference's ~10-rows/day cadence) accumulate
    tiny files whose per-file open/footer cost eventually dominates scans;
    compaction rewrites them at the target size. File sizes go through
    ``Catalog.dir_file_sizes`` — the codebase's single physical-listing
    site, so a non-POSIX backend (object-store LIST) swaps one method and
    every compactor follows; the Spark plan is identical either way.
    Round-robin ``repartition`` balances output bytes; pass
    ``preserve_cluster`` to instead re-run :func:`cluster_by` so an
    existing sort layout survives the rewrite. Writes to ``dest`` (swap is
    the caller's atomic-rename step, mirroring the catalog's versioned
    pointer flip). Returns the output file count.
    """
    import math

    from ..catalog import Catalog

    total = sum(
        sz
        for rel, sz in Catalog.dir_file_sizes(src).items()
        if rel.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    arranged = (
        cluster_by(df, preserve_cluster, n)
        if preserve_cluster
        else df.repartition(n)
    )
    arranged.write.mode("overwrite").parquet(dest)
    return n
