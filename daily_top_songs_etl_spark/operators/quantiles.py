"""Exact distributed order statistics without a global sort.

``ORDER BY value`` + pick row N is the textbook way to a median and the
wrong plan at 100 TB: a total ordering either funnels into one task or
pays a full range-exchange of the corpus for 1 row of output. The
two-pass pigeonhole selection here reads the data twice and shuffles
only per-bucket COUNTS:

1. **Histogram pass**: per (group, bucket) row counts over a fixed
   integer bucketing of the value range — a map-side-combinable
   aggregate whose exchange carries ≤ groups·n_buckets summary rows.
   The cumulative walk to locate each target rank's bucket happens on
   the driver over that bounded relation (dimension-like group
   cardinality is the documented contract, exactly as for broadcast
   dims).
2. **Selection pass**: re-scan semi-joined to ONLY the located buckets
   (≤ one bucket per requested quantile per group), rank within each
   small bucket, and pick the remaining offset. The per-bucket window
   partitions by (group, bucket), so no task ever sorts more than
   ~n/n_buckets rows.

Everything is exact BIGINT — positions use the lower-order-statistic
convention pos = ((n−1)·num) div den + 1, so there is no interpolation
and no float anywhere: the result is THE element at that rank,
bit-identical in any engine.

A value distribution so skewed that one bucket holds most of a group
degrades pass 2 toward the naive sort for that group; production would
recurse the bucketing inside the hot bucket (same primitive, one more
level). Not needed at test scale and left out to keep the operator one
round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_sql_type(df: DataFrame, group_col: str) -> str:
    return df.schema[group_col].dataType.simpleString()


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4)),
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact per-group order statistics (lower convention) for each
    rational quantile (num, den). Returns one row per (group, quantile):
    (group, q_num, q_den, n, pos, value).
    """
    for num, den in quantiles:
        if not 0 < num < den:
            raise ValueError(f"quantile {num}/{den} must be in (0, 1)")
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    stats = {
        r.g: (r.n, r.mn, r.mx)
        for r in vals.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    spark = df.sparkSession
    gtype = _group_sql_type(df, group_col)
    # Per-group integer bucketing (width ≥ 1 spans the closed range in
    # ≤ n_buckets buckets) — broadcast-joined, all arithmetic in
    # integer `div` so bucket ids are exact for any BIGINT values.
    ranges = spark.createDataFrame(
        [
            (g, mn, (mx - mn) // n_buckets + 1)
            for g, (n, mn, mx) in stats.items()
        ],
        f"g {gtype}, __mn long, __w long",
    )
    bucketed = (
        vals.join(F.broadcast(ranges), "g")
        .withColumn("b", F.expr("(v - __mn) div __w"))
        .drop("__mn", "__w")
    )
    hist = {
        (r.g, r.b): r.c
        for r in bucketed.groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # Driver walk: locate each target rank's bucket + in-bucket offset.
    targets = []  # (g, bucket, q_num, q_den, n, pos, offset)
    for g, (n, mn, mx) in stats.items():
        by_bucket = sorted(
            (b, c) for (gg, b), c in hist.items() if gg == g
        )
        for num, den in quantiles:
            pos = (n - 1) * num // den + 1
            cum = 0
            for b, c in by_bucket:
                if cum + c >= pos:
                    targets.append((g, b, num, den, n, pos, pos - cum))
                    break
                cum += c
    tgt = spark.createDataFrame(
        targets,
        f"tg {gtype}, tb long, q_num int, q_den int, n long, pos long, "
        "off long",
    )
    w = Window.partitionBy("g", "b").orderBy("v")
    ranked = (
        bucketed.join(
            F.broadcast(
                tgt.select(
                    F.col("tg").alias("g"), F.col("tb").alias("b")
                ).distinct()
            ),
            ["g", "b"],
            "left_semi",
        )
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.join(
            F.broadcast(tgt),
            (F.col("g") == F.col("tg"))
            & (F.col("b") == F.col("tb"))
            & (F.col("rn") == F.col("off")),
        )
        .select(
            F.col("g").alias(group_col),
            "q_num",
            "q_den",
            "n",
            "pos",
            F.col("v").alias("value"),
        )
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_mad: int = 3,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-group robust outlier detection by median absolute deviation:
    med = exact lower median of the value, mad = exact lower median of
    |value − med|, outliers = rows with |value − med| > k·mad — the
    quality-monitoring gate that, unlike mean/stddev, a handful of
    broken documents cannot drag along with them.

    Two :func:`grouped_exact_quantiles` selections (each two bounded
    passes, no sorts) + one counting aggregate; every quantity is an
    exact BIGINT, so the flagged set is engine-reproducible. Returns
    (group, n, med, mad, n_outliers).
    """
    med = grouped_exact_quantiles(
        df, group_col, value_col, quantiles=((1, 2),), n_buckets=n_buckets
    ).select(
        F.col(group_col).alias("__g"),
        F.col("n"),
        F.col("value").alias("med"),
    )
    dev = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("bigint").alias("v"),
        )
        .join(F.broadcast(med), "__g")
        .withColumn("adev", F.abs(F.col("v") - F.col("med")))
    )
    mad = grouped_exact_quantiles(
        dev, "__g", "adev", quantiles=((1, 2),), n_buckets=n_buckets
    ).select(F.col("__g"), F.col("value").alias("mad"))
    flagged = (
        dev.join(F.broadcast(mad), "__g")
        .groupBy("__g")
        .agg(
            F.sum(
                F.when(
                    F.col("adev") > F.lit(k_mad) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
    return (
        med.join(mad, "__g")
        .join(flagged, "__g")
        .select(
            F.col("__g").alias(group_col), "n", "med", "mad", "n_outliers"
        )
    )
