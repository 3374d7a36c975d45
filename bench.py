"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the noop sink (full plan runs,
no driver-side collect cost skewing the number).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from daily_top_songs_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline subset: one per workload class (scan+agg, window, dedup, join,
# string-agg, top-k) plus every extension operator present in the registry.
HEADLINE = [
    "pricing_summary",
    "flagship_delta",
    "priority_dedup",
    "topk_per_group",
    "string_agg",
    "left_join",
    "window_gap",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    # Headline first (stable ordering for round-over-round comparison),
    # then every other registered query — the bench covers the full
    # operator surface.
    names = [n for n in HEADLINE if n in registry]
    names += [n for n in sorted(registry) if n not in names]

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    # Warm the JVM/session so the first timed query isn't charged startup:
    # codegen + noop sink via the range query, then the parquet scan path
    # (Hadoop FS init, footer reads, vectorized-reader codegen) via a
    # trivial count over each input table.
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    for tbl in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        try:
            spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").selectExpr(
                "count(*)"
            ).write.mode("overwrite").format("noop").save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in names:
        df = registry[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
