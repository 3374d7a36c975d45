"""Reproducible 10x-scale spot bench: time registry queries at sf0.1 and
at a gen_sfx.py output dir, print per-query slopes as JSON.

Usage:
  python tools/spot_bench_sfx.py SFX_DIR [query ...]

With no query names, runs the default group-sensitive set (the shapes
whose cost could hide a per-group quadratic: windows over growing
partitions, fact-fact joins on growing FK groups, per-key aggregates).
Each query runs once warm-up + twice timed (best kept) per dataset in
one warm local[32] session. slope = wall(sfx) / wall(sf0.1); linear
scaling is <= N_replicas, flat (~1) while cores are underutilized.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "pricing_summary",
    "order_count_histogram",
    "topk_per_group",
    "window_gap",
    "window_running",
    "length_percentiles",
    "left_join",
    "regional_volume",
    "product_type_profit",
    "market_share",
    "top_supplier",
    "priority_shipment_counts",
    "part_supplier_counts",
    "heavy_hitters",
    "global_row_number",
    "salted_join_agg",
    "sessionize",
    "cohort_retention",
    "cumulative_distinct",
    "max_concurrency",
]


def main() -> None:
    sfx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx1_grow"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from daily_top_songs_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark()
    registry = entrymod.queries()
    out = {}
    for name in names:
        fn = registry[name]
        walls = {}
        for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sfx", sfx_dir)):
            fn(spark, d).count()  # warm: scan + codegen
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).count()
                w = time.time() - t0
                best = w if best is None else min(best, w)
            walls[label] = round(best, 3)
        out[name] = {
            "sf0.1": walls["sf0.1"],
            "sfx": walls["sfx"],
            "slope": round(walls["sfx"] / walls["sf0.1"], 2),
        }
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({"sfx_dir": sfx_dir, "queries": out}), flush=True)


if __name__ == "__main__":
    main()
