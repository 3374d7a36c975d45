"""Dump .explain("formatted") for named registry queries to plans/<round>/.

Usage:
    python tools/explain_dump.py <tag> <query> [<query> ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default r12). Construction of a
query DataFrame may itself run driver-side work (the lifecycle faces build
their index before returning the read-back frame); the dumped plan is the
plan of the RETURNED frame — the artifact the driver hashes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from daily_top_songs_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    for name in names:
        df = registry[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
