"""Driver-environment simulation of the CORRECTNESS window: run the
FIRST N registry slots (default 50 — exactly what the driver samples)
under a VANILLA SparkSession (no engine configs, local[8] — the
driver's environment, NOT `session.get_spark`) against the DuckDB
oracle at sf0.01, with the same rows/schema/value-multiset compare as
tests/test_oracle.py. Any red here is a driver red later.

Usage:
  python tools/driver_sim.py [SF_DIR] [--slots N] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_sweep import TABLES, _mset  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _expected_rows(sf_dir: str) -> dict:
    """Committed expected row counts for rows_only() queries at this
    SF (ROWS_ONLY_EXPECTED.json, keyed by the sfX token of the data
    dir). An SF with no committed entry makes every rows-only face RED
    (missing-manifest is a loud failure, never a silent degrade to the
    unfalsifiable rows>0 check the round-9 verdict rejected — add the
    SF's block to the manifest before running a window there)."""
    import re

    # matches single-digit tokens too (sf1), not just dotted ones —
    # [0-9.]+[0-9] would silently skip sf1 and degrade the check to >0
    m = re.search(
        r"(sf[0-9]+(?:\.[0-9]+)?)",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    if not m:
        return {}
    try:
        with open(os.path.join(_REPO, "ROWS_ONLY_EXPECTED.json")) as f:
            return json.load(f).get(m.group(1), {})
    except FileNotFoundError:
        return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    # vanilla: the only conf the driver is known to set is a small core
    # count; entry/queries must self-configure everything else
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill_driver_sim'")
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)[: args.slots]
    results, red = {}, []
    for name in names:
        rec = {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "err": None,
        }
        try:
            sdf = qs[name](spark, args.sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                # rows_only() face in the window: the driver records the
                # weaker check — rows actually produced, schema stable,
                # hash exempt (no oracle exists BY NATURE; see
                # rows_only()). Two falsifiability rules (round-9
                # verdict #2 + ADVICE #1): (a) rows_match means the
                # count EQUALS the committed ROWS_ONLY_EXPECTED.json
                # entry for this SF — row counts are deterministic even
                # where values are build-specific — not merely >0;
                # (b) hash_match is recorded as None, the same shape
                # the real driver writes (hash_match: null,
                # err: 'no_oracle'), so no consumer can count an
                # uncompared hash as a verified one.
                assert name in entrymod.rows_only(), (
                    f"{name} lacks an oracle but is not annotated rows-only"
                )
                expected = _expected_rows(args.sf_dir).get(name)
                rec["spark_rows"] = len(srows)
                rec["expected_rows"] = expected
                if expected is None:
                    # no committed count for this SF: fail LOUDLY — a
                    # silent >0 degrade is the unfalsifiable check the
                    # round-9 verdict rejected
                    rec["rows_match"] = False
                    rec["err"] = (
                        "no ROWS_ONLY_EXPECTED.json entry for this SF"
                    )
                else:
                    rec["rows_match"] = len(srows) == expected
                rec["schema_match"] = len(scols) > 0
                rec["hash_match"] = None  # exempt, not compared
                rec["rows_only"] = True
                results[name] = rec
                ok = rec["rows_match"] and rec["schema_match"]
                if not ok:
                    red.append(name)
                print(
                    ("OK  " if ok else "RED ")
                    + f" {name} (rows-only, hash exempt; rows "
                    + f"{len(srows)} vs expected {expected})",
                    flush=True,
                )
                continue
            sql = oracles[name]
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["spark_rows"], rec["oracle_rows"] = len(srows), len(drows)
            rec["rows_match"] = len(srows) == len(drows)
            rec["schema_match"] = sorted(scols) == sorted(dcols)
            if rec["rows_match"] and rec["schema_match"]:
                sm = _mset(scols, [[r[c] for c in scols] for r in srows])
                dm = _mset(dcols, drows)
                rec["hash_match"] = sm == dm
        except Exception as exc:  # noqa: BLE001 — recorded, like the driver
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            red.append(name)
        print(
            ("OK  " if ok else "RED ") + f" {name}"
            + (f" err={rec['err']}" if rec["err"] else ""),
            flush=True,
        )
    summary = {
        "sf_dir": args.sf_dir, "n_slots": len(names),
        "n_green": len(names) - len(red), "red": red,
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
