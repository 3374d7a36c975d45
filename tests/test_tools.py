"""Tests for the standalone diagnostic tools in tools/."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from daily_top_songs_etl_spark.session import get_spark

    return get_spark(app_name="tools-tests", shuffle_partitions=4)


def test_checksum_compare_matches_and_detects_mismatch(spark):
    """The no-materialization checksum compare must agree with equality
    on identical multisets (any row order, NULLs included), reject a
    differing multiset, and refuse float columns."""
    from tools.oracle_sweep import _checksum_compare

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["k", "v"]
    )
    same = "SELECT * FROM (VALUES (3, 'c'), (1, 'a'), (2, NULL)) t(k, v)"
    assert _checksum_compare(df, con, same, 3) is True

    differs = "SELECT * FROM (VALUES (3, 'c'), (1, 'a'), (2, 'x')) t(k, v)"
    assert _checksum_compare(df, con, differs, 3) is False

    fewer = "SELECT * FROM (VALUES (1, 'a'), (2, NULL)) t(k, v)"
    assert _checksum_compare(df, con, fewer, 3) is False

    # doubles are eligible since round 8: canonicalized on both sides as
    # CAST(round(x*1e6, 0) AS BIGINT) — every engine face emits
    # round(x, 6) doubles, so micro-scaling is lossless
    floaty = spark.createDataFrame([(1, 0.123457), (2, -0.5)], ["k", "x"])
    f_same = "SELECT * FROM (VALUES (2, -0.5), (1, 0.123457)) t(k, x)"
    assert _checksum_compare(floaty, con, f_same, 2) is True
    f_diff = "SELECT * FROM (VALUES (2, -0.5), (1, 0.123458)) t(k, x)"
    assert _checksum_compare(floaty, con, f_diff, 2) is False

    # dates remain ineligible (stringification differs across engines)
    import datetime as dt

    datey = spark.createDataFrame([(1, dt.date(2026, 1, 1))], ["k", "d"])
    assert _checksum_compare(datey, con, "SELECT 1 AS k", 1) is None


def test_readme_registry_counts_match_code():
    """README's driver-contract counts are DERIVED from the registry, not
    hand-maintained (round-8 ADVICE: doc drift, twice). If this fails,
    update README.md's two count references."""
    import os
    import re

    import __spark_entry__ as entrymod

    n_q = len(entrymod.queries())
    n_o = len(entrymod.oracle_sql())
    assert n_q - n_o == len(entrymod.rows_only())
    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    ).read()
    m = re.search(r"(\d+) `queries\(\)`, (\d+) paired", readme)
    assert m, "README no longer states the registry counts"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o)
    m2 = re.search(r"every one of the (\d+) oracle-paired", readme)
    assert m2 and int(m2.group(1)) == n_o


def test_rows_only_expected_manifest_matches_live_counts(spark):
    """ROWS_ONLY_EXPECTED.json is the falsifiable half of the rows-only
    driver lane (round-9 verdict #2): the five oracle-less queries have
    engine-specific VALUES but deterministic row COUNTS, and
    tools/driver_sim.py asserts equality against this manifest. This
    test pins the manifest to live counts at the oracle SF so it cannot
    drift from the code, and pins its key set to rows_only() exactly."""
    import json

    import __spark_entry__ as entrymod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "ROWS_ONLY_EXPECTED.json")) as f:
        manifest = json.load(f)
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    token = os.path.basename(os.path.normpath(sf_dir))
    if token not in manifest:
        pytest.skip(f"no committed manifest entry for {token}")
    expected = manifest[token]
    assert set(expected) == set(entrymod.rows_only()), (
        "manifest keys must be exactly the rows_only() set"
    )
    qs = entrymod.queries()
    got = {name: qs[name](spark, sf_dir).count() for name in expected}
    assert got == expected


def test_no_shadowed_top_level_definitions():
    """Redefinition gate (round-10 verdict #1): a botched edit once left a
    166-line dead duplicate of PartitionedIncrementalView in
    operators/matview.py — Python silently keeps the LAST definition, so
    a shadowed class/def ships as unreachable code and future edits can
    land in the dead copy. This AST walk asserts no module in the repo
    defines the same top-level name twice (plain ClassDef/FunctionDef at
    module body level; conditional try/except or if/else fallbacks live
    inside compound statements and are not flagged)."""
    import ast
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    files = [repo / "__spark_entry__.py", repo / "bench.py"]
    for root in ("daily_top_songs_etl_spark", "tools", "tests"):
        files += sorted((repo / root).rglob("*.py"))
    offenders = {}
    for path in files:
        seen: dict[str, int] = {}
        dupes = []
        for node in ast.parse(path.read_text()).body:
            if isinstance(
                node, (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
            ):
                if node.name in seen:
                    dupes.append(
                        f"{node.name} (lines {seen[node.name]} and "
                        f"{node.lineno})"
                    )
                seen[node.name] = node.lineno
        if dupes:
            offenders[str(path.relative_to(repo))] = dupes
    assert not offenders, f"shadowed top-level definitions: {offenders}"
