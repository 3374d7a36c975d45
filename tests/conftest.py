from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daily_top_songs_etl_spark.session import get_spark  # noqa: E402

SEED_DIR = "/root/reference/db/csv"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

# Two-tier suite (round-12 verdict item 1): the DEFAULT run is the fast
# tier — it must finish inside the driver's pytest window with margin
# (the round-11 driver run was cut off at ~94% of the grown suite and
# reported tests_ok=false despite zero failures). Tests carrying
# ``@pytest.mark.slow`` — the randomized hypothesis replay ladders, the
# streaming restart/exactly-once ladders, the exhaustive crash-point
# sweeps, and the long tail of the per-query oracle sweep — are SKIPPED
# unless ``SPARK_GRAFT_SLOW_TESTS=1``. The builder runs the full
# two-tier suite in-session before committing; the driver's unattended
# gate runs the fast tier, which keeps every operator's focused
# correctness tests and a ~70-query oracle core (headline band + every
# face touched in rounds 11-12 + one per family).
RUN_SLOW = bool(os.environ.get("SPARK_GRAFT_SLOW_TESTS"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: slow-tier test, skipped unless SPARK_GRAFT_SLOW_TESTS=1 "
        "(randomized replay ladders, exhaustive crash sweeps, oracle "
        "long tail)",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SPARK_GRAFT_SLOW_TESTS=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def seeded_catalog(spark, tmp_path_factory):
    """Seed corpus replayed into a Parquet catalog once per test session."""
    from daily_top_songs_etl_spark.catalog import Catalog
    from daily_top_songs_etl_spark.sources.csv_seed import bootstrap

    root = str(tmp_path_factory.mktemp("warehouse"))
    cat = Catalog(spark, root)
    bootstrap(spark, SEED_DIR, cat)
    return cat
