from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daily_top_songs_etl_spark.session import get_spark  # noqa: E402

SEED_DIR = "/root/reference/db/csv"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


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
