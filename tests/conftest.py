from __future__ import annotations

import os

import duckdb
import pytest

from library_data_warehouse_and_business_analytics_system_spark.session import get_spark
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (
    TESTDATA_TABLES,
)

#: Scale factor for differential tests; driver gate runs sf0.01.
TEST_SF = os.environ.get("TEST_SF", "0.001")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", f"/root/testdata/sf{TEST_SF}")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: reference-scale end-to-end runs (scale=1.0)")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written dataset directory (e.g. the scale-up
            # fixtures) — DuckDB needs the part-file glob.
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{path}/*.parquet')")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
