from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402

TESTDATA_SF_SMALL = "/root/testdata/sf0.001"
TESTDATA_SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # static conf: catalog tables (bucketing tests) land in a
            # throwaway dir instead of ./spark-warehouse
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return TESTDATA_SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return TESTDATA_SF_ORACLE
