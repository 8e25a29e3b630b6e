from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_lake_for_citi_bike_trip_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_session("tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
