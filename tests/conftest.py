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
    _gc_own_warehouse_dirs(spark)


def _gc_own_warehouse_dirs(spark) -> None:
    """Session teardown GC (VERDICT r14 item 2): the bucketed-table
    tests write per-process ``<name>__<app_tag>`` directories and plant
    fake-sibling probe dirs in the persistent repo spark-warehouse;
    without cleanup the warehouse accumulated 92 dirs across sessions
    and planted probes aged into >24h time-bombs for later sweeps.
    Remove this process's own dirs plus the test-planted probe names.
    The shared ``partsupp_*`` canonical dirs are the intentional
    cross-process reuse cache and must survive."""
    import os
    import shutil
    from urllib.parse import urlparse

    try:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        app_tag = "".join(
            c if c.isalnum() else "_"
            for c in spark.sparkContext.applicationId
        )
    except Exception:
        return
    if not wh or not os.path.isdir(wh):
        return
    planted = ("sweep_probe__", "sweep_lifecycle__")
    for entry in os.listdir(wh):
        own = entry.endswith(f"__{app_tag}")
        if not (own or entry.startswith(planted)):
            continue
        try:
            shutil.rmtree(os.path.join(wh, entry), ignore_errors=True)
        except OSError:
            pass


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture
def session_clone(spark):
    """A ``newSession()`` clone that cannot poison later tests.

    PySpark's ``createDataFrame`` pins its receiver as the ACTIVE session
    and never restores it; Python data-source lookup goes through the
    active session's per-session manager. A clone test that ran
    ``createDataFrame`` therefore used to redirect every later
    ``format("jsondir")`` lookup to the clone's empty manager
    (DATA_SOURCE_NOT_FOUND in an unrelated test). Teardown re-pins the
    shared session so no clone test can invalidate a later sweep.
    """
    from data_lake_for_citi_bike_trip_spark.session import ensure_active

    clone = spark.newSession()
    yield clone
    ensure_active(spark)
