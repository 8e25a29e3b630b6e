"""Oracle output-type lint (driver-hash parity guard).

The driver gate hash-compares Spark and DuckDB result values after a
canonicalization step.  DuckDB widens ``sum(BIGINT)`` to ``HUGEINT``
(int128), which its canonicalizer renders differently than Spark's
BIGINT — round 4 lost four otherwise-correct queries to exactly this
(`CORRECTNESS_r04.json`: moving_average_range, tpch_priority_shipping,
tpch_important_stock, tpch_product_profit).  This lint enforces the
parity rule stated in ``oracles.py``: oracle output columns must stay
within a hash-stable type set.

``DESCRIBE`` only plans the query (no execution), so linting all ~135
oracles is cheap and needs no Spark session.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

# VARCHAR/BIGINT/DOUBLE/BOOLEAN per the oracles.py parity rule; INTEGER
# is additionally allowed because raw parquet int32 passthrough columns
# (l_linenumber, p_size) canonicalize identically to BIGINT as Python
# ints and have green driver rows since round 2.
ALLOWED = {"VARCHAR", "BIGINT", "DOUBLE", "BOOLEAN", "INTEGER"}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_no_oracle_emits_hash_unstable_types(con):
    violations = {}
    oracles = entrymod.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    for name, sql in oracles.items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(col, ty) for col, ty, *_ in desc if ty not in ALLOWED]
        if bad:
            violations[name] = bad
    assert not violations, (
        "oracle columns outside the hash-stable type set "
        f"{sorted(ALLOWED)} — wrap in CAST(... AS BIGINT/DOUBLE/VARCHAR): "
        f"{violations}"
    )
