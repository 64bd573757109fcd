"""DuckDB-oracle differential tests (SURVEY.md §5.2 item 1) — the same
comparison the driver runs, as a pytest gate. Exact value equality after
normalization; stricter than the driver's hash.

Runs at sf0.001 by default for speed; CI-style full check at sf0.01 via
``SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``
or ``python tools/parity.py``.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tools.parity import compare, duck_connection

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

QUERIES = sorted(entrymod.queries())
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, duck):
    fn = entrymod.queries()[name]
    spdf = fn(spark, SF).toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, deterministic schema, >=0 rows
        assert spdf is not None
        return
    dpdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(spdf, dpdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert "is_anomaly" in df.columns


def test_window_policy_no_oracle_query_outside_driver_window():
    """The driver oracle-checks only the first 50 queries() entries; an
    oracle-backed query drifting past that position would silently lose
    its correctness coverage. Enforced here and in tools/parity.py."""
    from tools.parity import check_window_policy

    violations = check_window_policy(entrymod.queries(), ORACLES)
    assert not violations, violations
