"""Repo-wide plan hygiene: EVERY declared query's physical plan is
swept for the two structural scale-killers —

- ``BatchEvalPython`` (row-at-a-time Python UDF: serializes rows one by
  one through the Python worker; the repo's contract is Arrow-batched
  pandas exchanges only), and
- ``CartesianProduct`` (a non-broadcast cross join: quadratic shuffle
  at any scale; every deliberate crossJoin in the repo broadcasts a
  tiny side, which compiles to BroadcastNestedLoopJoin instead).

The per-operator plan assertions elsewhere pin what individual plans
SHOULD contain; this sweep pins what no plan may EVER contain, so a
future operator cannot quietly regress the discipline. Runs at the
smallest SF — only the plan is inspected; nothing large executes.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERY_NAMES = list(entrymod.queries())


@pytest.fixture(scope="module")
def built_plans(spark, sf_dir):
    """Build each query once, return its physical-plan string.

    Built eagerly in one fixture so iterative queries (KMeans fits,
    training curves) run their driver-side fits once, not per-test.
    """
    qs = entrymod.queries()
    plans = {}
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
    return plans


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_row_at_a_time_python_udf(built_plans, name):
    assert "BatchEvalPython" not in built_plans[name], (
        f"{name}: row-at-a-time Python UDF in the plan"
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_unbroadcast_cartesian_product(built_plans, name):
    assert "CartesianProduct" not in built_plans[name], (
        f"{name}: non-broadcast cartesian product in the plan"
    )
