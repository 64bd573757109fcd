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


class TestComposedTimeseriesLineage:
    """The deployment shape for the detector side: features -> battery
    -> flags composed in ONE lazy lineage must pay the (user_id, ts)
    window exchange ONCE — the architectural claim (SURVEY §3.1 "thread
    boundaries become shuffles, and the same key shares them") asserted
    on the actual physical plan."""

    def test_feature_battery_chain_shares_one_window_exchange(
        self, spark, sf_dir
    ):
        from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
            ewma_deviation,
            page_hinkley,
            rolling_zscore,
        )
        from amonaly_detection_in_time_series_data_spark.operators.features import (
            add_lag_features,
            add_rolling_features,
        )
        from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

        ev = load_table(spark, sf_dir, "events")
        keys, order = ["user_id"], ["ts", "event_id"]
        d = add_lag_features(ev, "value", [1, 2, 3], keys, order)
        d = add_rolling_features(d, "value", [3, 12], ["mean", "std"], keys, order)
        d = rolling_zscore(d, "value", 24, keys, order, threshold=3.0)
        d = page_hinkley(d, "value", keys, order, unit_digits=2)
        d = ewma_deviation(d, "value", 8, keys, order, alpha=0.5)
        plan = d._jdf.queryExecution().executedPlan().toString()
        # Catalyst stacks frame-incompatible window groups as separate
        # Window operators, but they all ride ONE hash exchange and ONE
        # sort — the data is shuffled and ordered exactly once for the
        # whole feature+detector chain. That (not operator count) is
        # the architectural claim.
        import re

        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert len(re.findall(r"\bSort \[", plan)) == 1, plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
