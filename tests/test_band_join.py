"""band_join (numeric tolerance join via exact integer eps-bucketing):
equality against a Python brute force — including negative values,
bucket-boundary adjacency, the inclusive |diff| == eps edge, exactly-
once pair multiplicity (no dedup needed), and validation.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amonaly_detection_in_time_series_data_spark.operators.relational import (
    band_join,
)


def _brute(lvals, rvals, eps_units):
    out = {}
    for li, lv in lvals:
        for ri, rv in rvals:
            d = abs(round(lv * 100) - round(rv * 100))
            if d <= eps_units:
                out[(li, ri)] = d
    return out


def _run(spark, lvals, rvals, eps):
    l = spark.createDataFrame(lvals, ["lid", "lv"])
    r = spark.createDataFrame(rvals, ["rid", "rv"])
    rows = band_join(
        l, r, "lv", "rv", eps, scale=100,
        left_keep=["lid"], right_keep=["rid"],
    ).collect()
    got = {}
    for row in rows:
        key = (row["l_lid"], row["r_rid"])
        assert key not in got, f"pair {key} emitted twice"
        got[key] = row["abs_diff_units"]
    return got


class TestBandJoin:
    def test_boundary_inclusive_and_cross_bucket(self, spark):
        # eps=0.05 -> eps_units=5; values straddle bucket boundaries
        lvals = [(1, 0.00), (2, 0.04), (3, 0.05), (4, 0.10)]
        rvals = [(10, 0.05), (11, -0.01), (12, 0.11)]
        assert _run(spark, lvals, rvals, 0.05) == _brute(lvals, rvals, 5)

    def test_negative_values(self, spark):
        lvals = [(1, -1.00), (2, -0.97), (3, 0.01)]
        rvals = [(10, -1.02), (11, 0.00)]
        assert _run(spark, lvals, rvals, 0.03) == _brute(lvals, rvals, 3)

    def test_nulls_dropped(self, spark):
        l = spark.createDataFrame(
            [(1, 1.0), (2, None)], "lid int, lv double"
        )
        r = spark.createDataFrame(
            [(10, 1.0), (11, None)], "rid int, rv double"
        )
        rows = band_join(
            l, r, "lv", "rv", 0.01, left_keep=["lid"], right_keep=["rid"]
        ).collect()
        assert {(x["l_lid"], x["r_rid"]) for x in rows} == {(1, 10)}

    def test_invalid_eps_raises(self, spark):
        df = spark.createDataFrame([(1, 1.0)], ["i", "v"])
        with pytest.raises(ValueError):
            band_join(df, df, "v", "v", 0.001, scale=100)
        with pytest.raises(ValueError):
            band_join(df, df, "v", "v", 0.0)

    @settings(max_examples=20, deadline=None)
    @given(
        lv=st.lists(
            st.integers(min_value=-300, max_value=300),
            min_size=1, max_size=15,
        ),
        rv=st.lists(
            st.integers(min_value=-300, max_value=300),
            min_size=1, max_size=15,
        ),
        eps_units=st.sampled_from([1, 5, 7, 100]),
    )
    def test_property_equals_brute_force(self, spark, lv, rv, eps_units):
        lvals = [(i, c / 100.0) for i, c in enumerate(lv)]
        rvals = [(i, c / 100.0) for i, c in enumerate(rv)]
        assert _run(spark, lvals, rvals, eps_units / 100.0) == _brute(
            lvals, rvals, eps_units
        )
