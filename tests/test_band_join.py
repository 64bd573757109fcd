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


class TestMaxBandSize:
    """The mega-band cap: right-side buckets above the cap are dropped
    entirely; surviving pairs are byte-identical to brute force on the
    surviving right rows."""

    def test_cap_binds_and_rest_matches_brute_force(self, spark):
        # 300 right rows all at 1.00 (one mega eps-bucket), plus normal
        # rows far away from it
        mega = [(1000 + i, 1.00) for i in range(300)]
        normal = [(10, 50.00), (11, 50.02), (12, 50.10)]
        lvals = [(1, 1.01), (2, 50.01), (3, 50.08)]
        l = spark.createDataFrame(lvals, ["lid", "lv"])
        r = spark.createDataFrame(mega + normal, ["rid", "rv"])
        pairs, excluded = band_join(
            l, r, "lv", "rv", 0.05, scale=100,
            left_keep=["lid"], right_keep=["rid"],
            max_band_size=50, return_excluded=True,
        )
        ex = excluded.collect()
        assert len(ex) == 1 and ex[0]["band_size"] == 300
        got = {
            (row["l_lid"], row["r_rid"]): row["abs_diff_units"]
            for row in pairs.collect()
        }
        assert got == _brute(lvals, normal, 5)

    def test_cap_not_binding_is_identity(self, spark):
        lvals = [(1, 0.00), (2, 0.04)]
        rvals = [(10, 0.05), (11, -0.01)]
        l = spark.createDataFrame(lvals, ["lid", "lv"])
        r = spark.createDataFrame(rvals, ["rid", "rv"])
        pairs, excluded = band_join(
            l, r, "lv", "rv", 0.05, scale=100,
            left_keep=["lid"], right_keep=["rid"],
            max_band_size=1000, return_excluded=True,
        )
        assert excluded.count() == 0
        got = {
            (row["l_lid"], row["r_rid"]): row["abs_diff_units"]
            for row in pairs.collect()
        }
        assert got == _brute(lvals, rvals, 5)

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1.0)], ["i", "v"])
        with pytest.raises(ValueError):
            band_join(df, df, "v", "v", 0.05, return_excluded=True)
        with pytest.raises(ValueError):
            band_join(df, df, "v", "v", 0.05, max_band_size=0)


class TestHugeUnitsExactBucketing:
    """Bucket ids are computed with exact bigint floor division — for
    units far beyond 2^53 (where double division mis-buckets), pairs
    within eps are still found. LongType inputs with scale=1 keep the
    unit arithmetic exact end-to-end."""

    def test_pairs_near_2_pow_62(self, spark):
        base = 1 << 62
        lvals = [(1, base + 7), (2, base - 10_000)]
        rvals = [(10, base + 9), (11, base - 10_003), (12, base + 5_000)]
        l = spark.createDataFrame(lvals, "lid int, lv long")
        r = spark.createDataFrame(rvals, "rid int, rv long")
        rows = band_join(
            l, r, "lv", "rv", 7, scale=1,
            left_keep=["lid"], right_keep=["rid"],
        ).collect()
        got = {(row["l_lid"], row["r_rid"]): row["abs_diff_units"] for row in rows}
        expect = {}
        for li, lv in lvals:
            for ri, rv in rvals:
                if abs(lv - rv) <= 7:
                    expect[(li, ri)] = abs(lv - rv)
        assert got == expect
