"""pearson_exact (integer-sufficient-statistics correlation): against
numpy corrcoef, perfect/anti/degenerate fixtures, pairwise NULL
exclusion, and partitioning invariance (BIGINT sums are combine-order
proof, so any repartitioning gives the bit-identical double).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from amonaly_detection_in_time_series_data_spark.operators.profiling import (
    pearson_exact,
)

XU = "cast(round(x * 100) as bigint)"
YU = "cast(round(y * 100) as bigint)"


def _run(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "g string, x double, y double")
    if parts:
        df = df.repartition(parts)
    out = pearson_exact(df, ["g"], XU, YU, "r").collect()
    return {r["g"]: r["r"] for r in out}


class TestPearsonExact:
    def test_perfect_and_anti(self, spark):
        rows = [("a", float(i), 2.0 * i + 1) for i in range(5)]
        rows += [("b", float(i), -3.0 * i) for i in range(5)]
        got = _run(spark, rows)
        assert abs(got["a"] - 1.0) < 1e-12
        assert abs(got["b"] + 1.0) < 1e-12

    def test_degenerate_variance_is_null(self, spark):
        rows = [("c", 1.0, float(i)) for i in range(4)]  # x constant
        assert _run(spark, rows) == {"c": None}

    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(5)
        rows = []
        exp = {}
        for g in ("a", "b"):
            x = rng.randint(0, 10000, 30) / 100.0
            y = (x * (3 if g == "a" else -2) * 100
                 + rng.randint(0, 50000, 30)) / 100.0
            rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
            exp[g] = float(np.corrcoef(np.round(x * 100),
                                       np.round(y * 100))[0, 1])
        got = _run(spark, rows)
        for g in exp:
            assert abs(got[g] - exp[g]) < 1e-9

    def test_null_rows_excluded_pairwise(self, spark):
        rows = [("a", float(i), float(i)) for i in range(4)]
        with_nulls = rows + [("a", None, 99.0), ("a", 99.0, None)]
        assert _run(spark, with_nulls) == _run(spark, rows)

    def test_partitioning_invariance_bit_exact(self, spark):
        rng = np.random.RandomState(9)
        rows = [
            ("g", float(a) / 100.0, float(b) / 100.0)
            for a, b in rng.randint(0, 100000, size=(200, 2))
        ]
        r1 = _run(spark, rows, parts=1)["g"]
        r32 = _run(spark, rows, parts=32)["g"]
        assert r1 == r32  # BIT equality, not approx

    @settings(max_examples=15, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.integers(min_value=-5000, max_value=5000),
                st.integers(min_value=-5000, max_value=5000),
            ),
            min_size=2,
            max_size=40,
        )
    )
    def test_property_matches_numpy(self, spark, data):
        rows = [("g", a / 100.0, b / 100.0) for a, b in data]
        got = _run(spark, rows)["g"]
        xs = np.array([a for a, _ in data], dtype=float)
        ys = np.array([b for _, b in data], dtype=float)
        if xs.std() == 0 or ys.std() == 0:
            assert got is None
        else:
            assert abs(got - float(np.corrcoef(xs, ys)[0, 1])) < 1e-9
