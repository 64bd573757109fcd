"""pandas-differential unit tests (SURVEY.md §5.2 item 2).

Tiny in-memory fixtures are pushed through BOTH the re-implemented
reference semantics (pandas, exactly as the reference's code does it) and
the engine's Spark operator; outputs must agree including null placement
at frame edges. Fixture specs from FIXTURES.md §5.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.features import (
    add_lag_features,
    add_rolling_features,
)
from amonaly_detection_in_time_series_data_spark.operators.missing import bfill, ffill, fill_zero
from amonaly_detection_in_time_series_data_spark.operators.dedup import (
    dedup_keep_positional,
    dedup_mean,
)
from amonaly_detection_in_time_series_data_spark.operators.scaling import minmax_scale
from amonaly_detection_in_time_series_data_spark.operators.sequences import create_sequences
from amonaly_detection_in_time_series_data_spark.functions.timefeat import add_time_features


def _series_df(spark, values):
    rows = [
        (0, i, (pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)).to_pydatetime(), v)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "sid int, pos int, ts timestamp, value double")


def _sorted_col(df, col):
    return [r[col] for r in df.orderBy("pos").collect()]


def _assert_close(actual, expected):
    assert len(actual) == len(expected)
    for a, e in zip(actual, expected):
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert a is None or (isinstance(a, float) and math.isnan(a)), (a, e)
        else:
            assert a == pytest.approx(e, rel=1e-9), (a, e)


class TestRollingEdges:
    """FIXTURES.md roll_edges: [10,20,30,40,50], w=3, past-only frame.

    Reference semantics: shift(1).rolling(3, min_periods=1) — verified
    mean [NaN,10,15,20,30]; sample-std [NaN,NaN,7.0711,10,10]
    (reference src/preprocessing.py:255-256).
    """

    def test_mean_std_edges(self, spark):
        df = _series_df(spark, [10.0, 20.0, 30.0, 40.0, 50.0])
        out = add_rolling_features(
            df, "value", [3], ["mean", "std"], ["sid"], ["ts", "pos"]
        )
        _assert_close(
            _sorted_col(out, "value_roll_mean_3h"), [None, 10.0, 15.0, 20.0, 30.0]
        )
        stds = _sorted_col(out, "value_roll_std_3h")
        _assert_close(stds[:2], [None, None])
        assert stds[2] == pytest.approx(7.0710678, rel=1e-6)
        assert stds[3] == pytest.approx(10.0)
        assert stds[4] == pytest.approx(10.0)

    def test_pandas_differential_random(self, spark):
        rng = np.random.RandomState(7)
        vals = rng.uniform(0, 100, 40).round(2)
        pdf = pd.Series(vals)
        for w in (3, 5, 24):
            expected_mean = pdf.shift(1).rolling(w, min_periods=1).mean()
            expected_std = pdf.shift(1).rolling(w, min_periods=1).std()
            df = _series_df(spark, [float(v) for v in vals])
            out = add_rolling_features(
                df, "value", [w], ["mean", "std"], ["sid"], ["ts", "pos"]
            )
            _assert_close(
                _sorted_col(out, f"value_roll_mean_{w}h"),
                [None if math.isnan(x) else x for x in expected_mean],
            )
            _assert_close(
                _sorted_col(out, f"value_roll_std_{w}h"),
                [None if math.isnan(x) else x for x in expected_std],
            )


class TestLagEdges:
    def test_lag_nulls_and_values(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 5.0]
        df = _series_df(spark, vals)
        out = add_lag_features(df, "value", [1, 3, 168], ["sid"], ["ts", "pos"])
        _assert_close(_sorted_col(out, "value_lag_1"), [None, 1.0, 2.0, 3.0, 4.0])
        _assert_close(_sorted_col(out, "value_lag_3"), [None, None, None, 1.0, 2.0])
        # lag > n => all null (reference shift semantics)
        _assert_close(_sorted_col(out, "value_lag_168"), [None] * 5)

    def test_nonpositive_lags_skipped(self, spark):
        df = _series_df(spark, [1.0, 2.0])
        out = add_lag_features(df, "value", [0, -1, 1], ["sid"], ["ts", "pos"])
        assert "value_lag_0" not in out.columns
        assert "value_lag_-1" not in out.columns
        assert "value_lag_1" in out.columns


class TestTimeFeatures:
    """FIXTURES.md dow_map: pandas dayofweek (Mon=0) parity + ISO week."""

    def test_dayofweek_offset_table(self, spark):
        # one timestamp per weekday, plus ISO-week edge dates
        stamps = pd.date_range("2024-01-01", periods=7, freq="D").tolist()
        stamps += [pd.Timestamp("2016-01-01"), pd.Timestamp("2021-01-04")]
        rows = [(i, i, t.to_pydatetime(), 0.0) for i, t in enumerate(stamps)]
        df = spark.createDataFrame(rows, "sid int, pos int, ts timestamp, value double")
        out = add_time_features(df, "ts").orderBy("pos").collect()
        for row, t in zip(out, stamps):
            assert row["dayofweek"] == t.dayofweek, t
            assert row["is_weekend"] == int(t.dayofweek >= 5), t
            assert row["weekofyear"] == t.isocalendar()[1], t
            assert row["hour"] == t.hour
            assert row["dayofyear"] == t.dayofyear
            assert row["quarter"] == t.quarter


class TestFfillEdges:
    """FIXTURES.md ffill_edges: [null,1,null,2] -> ffill [null,1,1,2] ->
    residual fill-0 [0,1,1,2] (reference src/preprocessing.py:170-171)."""

    def test_ffill_then_zero(self, spark):
        df = _series_df(spark, [None, 1.0, None, 2.0])
        out = ffill(df, ["value"], ["sid"], ["ts", "pos"])
        _assert_close(_sorted_col(out, "value"), [None, 1.0, 1.0, 2.0])
        out0 = fill_zero(out, ["value"])
        _assert_close(_sorted_col(out0, "value"), [0.0, 1.0, 1.0, 2.0])

    def test_bfill(self, spark):
        df = _series_df(spark, [None, 1.0, None, 2.0, None])
        out = bfill(df, ["value"], ["sid"], ["ts", "pos"])
        _assert_close(_sorted_col(out, "value"), [1.0, 1.0, 2.0, 2.0, None])

    def test_fill_with_strategies_single_aggregate(self, spark):
        """Multi-column mean/median fill == per-column fill_with_global,
        with exactly ONE aggregate in the plan."""
        from amonaly_detection_in_time_series_data_spark.operators.missing import (
            fill_with_global,
            fill_with_strategies,
        )

        df = _series_df(spark, [None, 1.0, 4.0, 2.0, None]).select(
            "sid", "ts", "pos",
            F.col("value").alias("a"), F.col("value").alias("b"),
        )
        got = fill_with_strategies(df, {"a": "mean", "b": "median"})
        want = fill_with_global(
            fill_with_global(df, ["a"], strategy="mean"), ["b"], strategy="median"
        )
        _assert_close(_sorted_col(got, "a"), _sorted_col(want, "a"))
        _assert_close(_sorted_col(got, "b"), _sorted_col(want, "b"))
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") <= 2  # partial + final of ONE agg


class TestDedup:
    def test_keep_first_is_file_order(self, spark):
        # FIXTURES.md: two rows same ts, values 1 then 2 in arrival order
        # -> keep-first keeps 1 even though value 2 has a "smaller" value
        rows = [
            (0, pd.Timestamp("2024-01-01 00:00").to_pydatetime(), 1.0),
            (1, pd.Timestamp("2024-01-01 00:00").to_pydatetime(), 2.0),
            (2, pd.Timestamp("2024-01-01 01:00").to_pydatetime(), 9.0),
        ]
        df = spark.createDataFrame(rows, "arrival long, ts timestamp, value double")
        out = dedup_keep_positional(df, ["ts"], "arrival").orderBy("ts").collect()
        assert [r["value"] for r in out] == [1.0, 9.0]
        out_last = (
            dedup_keep_positional(df, ["ts"], "arrival", keep="last")
            .orderBy("ts")
            .collect()
        )
        assert [r["value"] for r in out_last] == [2.0, 9.0]

    def test_dedup_mean_numeric_and_first_nonnull(self, spark):
        rows = [
            (0, pd.Timestamp("2024-01-01").to_pydatetime(), 1.0, None),
            (1, pd.Timestamp("2024-01-01").to_pydatetime(), 2.0, "a"),
            (2, pd.Timestamp("2024-01-02").to_pydatetime(), 5.0, "b"),
        ]
        df = spark.createDataFrame(
            rows, "arrival long, ts timestamp, value double, tag string"
        )
        out = dedup_mean(df, ["ts"], arrival_col="arrival").orderBy("ts").collect()
        assert out[0]["value"] == pytest.approx(1.5)
        # pandas groupby.first() takes the first NON-NULL -> 'a'
        assert out[0]["tag"] == "a"
        assert out[1]["value"] == 5.0


class TestScaleEdges:
    """FIXTURES.md scale_edges: constant column -> 0.0; outputs in [0,1]."""

    def test_constant_and_range(self, spark):
        rows = [(i, float(i * 10), 7.0) for i in range(5)]
        df = spark.createDataFrame(rows, "pos int, a double, c double")
        out = minmax_scale(df, ["a", "c"]).orderBy("pos").collect()
        a = [r["a"] for r in out]
        assert a[0] == 0.0 and a[-1] == 1.0
        assert all(0.0 <= x <= 1.0 for x in a)
        assert all(r["c"] == 0.0 for r in out)


class TestSequences:
    """FIXTURES.md seq_count: count = max(0, n-L+1), contiguous stride 1."""

    def test_counts_and_content(self, spark):
        n, L = 30, 24
        df = _series_df(spark, [float(i) for i in range(n)])
        out = create_sequences(df, ["value"], L, ["sid"], ["ts", "pos"])
        rows = out.orderBy("seq_start_ts").collect()
        assert len(rows) == n - L + 1
        first = [step[0] for step in rows[0]["seq"]]
        assert first == [float(i) for i in range(L)]
        last = [step[0] for step in rows[-1]["seq"]]
        assert last == [float(i) for i in range(n - L, n)]

    def test_short_series_empty(self, spark):
        df = _series_df(spark, [1.0, 2.0])
        out = create_sequences(df, ["value"], 24, ["sid"], ["ts", "pos"])
        assert out.count() == 0


class TestFillInterpolate:
    """M9 linear interpolation (operators.missing.fill_interpolate) vs
    pandas interpolate on interior points; edge/degenerate contracts."""

    def test_interior_matches_pandas_position_mode(self, spark):
        import numpy as np
        import pandas as pd

        from amonaly_detection_in_time_series_data_spark.operators.missing import (
            fill_interpolate,
        )

        vals = [1.0, None, None, 4.0, 5.0, None, 7.0]
        rows = [("s", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "sid string, t int, v double")
        out = {
            r.t: r.v
            for r in fill_interpolate(df, ["v"], ["sid"], ["t"]).collect()
        }
        want = pd.Series(vals, dtype="float64").interpolate(
            method="linear", limit_area="inside"
        )
        for i, w in enumerate(want):
            if np.isnan(w):
                assert out[i] is None
            else:
                assert out[i] == pytest.approx(w, abs=1e-12)

    def test_time_weighted_on_irregular_grid(self, spark):
        import datetime

        from amonaly_detection_in_time_series_data_spark.operators.missing import (
            fill_interpolate,
        )

        t0 = datetime.datetime(2024, 1, 1)
        # bounds at t=0h (v=0) and t=10h (v=10); null at t=1h -> 1.0 by
        # time weighting (position weighting would give 5.0)
        rows = [
            ("s", t0, 0.0),
            ("s", t0 + datetime.timedelta(hours=1), None),
            ("s", t0 + datetime.timedelta(hours=10), 10.0),
        ]
        df = spark.createDataFrame(rows, "sid string, ts timestamp, v double")
        out = {
            r.ts: r.v
            for r in fill_interpolate(
                df, ["v"], ["sid"], ["ts"], ts_col="ts"
            ).collect()
        }
        assert out[t0 + datetime.timedelta(hours=1)] == pytest.approx(1.0)

    def test_edges_stay_null_and_duplicate_x_safe(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.missing import (
            fill_interpolate,
        )

        rows = [("s", 0, None), ("s", 1, 2.0), ("s", 2, None)]
        df = spark.createDataFrame(rows, "sid string, t int, v double")
        out = {r.t: r.v for r in fill_interpolate(df, ["v"], ["sid"], ["t"]).collect()}
        assert out[0] is None and out[2] is None  # no extrapolation
        # duplicate x positions around a null: division guarded to NULL
        rows2 = [("s", 5, 1.0), ("s", 5, None), ("s", 5, 3.0)]
        df2 = spark.createDataFrame(rows2, "sid string, t int, v double")
        got = fill_interpolate(df2, ["v"], ["sid"], ["t"], ts_col="t").collect()
        assert sum(1 for r in got if r.v is None) == 1

    def test_single_exchange(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.missing import (
            fill_interpolate,
        )

        rows = [("s", i, float(i) if i % 3 else None) for i in range(20)]
        df = spark.createDataFrame(rows, "sid string, t int, v double")
        plan = (
            fill_interpolate(df, ["v"], ["sid"], ["t"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan
