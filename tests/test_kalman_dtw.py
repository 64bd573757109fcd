"""Kalman local-level filter/smoother and DTW matching: independent
recursion/DP references, model properties, and Spark-vs-kernel parity."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from amonaly_detection_in_time_series_data_spark.operators.dtw import (
    dtw_match,
    dtw_numpy,
)
from amonaly_detection_in_time_series_data_spark.operators.kalman import (
    kalman_level,
    kalman_numpy,
)


def _series_df(spark, values_by_key, start="2024-01-01", step_s=60):
    rows = []
    t0 = dt.datetime.fromisoformat(start)
    for key, vals in values_by_key.items():
        for i, v in enumerate(vals):
            rows.append((key, t0 + dt.timedelta(seconds=i * step_s), float(v)))
    return spark.createDataFrame(rows, "user_id string, ts timestamp, value double")


def _ref_kalman(y, Q, R):
    """Independent textbook recursion (Durbin-Koopman §2.2 written
    directly, scalar form), including the RTS smoother."""
    n = len(y)
    a = [y[0]]
    P = [R]
    pred, Pp, innov, Fv = [np.nan], [np.nan], [np.nan], [np.nan]
    for t in range(1, n):
        ap, pp = a[-1], P[-1] + Q
        F_t = pp + R
        v = y[t] - ap
        K = pp / F_t
        a.append(ap + K * v)
        P.append(pp * (1 - K))
        pred.append(ap)
        Pp.append(pp)
        innov.append(v)
        Fv.append(F_t)
    sm = [0.0] * n
    sm[-1] = a[-1]
    for t in range(n - 2, -1, -1):
        C = P[t] / Pp[t + 1]
        sm[t] = a[t] + C * (sm[t + 1] - pred[t + 1])
    return np.array(a), np.array(pred), np.array(innov), np.array(Fv), np.array(sm)


class TestKalman:
    def test_matches_independent_recursion(self):
        rng = np.random.default_rng(51)
        y = np.cumsum(rng.normal(0, 0.3, 50)) + rng.normal(0, 1.0, 50)
        Q, R = 0.09, 1.0
        out = kalman_numpy(y, q_var=Q, r_var=R)
        a, pred, innov, Fv, sm = _ref_kalman(y, Q, R)
        np.testing.assert_allclose(out["level"], a, rtol=1e-12)
        np.testing.assert_allclose(out["pred"][1:], pred[1:], rtol=1e-12)
        np.testing.assert_allclose(out["innov"][1:], innov[1:], rtol=1e-12)
        np.testing.assert_allclose(out["innov_var"][1:], Fv[1:], rtol=1e-12)
        np.testing.assert_allclose(out["smooth"], sm, rtol=1e-12)

    def test_constant_series_tracked_exactly(self):
        out = kalman_numpy(np.full(40, 7.5), q_var=0.1, r_var=1.0)
        np.testing.assert_allclose(out["level"], 7.5, atol=1e-12)
        np.testing.assert_allclose(out["smooth"], 7.5, atol=1e-12)
        np.testing.assert_allclose(out["innov"][1:], 0.0, atol=1e-12)

    def test_gain_reaches_steady_state(self):
        # for fixed Q,R the predicted variance converges to the Riccati
        # fixed point: P* = (Q + sqrt(Q^2 + 4QR)) / 2
        Q, R = 0.04, 1.0
        out = kalman_numpy(np.zeros(500), q_var=Q, r_var=R)
        p_star = (Q + math.sqrt(Q * Q + 4 * Q * R)) / 2
        assert out["innov_var"][-1] == pytest.approx(p_star + R, rel=1e-6)

    def test_score_normal_under_model_and_spike_flagged(self):
        rng = np.random.default_rng(52)
        Q, R = 0.01, 1.0
        level = np.cumsum(rng.normal(0, math.sqrt(Q), 2000))
        y = level + rng.normal(0, math.sqrt(R), 2000)
        y[1500] += 10.0
        out = kalman_numpy(y, q_var=Q, r_var=R)
        s = out["score"][1:]
        # correctly-specified model -> standardized innovations ~ N(0,1)
        inliers = np.delete(s, [1499, 1500])
        assert abs(np.nanstd(inliers) - 1.0) < 0.08
        assert abs(out["score"][1500]) > 5.0

    def test_level_shift_adapts(self):
        y = np.concatenate([np.zeros(100), np.full(100, 5.0)])
        out = kalman_numpy(y, q_var=0.1, r_var=1.0)
        # the shift point is a surprise...
        assert abs(out["score"][100]) > 3.0
        # ...but the level re-converges, unlike a fixed-mean z-score
        assert abs(out["level"][-1] - 5.0) < 0.05
        assert abs(out["score"][-1]) < 1.0

    def test_smoother_beats_filter_on_noise(self):
        rng = np.random.default_rng(53)
        truth = np.cumsum(rng.normal(0, 0.1, 400))
        y = truth + rng.normal(0, 1.0, 400)
        out = kalman_numpy(y, q_var=0.01, r_var=1.0)
        mse_f = np.mean((out["level"] - truth) ** 2)
        mse_s = np.mean((out["smooth"] - truth) ** 2)
        assert mse_s < mse_f

    def test_spark_matches_kernel(self, spark):
        rng = np.random.default_rng(54)
        ya = np.cumsum(rng.normal(size=120))
        yb = rng.normal(size=80)
        df = _series_df(spark, {"a": ya, "b": yb})
        out = kalman_level(df, "ts", "value", ["user_id"], q_var=0.05, r_var=1.0)
        pdf = out.toPandas()
        a = pdf[pdf.user_id == "a"].sort_values("ts").reset_index(drop=True)
        ref = kalman_numpy(ya, q_var=0.05, r_var=1.0)
        np.testing.assert_allclose(a["kf_level"], ref["level"], rtol=1e-12)
        np.testing.assert_allclose(a["kf_smooth"], ref["smooth"], rtol=1e-12)
        np.testing.assert_allclose(
            a["kf_score"][1:].astype(float), ref["score"][1:], rtol=1e-12
        )
        assert pd.isna(a.loc[0, "kf_flag"])  # diffuse first row
        assert len(pdf) == 200


def _full_dtw_ref(a, b):
    """Unbanded quadratic reference DP (squared local cost)."""
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
    return math.sqrt(D[n, m])


class TestDTW:
    def test_identity_zero_and_symmetry(self):
        rng = np.random.default_rng(61)
        a = rng.normal(size=50)
        b = rng.normal(size=60)
        assert dtw_numpy(a, a, znorm=False) == pytest.approx(0.0, abs=1e-12)
        assert dtw_numpy(a, b, znorm=False) == pytest.approx(
            dtw_numpy(b, a, znorm=False), rel=1e-12
        )

    def test_hand_fixture(self):
        # classic example: same shape, shifted by one step
        a = [0.0, 0.0, 1.0, 2.0, 1.0, 0.0]
        b = [0.0, 1.0, 2.0, 1.0, 0.0, 0.0]
        assert dtw_numpy(a, b, znorm=False) == pytest.approx(0.0, abs=1e-12)
        # and a genuinely different pair, hand-computable: the diagonal
        # path aligns 0-2 and 1-3 -> cost (0-2)^2 + (1-3)^2 = 8
        assert dtw_numpy([0.0, 1.0], [2.0, 3.0], znorm=False) == pytest.approx(
            math.sqrt(8), rel=1e-12
        )

    def test_unbanded_matches_reference_dp(self):
        rng = np.random.default_rng(62)
        for _ in range(5):
            a = rng.normal(size=int(rng.integers(5, 40)))
            b = rng.normal(size=int(rng.integers(5, 40)))
            assert dtw_numpy(a, b, band=None, znorm=False) == pytest.approx(
                _full_dtw_ref(a, b), rel=1e-10
            )

    def test_band_upper_bounds_and_converges(self):
        rng = np.random.default_rng(63)
        a = rng.normal(size=60)
        b = rng.normal(size=60)
        full = dtw_numpy(a, b, band=None, znorm=False)
        prev = np.inf
        for w in (1, 2, 4, 8, 16, 60):
            d = dtw_numpy(a, b, band=w, znorm=False)
            assert d >= full - 1e-12
            assert d <= prev + 1e-12  # widening the band never hurts
            prev = d
        assert dtw_numpy(a, b, band=60, znorm=False) == pytest.approx(full, rel=1e-12)

    def test_shift_invariance_vs_euclidean(self):
        t = np.arange(120)
        a = np.sin(t * 0.2)
        b = np.sin((t - 6) * 0.2)  # time-shifted copy
        eu = math.sqrt(float(((a - b) ** 2).sum()))
        d = dtw_numpy(a, b, band=10, znorm=False)
        # warping absorbs the shift everywhere except the unalignable
        # 6-point boundary, cutting the distance to ~1/5 of Euclidean
        assert d < 0.25 * eu

    def test_spark_match_and_best(self, spark):
        t = np.arange(100)
        sine = np.sin(t * 0.2)
        square = np.sign(np.sin(t * 0.2)) * 1.0
        ramp = (t % 25) / 25.0
        refs = _series_df(
            spark, {"sine": sine, "square": square, "ramp": ramp}
        ).withColumnRenamed("user_id", "ref_name")
        rng = np.random.default_rng(64)
        series = {
            "s1": np.sin((t - 4) * 0.2) * 3 + 1 + rng.normal(0, 0.05, 100),
            "s2": np.sign(np.sin((t - 2) * 0.2)) + rng.normal(0, 0.05, 100),
            "s3": ((t + 7) % 25) / 25.0 + rng.normal(0, 0.05, 100),
        }
        df = _series_df(spark, series)
        out = dtw_match(
            df, "ts", "value", ["user_id"], refs, "ref_name", band=12
        ).toPandas()
        assert len(out) == 9
        best = out[out.is_best].set_index("user_id")["ref"].to_dict()
        assert best == {"s1": "sine", "s2": "square", "s3": "ramp"}
        # parity with the kernel for one pair
        got = out[(out.user_id == "s1") & (out.ref == "sine")]["dtw_dist"].iloc[0]
        ref_d = dtw_numpy(series["s1"], sine, band=12, znorm=True)
        assert got == pytest.approx(ref_d, rel=1e-12)

    def test_max_refs_guard(self, spark):
        refs = _series_df(spark, {f"r{i}": [1.0, 2.0, 3.0] for i in range(5)})
        df = _series_df(spark, {"s": [1.0, 2.0, 3.0]})
        with pytest.raises(ValueError, match="max_refs"):
            dtw_match(df, "ts", "value", ["user_id"], refs, "user_id", max_refs=3)
