"""Property-based invariants for the r8 advanced-anomaly kernels —
numpy-level (no Spark session needed, so these run fast and wide):

- PELT: changepoints are invariant under a constant level shift of the
  whole series (the SSE cost only sees deviations from segment means),
  and under scaling both data and penalty consistently (cost scales as
  c², so penalty must too).
- GESD (hybrid): flags are invariant under any affine transform
  a*x + b, a != 0 — median/MAD are affine-equivariant, so the test
  statistic is unchanged.
- Kalman: level/smooth are affine-EQUIVARIANT (filter of a*y + b ==
  a*filter(y) + b when Q, R scale by a²) and the standardized score is
  affine-INVARIANT.
- DTW: d(a, a) == 0, symmetry, non-negativity, and z-norm mode is
  invariant under per-series affine maps with positive scale.
- Matrix profile: z-normalized, so invariant under positive-scale
  affine maps of the whole series.
- POT: the alert level is equivariant under positive affine maps
  (quantiles, excess means/variances all shift/scale accordingly).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amonaly_detection_in_time_series_data_spark.operators.changepoint import pelt_numpy
from amonaly_detection_in_time_series_data_spark.operators.dtw import dtw_numpy
from amonaly_detection_in_time_series_data_spark.operators.esd import gesd_numpy
from amonaly_detection_in_time_series_data_spark.operators.evt import pot_numpy
from amonaly_detection_in_time_series_data_spark.operators.kalman import kalman_numpy
from amonaly_detection_in_time_series_data_spark.operators.matrixprofile import stomp_numpy

PROP = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

FINITE = st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False)
SERIES = st.lists(FINITE, min_size=12, max_size=60)
SCALE = st.floats(min_value=0.1, max_value=10.0, allow_nan=False)
SHIFT = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False)


class TestPeltProperties:
    @PROP
    @given(SERIES, SHIFT)
    def test_shift_invariant(self, vals, b):
        y = np.asarray(vals)
        assert pelt_numpy(y, penalty=5.0) == pelt_numpy(y + b, penalty=5.0)

    @PROP
    @given(SERIES, st.floats(min_value=0.5, max_value=4.0))
    def test_consistent_scaling(self, vals, c):
        y = np.asarray(vals)
        assert pelt_numpy(y, penalty=5.0) == pelt_numpy(c * y, penalty=5.0 * c * c)


class TestGesdProperties:
    # exact-arithmetic affine maps: inputs on a 1/64 grid, scale a power
    # of two, shift a binary fraction — a*x+b is then LOSSLESS in
    # float64, so flag invariance must hold exactly (an arbitrary float
    # map can absorb tiny values, e.g. 1e-45 + 1.0 == 1.0, which
    # genuinely changes the data — not a detector bug)
    GRID = st.lists(
        st.integers(min_value=-6400, max_value=6400).map(lambda i: i / 64.0),
        min_size=12,
        max_size=60,
    )
    POW2 = st.sampled_from([0.25, 0.5, 1.0, 2.0, 8.0, -0.5, -2.0])
    BFRAC = st.integers(min_value=-200, max_value=200).map(lambda i: i / 4.0)

    @PROP
    @given(GRID, POW2, BFRAC)
    def test_affine_invariant_flags(self, vals, a, b):
        y = np.asarray(vals)
        f1, r1 = gesd_numpy(y, max_outliers=4, hybrid=True)
        f2, r2 = gesd_numpy(a * y + b, max_outliers=4, hybrid=True)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(r1, r2)


class TestKalmanProperties:
    @PROP
    @given(SERIES, SCALE, SHIFT)
    def test_affine_equivariance(self, vals, a, b):
        y = np.asarray(vals)
        Q, R = 0.2, 1.0
        base = kalman_numpy(y, q_var=Q, r_var=R)
        moved = kalman_numpy(a * y + b, q_var=Q * a * a, r_var=R * a * a)
        np.testing.assert_allclose(
            moved["level"], a * base["level"] + b, rtol=1e-9, atol=1e-9
        )
        np.testing.assert_allclose(
            moved["smooth"], a * base["smooth"] + b, rtol=1e-9, atol=1e-9
        )
        # standardized innovations are scale/shift free
        np.testing.assert_allclose(
            moved["score"][1:], base["score"][1:], rtol=1e-9, atol=1e-9
        )


class TestDtwProperties:
    @PROP
    @given(SERIES, SERIES)
    def test_metric_basics(self, a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert dtw_numpy(a, a, znorm=False) == pytest.approx(0.0, abs=1e-9)
        d_ab = dtw_numpy(a, b, znorm=False)
        assert d_ab >= 0.0
        assert d_ab == pytest.approx(dtw_numpy(b, a, znorm=False), rel=1e-9, abs=1e-9)

    @PROP
    @given(SERIES, SERIES, SCALE, SHIFT)
    def test_znorm_affine_invariant(self, a, b, c, s):
        a, b = np.asarray(a), np.asarray(b)
        d1 = dtw_numpy(a, b, znorm=True)
        d2 = dtw_numpy(c * a + s, b, znorm=True)
        assert d1 == pytest.approx(d2, rel=1e-6, abs=1e-6)


class TestStompProperties:
    # lossless affine maps (see TestGesdProperties): grid inputs, power-
    # of-two scale, binary-fraction shift — flat windows stay EXACTLY
    # flat after the map, so the kernel's exact ptp-based flatness test
    # must classify identically and the z-normalized profile is equal up
    # to FFT rounding
    GRID = st.lists(
        st.integers(min_value=-6400, max_value=6400).map(lambda i: i / 64.0),
        min_size=20,
        max_size=60,
    )
    POW2 = st.sampled_from([0.25, 0.5, 1.0, 2.0, 8.0])
    BFRAC = st.integers(min_value=-200, max_value=200).map(lambda i: i / 4.0)

    @PROP
    @given(GRID, POW2, BFRAC)
    def test_affine_invariant(self, vals, a, b):
        y = np.asarray(vals)
        mp1, _ = stomp_numpy(y, 4)
        mp2, _ = stomp_numpy(a * y + b, 4)
        np.testing.assert_allclose(mp1, mp2, rtol=1e-5, atol=1e-6)


class TestPotProperties:
    @PROP
    @given(st.integers(min_value=0, max_value=2**31 - 1), SCALE, SHIFT)
    def test_affine_equivariance(self, seed, a, b):
        rng = np.random.default_rng(seed)
        y = rng.lognormal(0, 0.7, 4000)
        t1, z1, *_ = pot_numpy(y, q=1e-3)
        t2, z2, *_ = pot_numpy(a * y + b, q=1e-3)
        assert t2 == pytest.approx(a * t1 + b, rel=1e-9)
        assert z2 == pytest.approx(a * z1 + b, rel=1e-7)
