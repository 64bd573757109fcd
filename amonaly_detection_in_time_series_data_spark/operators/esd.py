"""Generalized ESD and Seasonal-Hybrid ESD anomaly detection.

- Generalized Extreme Studentized Deviate test: Rosner, "Percentage
  Points for a Generalized ESD Many-Outlier Procedure", Technometrics
  1983 — the principled answer to "how many 3-sigma points are REAL
  outliers": it tests up to ``max_outliers`` candidates against
  t-distribution critical values, immune to the masking that defeats a
  single Grubbs test.
- Seasonal-Hybrid ESD: Hochenbaum, Vallis & Kejariwal, "Automatic
  Anomaly Detection in the Cloud Via Statistical Learning"
  (arXiv:1704.07706, Twitter's AnomalyDetection) — run GESD on
  seasonally-adjusted residuals with MEDIAN/MAD as the test statistic's
  location/scale (robust to the outliers being hunted). This module
  adjusts with the repo's per-position seasonal-median convention
  (``operators.anomaly.seasonal_decompose`` family) rather than STL;
  documented deviation, same robustness rationale.

No scipy in this environment, so the Student-t quantile is computed
from first principles: the regularized incomplete beta function via
the standard continued-fraction expansion (DLMF §8.17.22 / Didonato &
Morris 1992, evaluated with Lentz's algorithm) and bisection on the
monotone CDF. Pinned against published t-table values in the tests.

Execution: GESD is an iterative whole-series procedure (each removal
changes the next test statistic) — inherently sequential per series,
so numpy inside ONE Arrow-batched ``applyInPandas`` per series group;
``max_outliers`` is a bounded fraction, parallelism = series count.
"""

from __future__ import annotations

import functools
import math
from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["esd_anomalies", "gesd_numpy", "t_ppf", "esd_lambda"]

_MAD_K = 1.4826022185056018  # 1 / Phi^-1(3/4): MAD -> sigma for normal data


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (DLMF 8.17.22),
    evaluated by the modified Lentz method."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 400):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _t_cdf(t: float, nu: float) -> float:
    x = nu / (nu + t * t)
    p = 0.5 * _betainc(nu / 2.0, 0.5, x)
    return 1.0 - p if t >= 0 else p


def t_ppf(p: float, nu: float) -> float:
    """Student-t quantile by bisection on the monotone CDF.

    Accurate to ~1e-10 — pinned against published t-tables in
    tests/test_advanced_anomaly.py.
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"t_ppf: p must be in (0,1), got {p}")
    if nu <= 0:
        raise ValueError(f"t_ppf: dof must be > 0, got {nu}")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -t_ppf(1.0 - p, nu)
    lo, hi = 0.0, 2.0
    while _t_cdf(hi, nu) < p and hi < 1e12:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _t_cdf(mid, nu) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-12 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


@functools.lru_cache(maxsize=65536)
def esd_lambda(n: int, i: int, alpha: float) -> float:
    """Rosner's critical value lambda_i for the i-th GESD test
    (i is 1-based) on n points at significance ``alpha``.

    Memoized (r15): the value depends only on ``(n, i, alpha)`` — never
    on the data — while each evaluation costs a 200-step bisection whose
    every step runs the pure-Python continued-fraction ``_betainc``
    (~1-3 ms). A corpus of same-grid series re-asks the same few
    hundred (n, i) pairs thousands of times: the detector_suite's ESD
    branch at sf0.01 spent ~4.2 s/action in exactly these duplicate
    bisections (measured; ~1.2 s after the memo). The cache lives at
    module level, so a reused Python worker keeps it across tasks; it is
    bounded by the distinct (series_length, rank) pairs seen.
    """
    p = 1.0 - alpha / (2.0 * (n - i + 1))
    nu = n - i - 1
    t = t_ppf(p, nu)
    return (n - i) * t / math.sqrt((nu + t * t) * (n - i + 1))


def gesd_numpy(y, max_outliers, alpha=0.05, hybrid=True):
    """Generalized ESD on a 1-D array. Returns (flags, rank): boolean
    outlier flags and 1-based removal ranks (0 for non-outliers).

    ``hybrid=True`` uses median/MAD as the test statistic's
    location/scale (Hochenbaum et al. 2017); ``False`` is classic
    Rosner mean/sd. Critical values are Rosner's in both modes.
    """
    import numpy as np

    y = np.asarray(y, dtype="float64")
    n = len(y)
    flags = np.zeros(n, dtype=bool)
    rank = np.zeros(n, dtype="int32")
    k = int(max_outliers)
    if k < 1 or n < 4:
        return flags, rank
    k = min(k, n - 3)  # need nu = n-i-1 >= 2 for a meaningful test
    alive = np.ones(n, dtype=bool)
    removed: list[int] = []
    stats: list[float] = []
    for i in range(1, k + 1):
        vals = y[alive]
        if hybrid:
            center = float(np.median(vals))
            spread = float(np.median(np.abs(vals - center))) * _MAD_K
        else:
            center = float(np.mean(vals))
            spread = float(np.std(vals, ddof=1))
        if spread <= 0.0:
            break
        dev = np.abs(y - center)
        dev[~alive] = -np.inf
        j = int(np.argmax(dev))
        stats.append(dev[j] / spread)
        removed.append(j)
        alive[j] = False
    n_out = 0
    for i, r in enumerate(stats, start=1):
        if r > esd_lambda(n, i, alpha):
            n_out = i
    for i in range(n_out):
        flags[removed[i]] = True
        rank[removed[i]] = i + 1
    return flags, rank


def seasonal_resid(y, season_rows: int):
    """The S-H-ESD residual: value minus the per-season-position median
    minus the overall residual median; plain median-centering when the
    series is too short for two full seasons (or ``season_rows`` < 2).
    Shared by :func:`esd_anomalies` and the fused detector-suite kernel
    so both compute bit-identical residuals."""
    import numpy as np

    y = np.asarray(y, dtype="float64")
    n = len(y)
    m = int(season_rows) if season_rows else 0
    if m >= 2 and n >= 2 * m:
        pos = np.arange(n) % m
        seasonal = np.zeros(n)
        for p in range(m):
            seasonal[pos == p] = np.median(y[pos == p])
        resid = y - seasonal
        resid = resid - np.median(resid)
    else:
        resid = y - (np.median(y) if n else 0.0)
    return resid


def esd_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    series_cols: Sequence[str],
    max_anoms: float = 0.05,
    alpha: float = 0.05,
    season_rows: int | None = None,
    hybrid: bool = True,
) -> DataFrame:
    """Per-series (Seasonal-Hybrid) ESD anomalies.

    With ``season_rows`` set, the test runs on seasonally-adjusted
    residuals: value minus the per-season-position median minus the
    series median (the S-H-ESD shape; positions are time-order index
    mod ``season_rows``, so compose after ``resample_grid`` for a
    regular grid). Without it, GESD runs on the raw values.

    Output: keys + ts + value + ``esd_resid`` (the tested residual),
    ``esd_flag`` and ``esd_rank`` (1-based removal order, 0 when not
    anomalous). ``max_anoms`` is the tested fraction (Rosner's upper
    bound on the number of outliers), capped at 49%.
    """
    if not 0.0 < max_anoms <= 0.49:
        raise ValueError(f"esd_anomalies: max_anoms must be in (0, 0.49], got {max_anoms}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"esd_anomalies: alpha must be in (0,1), got {alpha}")
    keys = list(series_cols)
    out_schema = (
        ", ".join(f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys)
        + f", `{ts_col}` {df.schema[ts_col].dataType.simpleString()}"
        + f", `{value_col}` {df.schema[value_col].dataType.simpleString()}"
        + ", esd_resid double, esd_flag boolean, esd_rank int"
    )
    m = int(season_rows) if season_rows else 0

    def detect(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        y = pdf[value_col].to_numpy(dtype="float64")
        if np.isnan(y).any():
            raise ValueError("esd_anomalies: null values in series (fill first)")
        n = len(y)
        resid = seasonal_resid(y, m)
        flags, rank = gesd_numpy(
            resid, max_outliers=int(math.floor(max_anoms * n)), alpha=alpha, hybrid=hybrid
        )
        return pd.DataFrame(
            {
                **{k: pdf[k].to_numpy() for k in keys},
                ts_col: pdf[ts_col].to_numpy(),
                value_col: pdf[value_col].to_numpy(),
                "esd_resid": resid,
                "esd_flag": flags,
                "esd_rank": rank,
            }
        )

    return (
        df.select(*keys, ts_col, value_col)
        .groupBy(*keys)
        .applyInPandas(detect, out_schema)
    )
