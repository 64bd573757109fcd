"""Kalman local-level filter + RTS smoother with innovation anomaly
flags.

The local level (random-walk-plus-noise) state-space model — Harvey,
"Forecasting, Structural Time Series Models and the Kalman Filter"
(1989) ch. 2; Durbin & Koopman, "Time Series Analysis by State Space
Methods" §2.2:

    y_t = mu_t + eps_t,   eps ~ N(0, R)
    mu_t = mu_{t-1} + eta_t,  eta ~ N(0, Q)

The filter yields, per row, the one-step prediction, the filtered
level, the innovation v_t = y_t - pred_t and its variance F_t; the
standardized innovation v_t / sqrt(F_t) is the classic model-based
anomaly score (a correctly-specified model makes it ~N(0,1), so |.|>3
flags genuine surprises while the adaptive level absorbs drift that
would page a fixed-mean z-score forever). The backward
Rauch-Tung-Striebel pass adds the smoothed level — the best in-sample
denoising the model supports.

Defaults: R from the Hall difference estimator ``mean(diff(y)^2)/2``
(robust to the level shifts being tracked), Q = ``snr * R`` with
``snr`` the signal-to-noise ratio knob (Durbin-Koopman's q).
Initialization is the standard exact-diffuse step: the first
observation initializes the level (its innovation/score are null).

Execution: the recursion is sequential per series — numpy inside ONE
Arrow-batched ``applyInPandas`` per series group; O(1) state per
series for the filter, O(n) for the smoother's stored gains.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["kalman_level", "kalman_numpy"]


def kalman_numpy(y, q_var=None, r_var=None, snr=0.01):
    """Filter + RTS smoother for a 1-D series. Returns a dict of
    arrays: pred, level, innov, innov_var, score, smooth. Exposed so
    tests can pin the Spark operator bit-for-bit."""
    import numpy as np

    y = np.asarray(y, dtype="float64")
    n = len(y)
    out = {
        k: np.full(n, np.nan)
        for k in ("pred", "level", "innov", "innov_var", "score", "smooth")
    }
    if n == 0:
        return out
    if r_var is None:
        if n >= 3:
            d = np.diff(y)
            r_var = float(np.mean(d * d) / 2.0)
        else:
            r_var = 1.0
        r_var = max(r_var, 1e-12)
    if q_var is None:
        q_var = float(snr) * r_var
    R, Q = float(r_var), float(q_var)

    a = np.empty(n)  # filtered level
    P = np.empty(n)  # filtered variance
    a_pred = np.empty(n)
    P_pred = np.empty(n)
    # exact diffuse init: first observation pins the level
    a[0], P[0] = y[0], R
    a_pred[0], P_pred[0] = np.nan, np.nan
    for t in range(1, n):
        a_pred[t] = a[t - 1]
        P_pred[t] = P[t - 1] + Q
        F = P_pred[t] + R
        v = y[t] - a_pred[t]
        K = P_pred[t] / F
        a[t] = a_pred[t] + K * v
        P[t] = (1.0 - K) * P_pred[t]
        out["pred"][t] = a_pred[t]
        out["innov"][t] = v
        out["innov_var"][t] = F
        out["score"][t] = v / np.sqrt(F)
    out["level"] = a
    # RTS backward pass: C_t = P_t / P_pred_{t+1}
    sm = np.empty(n)
    sm[n - 1] = a[n - 1]
    for t in range(n - 2, -1, -1):
        C = P[t] / P_pred[t + 1]
        sm[t] = a[t] + C * (sm[t + 1] - a_pred[t + 1])
    out["smooth"] = sm
    return out


def kalman_level(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    series_cols: Sequence[str],
    q_var: float | None = None,
    r_var: float | None = None,
    snr: float = 0.01,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-series local-level Kalman filter/smoother.

    Output: series keys + ts + value + ``kf_pred`` (one-step-ahead
    prediction), ``kf_level`` (filtered), ``kf_smooth`` (RTS smoothed),
    ``kf_innov``, ``kf_innov_sd``, ``kf_score`` (standardized
    innovation) and ``kf_flag`` (|score| > ``threshold``; null on the
    diffuse first row). Row count preserved.

    Input contract: regular, null-free grid per series (compose after
    ``resample_grid`` + a fill operator); nulls raise.
    """
    if threshold <= 0:
        raise ValueError(f"kalman_level: threshold must be > 0, got {threshold}")
    keys = list(series_cols)
    thr = float(threshold)
    out_schema = (
        ", ".join(f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys)
        + f", `{ts_col}` {df.schema[ts_col].dataType.simpleString()}"
        + f", `{value_col}` {df.schema[value_col].dataType.simpleString()}"
        + ", kf_pred double, kf_level double, kf_smooth double"
        + ", kf_innov double, kf_innov_sd double, kf_score double, kf_flag boolean"
    )

    def filt(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        y = pdf[value_col].to_numpy(dtype="float64")
        if np.isnan(y).any():
            raise ValueError("kalman_level: null values in series (fill first)")
        r = kalman_numpy(y, q_var=q_var, r_var=r_var, snr=snr)
        score = r["score"]
        flag = pd.array(
            np.where(np.isnan(score), None, np.abs(score) > thr), dtype="boolean"
        )
        return pd.DataFrame(
            {
                **{k: pdf[k].to_numpy() for k in keys},
                ts_col: pdf[ts_col].to_numpy(),
                value_col: pdf[value_col].to_numpy(),
                "kf_pred": r["pred"],
                "kf_level": r["level"],
                "kf_smooth": r["smooth"],
                "kf_innov": r["innov"],
                "kf_innov_sd": np.sqrt(r["innov_var"]),
                "kf_score": score,
                "kf_flag": flag,
            }
        )

    return (
        df.select(*keys, ts_col, value_col)
        .groupBy(*keys)
        .applyInPandas(filt, out_schema)
    )
