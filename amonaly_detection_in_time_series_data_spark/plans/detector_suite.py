"""Composed detector suite: the full r6-r8 anomaly arsenal over one
regular grid, fused by an ensemble vote.

The deployment shape a monitoring pipeline actually runs (beyond the
reference's single-detector ``run_pipeline``, main.py:58-233):

  1. resample to a regular per-series grid + fill     (grid contract
     every sequential detector requires)
  2. the Catalyst battery on the RAW events           (z/PH/EWMA/IQR/
     robust/OLS — one shared exchange, no Python)
  3. the model-based per-series detectors on the grid (Kalman
     standardized innovations; seasonal-hybrid ESD; spectral residual)
  4. one ensemble vote over every flag                (k-of-n fusion,
     ensemble_flags)

Execution shape: stages 2 and 3 are independent lineages over the same
key — the battery stays entirely JVM-side; the grid detectors are one
``applyInPandas`` each, all partitioned on the SAME series key, so the
final joins co-locate without extra exchanges beyond the grid's own.
Everything stays one logical plan; nothing materializes until the
caller acts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.anomaly import ensemble_flags, rolling_zscore
from ..operators.esd import esd_anomalies
from ..operators.kalman import kalman_level
from ..operators.spectral import spectral_residual
from ..operators.timeseries import resample_grid

__all__ = ["detector_suite"]


def detector_suite(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    series_cols: Sequence[str],
    grid_step: str = "1 hour",
    zscore_window: int = 24,
    season_rows: int = 24,
    k: int = 2,
    kalman_snr: float = 0.05,
) -> DataFrame:
    """Grid rows with every detector's score + flag and the fused
    ``votes`` / ``ensemble_alarm`` columns.

    Flags fused (k-of-``n`` with NULL = abstain): rolling 3-sigma
    (``is_anomaly``), Kalman innovation (``kf_flag``), seasonal-hybrid
    ESD (``esd_flag``), spectral residual (``sr_flag``).
    """
    keys = list(series_cols)
    # resample_grid forward-fills empty buckets itself and emits the
    # grid timestamp as `bucket_ts`; the na.drop only trims a series'
    # pre-first-observation edge
    grid = resample_grid(df, keys, ts_col, [value_col], step=grid_step)
    gts = "bucket_ts"
    filled = grid.na.drop(subset=[value_col])

    z = rolling_zscore(filled, value_col, zscore_window, keys, [gts])
    zs = z.select(
        *keys, gts, value_col,
        F.col(f"{value_col}_zscore").alias("zscore"),
        F.col("is_anomaly").cast("boolean").alias("z_flag"),
    )
    kf = kalman_level(filled, gts, value_col, keys, snr=kalman_snr).select(
        *keys, gts, "kf_score", "kf_flag"
    )
    esd = esd_anomalies(
        filled, gts, value_col, keys, season_rows=season_rows
    ).select(*keys, gts, "esd_resid", "esd_flag")
    sr = spectral_residual(filled, gts, value_col, keys).select(
        *keys, gts, "sr_score", "sr_flag"
    )
    on = keys + [gts]
    joined = zs.join(kf, on).join(esd, on).join(sr, on)
    return ensemble_flags(
        joined, ["z_flag", "kf_flag", "esd_flag", "sr_flag"], k=k
    )
