"""Distributed model inference over sequence windows (SURVEY.md §2.12).

The reference trains an LSTM autoencoder and (in spec, main.py:223-231)
flags sequences whose reconstruction error exceeds a 3-sigma threshold.
This module implements that contract with the Spark-idiomatic inference
shape — a small model fit driver-side on a bounded sample, broadcast to
executors, applied via Arrow-batched ``mapInPandas`` — using a linear
autoencoder (PCA) as the model so the path is deterministic and
dependency-free (torch is not available here; a torch model drops into
the same ``score_fn`` slot, reloaded per executor from a broadcast
state_dict).

At 100 TB: the fit sample is bounded (driver memory is O(sample));
scoring is a pure map — no shuffle, no collect — and the model rides
task broadcast (~KBs).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LinearAEModel:
    """Mean + top-k principal components of flattened (L*f) sequences."""

    def __init__(self, mean: np.ndarray, components: np.ndarray):
        self.mean = mean  # (d,)
        self.components = components  # (k, d), rows orthonormal

    def reconstruction_errors(self, x: np.ndarray) -> np.ndarray:
        """Per-row squared reconstruction error of x (n, d)."""
        centered = x - self.mean
        proj = centered @ self.components.T  # (n, k)
        recon = proj @ self.components  # (n, d)
        resid = centered - recon
        return np.einsum("ij,ij->i", resid, resid)


def fit_linear_ae(
    df: DataFrame, seq_col: str, k: int, fit_rows: int,
    order_cols: list[str] | None = None,
) -> LinearAEModel:
    """Driver-side fit on a bounded sample: ``select(seq_col).limit(n)``.

    A plain limit compiles to CollectLimit — only the first reduce
    partitions of the (expensive) sequence-assembly lineage are computed,
    instead of the full lineage plus a global sort that
    ``orderBy().limit()`` (TakeOrderedAndProject) costs. Any bounded
    sample is an acceptable fit set (the model is tiny either way), and
    on a static source with a deterministic plan the limit is repeatable.
    ``order_cols`` is kept for API compatibility; it no longer forces a
    global sort of the whole sequence DataFrame just to pick a sample.
    """
    sample = df.select(seq_col).limit(fit_rows).toPandas()[seq_col]
    x = _stack_sequences(sample)
    mean = x.mean(axis=0)
    # SVD of the centered sample; top-k right singular vectors
    _, _, vt = np.linalg.svd(x - mean, full_matrices=False)
    return LinearAEModel(mean, vt[:k])


def _stack_sequences(seqs) -> np.ndarray:
    """Flatten an iterable of L x f sequences into an (n, L*f) matrix.

    ``np.stack`` (not ``np.array``) — building a 2-D array from a list of
    1-D arrays via np.array trips NumPy's ragged-conversion deprecation
    and will become a hard error."""
    flat = [
        np.stack([np.asarray(row, dtype=np.float64) for row in s]).ravel()
        for s in seqs
    ]
    if not flat:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack(flat)


def sequence_reconstruction_scores(
    df: DataFrame,
    seq_col: str = "seq",
    k: int = 2,
    fit_rows: int = 2048,
    order_cols: list[str] | None = None,
    error_col: str = "recon_error",
) -> DataFrame:
    """Score every sequence with its reconstruction error under a
    driver-fit, executor-broadcast linear autoencoder.

    Input is the output of ``operators.sequences.create_sequences``
    (``seq``: array<array<double>>, L x f). Output adds ``error_col``.
    """
    order_cols = order_cols or [c for c in df.columns if c != seq_col]
    model = fit_linear_ae(df, seq_col, k, fit_rows, order_cols)

    bc = df.sparkSession.sparkContext.broadcast(
        (model.mean, model.components)
    )
    from pyspark.sql import types as T

    # fresh StructType — .add() would mutate the DataFrame's cached schema
    out_fields = df.schema.fieldNames() + [error_col]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(error_col, T.DoubleType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, components = bc.value
        m = LinearAEModel(mean, components)
        for pdf in batches:
            x = _stack_sequences(pdf[seq_col])
            pdf = pdf.copy()
            pdf[error_col] = m.reconstruction_errors(x) if len(x) else []
            yield pdf[out_fields]

    return df.mapInPandas(score, schema=out_schema)


def flag_sequence_anomalies(
    scored: DataFrame, error_col: str = "recon_error", threshold: float = 3.0
) -> DataFrame:
    """3-sigma flags over the reconstruction-error distribution — the
    reference's ANOMALY_THRESHOLD = 3.0 contract (config.py:21)."""
    from .anomaly import global_zscore_flags

    return global_zscore_flags(scored, error_col, threshold)
