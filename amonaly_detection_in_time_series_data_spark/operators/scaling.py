"""F4 — min-max scaling (SURVEY.md §2.6).

Reference: sklearn ``MinMaxScaler().fit_transform`` over all numeric
columns (src/preprocessing.py:264-294). Two-pass by nature (global min/max
then transform). Two implementations:

- :func:`minmax_scale` — pure-SQL: one aggregate job for min/max (map-side
  partials), broadcast 1-row stats, then a single projection. Oracle-
  checkable; sklearn convention reproduced: a constant column maps to 0.0.
- :func:`minmax_scale_ml` — MLlib ``MinMaxScaler`` producing a persistable
  model (the reference pickles its scaler, main.py:177-179; S4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_scale(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Scale ``cols`` to [0, 1]; constant columns -> 0.0 (sklearn)."""
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    scaled = {}
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        rng = hi - lo
        scaled[c] = F.when(rng == 0, F.lit(0.0)).otherwise((F.col(c) - lo) / rng)
    out = out.withColumns(scaled)
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def minmax_scale_ml(df: DataFrame, cols: Sequence[str], output_col: str = "features_scaled"):
    """MLlib variant: returns (transformed_df, fitted PipelineModel).

    The model persists via ``model.write().save(path)`` — the engine's
    equivalent of the reference's joblib scaler dump (S4).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import MinMaxScaler, VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(cols), outputCol="__features", handleInvalid="keep"
    )
    scaler = MinMaxScaler(inputCol="__features", outputCol=output_col)
    model = Pipeline(stages=[assembler, scaler]).fit(df)
    return model.transform(df).drop("__features"), model
