"""F1 — calendar/time features (SURVEY.md §2.6).

Reference: src/preprocessing.py:175-196 derives 9 integer columns from the
DatetimeIndex. Two pandas-vs-Spark conventions need explicit bridging:

- pandas ``dayofweek`` is Monday=0..Sunday=6; Spark ``dayofweek`` is
  Sunday=1..Saturday=7 — bridged with ``(dayofweek(ts)+5) % 7``.
- pandas ``isocalendar().week`` is the ISO week; Spark ``weekofyear`` is
  also ISO — direct match.

All nine features are plain Catalyst expressions added in ONE projection
(the reference's per-column assignments collapse into a single select).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME_FEATURES = (
    "hour",
    "dayofweek",
    "dayofmonth",
    "dayofyear",
    "month",
    "year",
    "quarter",
    "weekofyear",
    "is_weekend",
)


def time_feature_exprs(ts: Column | str) -> dict[str, Column]:
    t = F.col(ts) if isinstance(ts, str) else ts
    pandas_dow = (F.dayofweek(t) + F.lit(5)) % F.lit(7)  # Monday=0..Sunday=6
    return {
        "hour": F.hour(t).cast("int"),
        "dayofweek": pandas_dow.cast("int"),
        "dayofmonth": F.dayofmonth(t).cast("int"),
        "dayofyear": F.dayofyear(t).cast("int"),
        "month": F.month(t).cast("int"),
        "year": F.year(t).cast("int"),
        "quarter": F.quarter(t).cast("int"),
        "weekofyear": F.weekofyear(t).cast("int"),
        # reference: (dayofweek >= 5).astype(int) — Sat/Sun
        "is_weekend": (pandas_dow >= F.lit(5)).cast("int"),
    }


def add_time_features(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Append the 9 reference time features derived from ``ts_col``."""
    return df.withColumns(time_feature_exprs(ts_col))
