"""Feature-engineering operators F2/F3 and the composed featurize stage
(SURVEY.md §2.6, §3.1 stage 3).

Design: every window here uses the SAME WindowSpec family
``partitionBy(series).orderBy(ts, tiebreak)`` so Catalyst plans ONE
exchange + ONE sort for the entire feature stage — lags, rolling aggs and
ffill all ride the same shuffle. Verified via .explain in
tests/test_plans.py.

Scale notes: the reference's data is a single global series, which would
put the whole table in one window partition. The engine takes the series
key as a required parameter (``user_id`` in testdata); a single-series
input can be parallelized by time-bucketing with overlap (SURVEY §4.2) —
see ``bucketed_rolling`` below.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROLL_AGGS: dict[str, callable] = {
    "mean": F.avg,
    "std": F.stddev_samp,  # pandas rolling .std() is ddof=1 == stddev_samp
    "min": F.min,
    "max": F.max,
}


def _order_cols(order_cols: Sequence[str]) -> list[Column]:
    return [F.col(c).asc() for c in order_cols]


def add_lag_features(
    df: DataFrame,
    target: str,
    lags: Sequence[int],
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """F2: ``{target}_lag_{n}`` = value n rows earlier in the series.

    Reference: src/preprocessing.py:198-221 (``df[target].shift(lag)``);
    non-positive lags are skipped (:213-215). First n rows per series are
    NULL (pandas NaN).
    """
    w = Window.partitionBy(*key_cols).orderBy(*_order_cols(order_cols))
    exprs = {
        f"{target}_lag_{n}": F.lag(target, n).over(w) for n in lags if n > 0
    }
    return df.withColumns(exprs)


def add_rolling_features(
    df: DataFrame,
    target: str,
    windows: Sequence[int],
    aggs: Sequence[str],
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    suffix: str = "h",
) -> DataFrame:
    """F3: rolling aggregates over the PAST w rows (current row excluded).

    Reference: src/preprocessing.py:223-260 —
    ``shift(1).rolling(window=w, min_periods=1).agg(...)``, i.e. frame
    rows [t-w, t-1] (anti-leakage, comments :251-255). Spark's
    ``rowsBetween(-w, -1)`` matches exactly, including the null edges:
    empty frame (row 0) -> NULL, and 1-row frame under sample-std -> NULL.
    Column naming ``{target}_roll_{agg}_{w}{suffix}`` mirrors :249.
    """
    w0 = Window.partitionBy(*key_cols).orderBy(*_order_cols(order_cols))
    exprs: dict[str, Column] = {}
    for win in windows:
        frame = w0.rowsBetween(-win, -1)
        for agg in aggs:
            exprs[f"{target}_roll_{agg}_{win}{suffix}"] = ROLL_AGGS[agg](
                F.col(target)
            ).over(frame)
    return df.withColumns(exprs)


def featurize(
    df: DataFrame,
    target: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    lags: Sequence[int] = (1, 2, 3, 24, 48, 168),
    windows: Sequence[int] = (3, 6, 12, 24),
    aggs: Sequence[str] = ("mean", "std", "min", "max"),
    with_time_features: bool = True,
    ts_col: str = "ts",
    dropna: bool = True,
) -> DataFrame:
    """Composed feature stage mirroring the reference pipeline
    (main.py:126-157): time features + lags + rolling aggs + dropna.

    The dropna drops the first max(lags) rows of each series (reference
    main.py:149-153 drops 168 rows = max lag). All of it is one logical
    plan; Catalyst fuses the projections and reuses one window exchange.
    """
    from ..functions.timefeat import add_time_features

    out = df
    if with_time_features:
        out = add_time_features(out, ts_col)
    out = add_lag_features(out, target, lags, key_cols, order_cols)
    out = add_rolling_features(out, target, windows, aggs, key_cols, order_cols)
    if dropna:
        out = out.na.drop(how="any")
    return out


def bucketed_rolling(
    df: DataFrame,
    target: str,
    window_rows: int,
    aggs: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str = "ts",
    bucket: str = "30 days",
) -> DataFrame:
    """Single-global-series rolling aggregates WITHOUT a single-task window
    (SURVEY §4.2 hard part #1): bucket by time, ship each bucket exactly
    the ``window_rows`` rows of global history that precede it, compute
    per bucket in parallel, keep only rows owned by the bucket.

    EXACT for ANY bucket occupancy — gapped, bursty, or empty buckets
    included (r5's overlap shipped only the one preceding bucket, which
    silently under-filled frames whenever a bucket held fewer than
    ``window_rows`` rows). Mechanics:

    1. per-bucket ``row_number`` + a prefix sum over the tiny per-bucket
       count table (one row per time bucket; a single-partition window
       over at most thousands of rows even at decade spans) = the exact
       global row index of every row, with no single-task pass over the
       DATA;
    2. every bucket receives copies of the ``window_rows`` rows whose
       global index immediately precedes the bucket's first owned row —
       a broadcast range-join against the bucket-starts table, so the
       copies may span any number of sparse predecessor buckets;
    3. one per-bucket window sorted by global index computes the frame
       ``rowsBetween(-w, -1)``; copies are dropped after serving as
       history.

    Shuffle cost: two exchanges on ``_bucket`` (index assignment +
    windowing) carrying n + w*n_buckets rows total — versus the
    single-partition global window this replaces, which is one task at
    any cluster size. At 100 TB that trade IS the operator.
    """
    bucket_col = F.window(F.col(ts_col), bucket).getField("start")
    wb = Window.partitionBy("_bucket").orderBy(*_order_cols(order_cols))
    b = df.withColumn("_bucket", bucket_col).withColumn(
        "_rn", F.row_number().over(wb)
    )
    # exact global index: per-bucket counts -> prefix sum (tiny table).
    # The counts branch aggregates the RAW scan (map-side partial
    # combine, no sort) rather than max(_rn) over the window lineage —
    # same numbers, one fewer forced window computation.
    counts = (
        df.select(bucket_col.alias("_bucket"))
        .groupBy("_bucket")
        .agg(F.count("*").alias("_cnt"))
    )
    wc = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    starts = counts.select(
        "_bucket",
        F.coalesce(F.sum("_cnt").over(wc), F.lit(0)).alias("_start"),
    )
    g = (
        b.join(F.broadcast(starts), "_bucket")
        .withColumn("_gidx", F.col("_start") + F.col("_rn") - 1)
        .drop("_rn", "_start")
    )
    owned = g.withColumn("_recv", F.col("_bucket")).withColumn(
        "_owned", F.lit(True)
    )
    # history copies: the w global predecessors of each bucket's first row
    recv = starts.select(F.col("_bucket").alias("_recv"), "_start")
    copies = (
        g.join(
            F.broadcast(recv),
            (F.col("_gidx") >= F.col("_start") - window_rows)
            & (F.col("_gidx") < F.col("_start")),
        )
        .drop("_start")
        .withColumn("_owned", F.lit(False))
    )
    unioned = owned.unionByName(copies.select(*owned.columns))
    w = (
        Window.partitionBy("_recv")
        .orderBy("_gidx")
        .rowsBetween(-window_rows, -1)
    )
    out = unioned.withColumns(
        {
            f"{target}_roll_{a}_{window_rows}h": ROLL_AGGS[a](F.col(target)).over(w)
            for a in aggs
        }
    )
    return out.filter(F.col("_owned")).drop("_bucket", "_recv", "_owned", "_gidx")
