"""Composed end-to-end anomaly pipeline — the Spark-first equivalent of
the reference's ``run_pipeline`` (main.py:58-233).

Stage map (reference -> here):

  1. load CSVs + header cleanup        -> sources.load_table / load_csv
  2. timestamp parse, dedup 'first',
     numeric clean, ffill              -> dedup_keep_positional + ffill
  3. time/lag/rolling features, dropna -> operators.features.featurize
  4. scale + sequence + train          -> minmax_scale (+ create_sequences
                                          for the model tier)
  5. detect (spec-only in reference)   -> rolling_zscore 3-sigma flags

Crucial structural difference: the reference materializes a full pandas
frame between every stage (>=8 copies); here the stages only extend ONE
logical plan — Catalyst collapses the ~30 projections into a single
whole-stage-codegen region over a single window exchange, and nothing
executes until the caller acts on the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from ..operators.dedup import dedup_keep_positional
from ..operators.missing import ffill, fill_zero
from ..operators.features import featurize
from ..operators.anomaly import rolling_zscore


def anomaly_pipeline(
    spark: SparkSession,
    sf_dir: str,
    target: str = "value",
    lags: tuple[int, ...] = (1, 2, 3, 24),
    windows: tuple[int, ...] = (3, 6, 12, 24),
    zscore_window: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """events -> cleaned -> featurized -> 3-sigma anomaly flags.

    The series key is ``user_id`` (the reference's single global series
    generalized to many parallel series — SURVEY §1.1); ordering is
    ``(ts, event_id)`` with the unique event id as a deterministic
    tiebreaker for equal timestamps.
    """
    key = ["user_id"]
    order = ["ts", "event_id"]

    events = load_table(spark, sf_dir, "events")
    deduped = dedup_keep_positional(events, key + ["ts"], arrival_col="event_id")
    filled = fill_zero(ffill(deduped, [target], key, order), [target])
    feats = featurize(
        filled,
        target,
        key,
        order,
        lags=lags,
        windows=windows,
        aggs=("mean", "std", "min", "max"),
        dropna=True,
    )
    return rolling_zscore(feats, target, zscore_window, key, order, threshold)
