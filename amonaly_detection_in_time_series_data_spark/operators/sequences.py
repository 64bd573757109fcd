"""F5 — sliding sequence windowing (SURVEY.md §2.6).

Reference: ``create_sequences`` (src/preprocessing.py:296-312) turns a
(n, f) matrix into all overlapping length-L windows, stride 1 ->
(n-L+1, L, f). In Spark the sequence column is
``array<array<double>>`` built with ``collect_list`` over a forward row
frame; each sequence is tagged with its start timestamp so downstream
scoring joins back to event time.

Scale notes: rides the same ``(series, ts)`` window exchange as the other
feature operators; per-row payload is L*f doubles, so at 100 TB one sizes
``spark.sql.files.maxPartitionBytes`` down (or repartitions) to keep the
inflated partitions in memory. Inference over the sequence column is an
Arrow-batched pandas UDF (operators.anomaly / plans.pipeline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def create_sequences(
    df: DataFrame,
    feature_cols: Sequence[str],
    seq_len: int,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str = "ts",
    stride: int = 1,
) -> DataFrame:
    """Length-``seq_len`` windows per series, every ``stride`` rows.

    Output: key cols + ``seq_start_ts`` + ``seq`` (array<array<double>>,
    outer = time steps in ascending order, inner = features in
    ``feature_cols`` order). Short windows (series tail) are dropped.

    ``stride=1`` (default) is the reference contract — ALL overlapping
    windows, n-L+1 per series (src/preprocessing.py:296-312) — built
    with ``collect_list`` over a forward row frame: each input row's
    value is replicated into L sequences, so the materialized payload is
    L x the input. ``stride=seq_len`` tiles the series into
    NON-overlapping windows (n/L rows, each input value in exactly one
    sequence) — the production scoring contract when windows are scored
    independently (window-granular anomaly coverage at 1/L the rows and
    none of the L x inflation); it is built with one groupBy over a
    bucketed row number instead of a running window, so the shuffle
    carries raw rows, not L-fold arrays. Other strides filter the
    stride-1 window (same cost as stride 1 — only the output shrinks).
    """
    if stride < 1:
        raise ValueError(f"create_sequences: stride must be >= 1, got {stride}")
    step = F.array(*[F.col(c).cast("double") for c in feature_cols])
    order = [F.col(c).asc() for c in order_cols]
    if stride == seq_len:
        # non-overlapping tiling: bucket consecutive rows, ONE ordinary
        # aggregation. sort_array on (rn, …) structs restores time order
        # inside each bucket (aggregation order is not guaranteed).
        rn = F.row_number().over(
            Window.partitionBy(*key_cols).orderBy(*order)
        )
        bucketed = df.select(
            *key_cols,
            F.col(ts_col).alias("__ts"),
            ((rn - 1) / seq_len).cast("bigint").alias("__bkt"),
            rn.alias("__rn"),
            step.alias("__step"),
        )
        out = (
            bucketed.groupBy(*key_cols, "__bkt")
            .agg(
                F.min_by("__ts", "__rn").alias("seq_start_ts"),
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__rn", "__step"))),
                    lambda s: s["__step"],
                ).alias("seq"),
            )
            .drop("__bkt")
        )
        return out.filter(F.size("seq") == seq_len).select(
            *key_cols, "seq_start_ts", "seq"
        )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, seq_len - 1)
    )
    sel = [
        *key_cols,
        F.col(ts_col).alias("seq_start_ts"),
        F.collect_list(step).over(w).alias("seq"),
    ]
    if stride == 1:
        out = df.select(*sel)
        return out.filter(F.size("seq") == seq_len)
    rn1 = F.row_number().over(Window.partitionBy(*key_cols).orderBy(*order))
    out = df.select(*sel, rn1.alias("__rn"))
    return (
        out.filter((F.size("seq") == seq_len) & ((F.col("__rn") - 1) % stride == 0))
        .drop("__rn")
    )
