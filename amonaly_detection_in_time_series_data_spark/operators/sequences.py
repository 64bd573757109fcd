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
) -> DataFrame:
    """All overlapping length-``seq_len`` windows per series, stride 1.

    Output: key cols + ``seq_start_ts`` + ``seq`` (array<array<double>>,
    outer = time steps in ascending order, inner = features in
    ``feature_cols`` order). Rows whose forward frame is shorter than
    ``seq_len`` (series tail) are dropped — matches the reference's
    n-L+1 count.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.currentRow, seq_len - 1)
    )
    step = F.array(*[F.col(c).cast("double") for c in feature_cols])
    out = df.select(
        *key_cols,
        F.col(ts_col).alias("seq_start_ts"),
        F.collect_list(step).over(w).alias("seq"),
    )
    return out.filter(F.size("seq") == seq_len)
