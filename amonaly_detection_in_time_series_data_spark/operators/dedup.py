"""Dedup operators (SURVEY.md §2.4 O3/O4 and §2.14 exact text dedup).

Scale notes: positional dedup is one ``row_number`` window — a single hash
exchange on the dedup key; at 100 TB the key (``ts`` or ``(user_id, ts)``)
has high cardinality so partitions stay balanced. Aggregate dedup is a
plain hash aggregate with map-side partials. Neither collects to the
driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dedup_keep_positional(
    df: DataFrame,
    key_cols: Sequence[str],
    arrival_col: str,
    keep: str = "first",
) -> DataFrame:
    """O3: keep the first/last occurrence per key in *arrival order*.

    Reference: src/preprocessing.py:76-81 —
    ``df[~df.index.duplicated(keep='first')]`` runs BEFORE the sort
    (sort_index at :96), so "first" means file order, not time order.
    ``dropDuplicates`` alone is non-deterministic; an explicit arrival key
    + ``row_number`` is the faithful translation.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    order = F.col(arrival_col).asc() if keep == "first" else F.col(arrival_col).desc()
    w = Window.partitionBy(*key_cols).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_mean(
    df: DataFrame,
    key_cols: Sequence[str],
    arrival_col: str | None = None,
) -> DataFrame:
    """O4: aggregate duplicates — numeric columns mean, non-numeric first.

    Reference: src/preprocessing.py:82-91 (``groupby(index).mean()`` for
    numerics, ``.first()`` for the rest, concatenated on the index).
    pandas ``groupby.first()`` is the first NON-NULL per group in row
    order; with an arrival key we reproduce that with ``min_by`` over
    non-null rows. One hash aggregate, partial+final automatic.
    """
    keys = list(key_cols)
    numeric, other = [], []
    for f in df.schema.fields:
        if f.name in keys or f.name == arrival_col:
            continue
        (numeric if isinstance(f.dataType, T.NumericType) else other).append(f.name)
    aggs = [F.avg(c).alias(c) for c in numeric]
    for c in other:
        if arrival_col is not None:
            # first non-null by arrival: null out the ordering key on null
            # values so min_by skips them (pandas .first() semantics).
            key = F.when(F.col(c).isNotNull(), F.col(arrival_col))
            aggs.append(F.min_by(F.col(c), key).alias(c))
        else:
            aggs.append(F.first(c, ignorenulls=True).alias(c))
    return df.groupBy(*keys).agg(*aggs)


def dedup_exact_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """§2.14: exact document dedup — keep the lowest-id row per distinct
    text. Equivalent to hash-groupBy on sha2(text) but expressed as
    ``min_by`` so no second join is needed. Deterministic (id tiebreak).
    """
    keep_cols = [c for c in df.columns if c != text_col]
    return df.groupBy(text_col).agg(
        *[F.min_by(c, id_col).alias(c) for c in keep_cols]
    )
