"""Persistable HyperLogLog sketch columns — the summary-table pattern.

``approx_count_distinct`` answers one query and throws its state away.
The lake pattern a 100 TB pipeline actually needs is the DataSketches
one (Spark ships it since 3.5 as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``): build a per-(key, day)
sketch ONCE, persist it as a binary column in a summary table, and
answer every later rollup (per-month, per-key-overall, cross-table
union) by MERGING sketches — never rescanning the raw events. Merge is
associative and loss-free at matched ``lg_k``, so daily → monthly →
yearly rollups compose; distinct counts famously do NOT add, sketches
do.

Everything here is built-in JVM aggregates (no UDFs); the sketch bytes
round-trip through parquet like any binary column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_build", "hll_rollup", "hll_estimate"]


def hll_build(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One sketch per key group: ``(key_cols..., sketch_col binary)``.
    One aggregate with map-side partial merge; state per group is the
    sketch's fixed ~2^lg_k registers regardless of input size. lg_k=12
    gives ~1.6% relative standard error in ~4 KB."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    key_cols: Sequence[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge persisted sketches up to a coarser key (e.g. per-day →
    per-month: group by the month key and union the day sketches) —
    the raw table is never touched again."""
    return sketches.groupBy(*key_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def hll_estimate(sketch_col: Column | str = "hll_sketch") -> Column:
    """Distinct-count estimate of a sketch column (bigint)."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.hll_sketch_estimate(c)
