"""Z-order (Morton) clustering — multi-dimensional data layout for
file-level pruning.

The lake-engine feature every 100 TB table eventually needs (Delta's
``OPTIMIZE ZORDER BY``, Iceberg's ``sort_order`` z-columns; Morton 1966
for the curve itself): a table sorted by one column prunes files only
for predicates on THAT column — the second dimension's values scatter
across every file, so its min/max spans are useless. Interleaving the
bits of k bucketized dimensions into one sort key keeps rows that are
close in ALL dimensions inside the same file, so each file's per-column
min/max stats stay TIGHT on every z-ordered dimension at once and the
scan planner (or :func:`.maintenance.file_stats_index`) can skip files
for predicates on ANY of them.

Everything is integer bit arithmetic in Catalyst expressions
(``shiftleft`` / ``shiftright`` / ``&`` / ``|``) — engine-portable and
oracle-replayable bit-for-bit; the write path is one
``repartitionByRange`` + ``sortWithinPartitions`` on the key (a single
range shuffle, the same cost as any global sort layout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "grid_bucket", "zorder_cluster"]


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key of k non-negative integer columns: bit ``b`` of
    column ``i`` lands at interleaved position ``b*k + i``. Output is a
    BIGINT; ``k * bits`` must fit in 63 bits. Inputs OUTSIDE
    ``[0, 2^bits)`` are clamped into range (values at the clamp edge
    still sort adjacently — the standard saturation convention), so a
    hot outlier cannot silently corrupt high interleave bits.
    """
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key: need at least one column")
    if bits < 1 or k * bits > 63:
        raise ValueError(
            f"zorder_key: k*bits = {k * bits} must be in [1, 63]"
        )
    cap = (1 << bits) - 1
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        c = F.col(c) if isinstance(c, str) else c
        v = F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.lit(cap).cast("bigint"), c.cast("bigint")),
        )
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * k + i))
    return key


def grid_bucket(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Fixed-grid bucketizer for a numeric dimension: maps ``[lo, hi]``
    linearly onto ``[0, 2^bits)`` (out-of-range values saturate via
    :func:`zorder_key`'s clamp). A fixed grid — not rank/ntile — keeps
    the key a PURE function of the value, so it is stable under
    appends, replayable in any engine, and needs no stats pass; use
    approx quantiles to CHOOSE lo/hi when the distribution is skewed.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not hi > lo:
        raise ValueError(f"grid_bucket: need hi > lo, got [{lo}, {hi}]")
    n = float(1 << bits)
    return F.floor((c.cast("double") - F.lit(lo)) / F.lit(hi - lo) * n).cast(
        "bigint"
    )


def zorder_cluster(
    df: DataFrame,
    int_cols: Sequence[Column | str],
    n_files: int,
    bits: int = 16,
    key_col: str = "__zkey",
) -> DataFrame:
    """Lay the frame out along the z-curve: one range shuffle on the
    Morton key, rows sorted within each partition, key dropped — write
    the result with ``.write.parquet(...)`` and each output file covers
    a compact z-range (tight per-file min/max on EVERY z-dimension).
    """
    keyed = df.withColumn(key_col, zorder_key(int_cols, bits))
    return (
        keyed.repartitionByRange(int(n_files), F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
