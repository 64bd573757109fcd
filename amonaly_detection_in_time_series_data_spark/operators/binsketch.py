"""Equi-width binned histogram sketches — the ADDITIVE member of the
summary-table sketch family.

The sketch tier so far covers distinct counts (:mod:`~.hll`,
:mod:`~.kmv` — non-additive, maintained by affected-group recompute),
frequencies (:mod:`~.cms`) and streaming quantiles (GK in
``streaming.rolling``). This module adds PERSISTABLE batch quantiles:
a per-group equi-width histogram over a declared ``[lo, hi)`` range,
stored as plain ``bigint`` count columns (``b0..b{B-1}``, with
underflow bin 0 and overflow bin B-1).

Why bins and not KLL/t-digest: a fixed-width histogram is the one
quantile summary that is **linear** — merge is element-wise addition
and a DELETE is a subtraction — so the summary table slots into the
EXISTING additive IVM machinery (:func:`~.ivm.maintain_agg_snapshot`
with ``sum_cols=bin columns``): no affected-group rescans, ever, unlike
the HLL/KMV class. The price is a declared value range and a
rank-error bound of one bin width instead of KLL's distribution-free
guarantee — the right trade for lake columns whose domain is known
(prices, latencies with a cap, bounded scores). Estimates are plain
integer-count arithmetic, so the whole tier replays bit-for-bit in any
SQL engine (DuckDB oracle, same convention as CMS/KMV).

Scale shape: the build is ONE groupBy with B conditional-sum
aggregates — all map-side partial combine, shuffle carries one row per
group; no explode, no UDF, no per-row allocation. Rollups are B sums.
Quantile evaluation folds a B-length array per GROUP row (tiny), never
per data row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hist_bin",
    "hist_sketch",
    "hist_rollup",
    "hist_array",
    "hist_quantile",
]


def _width(lo: float, hi: float, n_bins: int) -> float:
    if not (hi > lo):
        raise ValueError(f"hist sketch: need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"hist sketch: n_bins must be >= 1, got {n_bins}")
    return (hi - lo) / n_bins


def hist_bin(
    value: Column | str, lo: float, hi: float, n_bins: int
) -> Column:
    """Bin index of a value: 0 = underflow (< lo), 1..n_bins = interior
    (equi-width over [lo, hi)), n_bins+1 = overflow (>= hi); NULL for
    NULL. Plain arithmetic — identical in any engine."""
    v = F.col(value) if isinstance(value, str) else value
    w = _width(lo, hi, n_bins)
    raw = F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("bigint") + 1
    return (
        F.when(v.isNull(), F.lit(None).cast("bigint"))
        .when(v < F.lit(float(lo)), F.lit(0).cast("bigint"))
        .when(v >= F.lit(float(hi)), F.lit(int(n_bins) + 1).cast("bigint"))
        .otherwise(F.least(raw, F.lit(int(n_bins))))  # guard fp edge at hi
    )


def _bin_cols(n_bins: int, prefix: str) -> list[str]:
    return [f"{prefix}{i}" for i in range(int(n_bins) + 2)]


def hist_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    prefix: str = "b",
) -> DataFrame:
    """One row per key group with ``n_bins + 2`` bigint count columns
    (``{prefix}0`` underflow ... ``{prefix}{n_bins+1}`` overflow).
    NULL values are ignored (a NULL is not a value — same contract as
    kmv_build). Scalar columns, not an array, ON PURPOSE: they are
    directly ``sum_cols`` for :func:`~.ivm.maintain_agg_snapshot`, so
    the summary table is CDC-maintained by pure delta folds — deletes
    retract, no rescan (the additive class; see module docstring)."""
    keys = list(group_cols)
    b = hist_bin(value_col, lo, hi, n_bins)
    return df.withColumn("__hb", b).groupBy(*keys).agg(
        *[
            F.sum(
                F.when(F.col("__hb") == i, F.lit(1)).otherwise(F.lit(0))
            ).alias(c)
            for i, c in enumerate(_bin_cols(n_bins, prefix))
        ]
    )


def hist_rollup(
    sketches: DataFrame,
    key_cols: Sequence[str],
    n_bins: int,
    prefix: str = "b",
) -> DataFrame:
    """Merge sketches up to a coarser key: element-wise sums — LOSS-FREE
    and exact by linearity (equals a direct build over the merged base;
    pinned in tests)."""
    keys = list(key_cols)
    return sketches.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in _bin_cols(n_bins, prefix)]
    )


def hist_array(n_bins: int, prefix: str = "b") -> Column:
    """The wide count columns as one ``array<bigint>`` (for quantile
    evaluation or compact storage)."""
    return F.array(*[F.col(c) for c in _bin_cols(n_bins, prefix)])


def hist_quantile(
    counts: Column | str,
    q: float,
    lo: float,
    hi: float,
    n_bins: int,
) -> Column:
    """Quantile estimate from a count array (as built by
    :func:`hist_array`): find the bin where the running count crosses
    ``q * total`` and interpolate linearly inside it. Max error is one
    bin width for interior mass; underflow/overflow mass clamps to
    ``lo`` / ``hi`` (the sketch declares the range — mass outside it has
    no position information). Empty sketch (total 0) -> NULL.

    Integer counts + one division + one multiply-add — the identical
    IEEE sequence replays in DuckDB (list_* fold), so estimates are
    oracle-exact, not approx-compared. Folds a B-length array per GROUP
    row — never a per-data-row cost."""
    c = F.col(counts) if isinstance(counts, str) else counts
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"hist_quantile: q must be in [0, 1], got {q}")
    w = _width(lo, hi, n_bins)
    total = F.aggregate(c, F.lit(0).cast("bigint"), lambda a, x: a + x)
    target = F.lit(float(q)) * total.cast("double")
    # fold state: (cum, ans) — ans fixed at the first bin where
    # cum + cnt >= target. i is recovered from cum order via a packed
    # struct carrying the running bin index.
    init = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(0).cast("bigint").alias("idx"),
        F.lit(None).cast("double").alias("ans"),
    )

    def step(acc, cnt):
        pos_in_bin = (target - acc["cum"].cast("double")) / F.nullif(
            cnt.cast("double"), F.lit(0.0)
        )
        # bin idx 0 = underflow (clamp lo), n_bins+1 = overflow (clamp hi)
        est = (
            F.when(acc["idx"] == 0, F.lit(float(lo)))
            .when(acc["idx"] == int(n_bins) + 1, F.lit(float(hi)))
            .otherwise(
                F.lit(float(lo))
                + ((acc["idx"] - 1).cast("double") + pos_in_bin) * F.lit(w)
            )
        )
        hit = (
            acc["ans"].isNull()
            & (cnt > 0)
            & ((acc["cum"] + cnt).cast("double") >= target)
        )
        return F.struct(
            (acc["cum"] + cnt).alias("cum"),
            (acc["idx"] + 1).alias("idx"),
            F.when(hit, est).otherwise(acc["ans"]).alias("ans"),
        )

    folded = F.aggregate(c, init, step)
    return F.when(total > 0, folded["ans"])
