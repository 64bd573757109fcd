"""Incremental view maintenance: keep a grouped-aggregate table in sync
with a CDC-fed base table without recomputing it.

A 100 TB base table with a per-key/per-day rollup on top cannot afford
``GROUP BY`` over the world every time a MB-sized change batch lands.
Classic IVM splits aggregates by algebraic class:

- **additive** (sum, count — and avg = sum/count): maintainable from
  the batch alone plus the OLD images of the changed keys. Each changed
  key contributes a retraction of its old row and an insertion of its
  new row; the deltas fold into the aggregate with one tiny groupBy.
  Cost: O(batch) + the pruned old-image lookup — never a base rescan.
- **non-additive** (min, max, distinct counts): a delete can expose a
  value only a rescan can find, so the bounded strategy is
  *affected-group recompute*: rescan JUST the groups the batch touched
  (:func:`refresh_groups`) and splice them into the rollup.

The composed driver :func:`maintain_agg_snapshot` wires this to the
snapshot layer: read the base's CURRENT version for old images, apply
the batch with :func:`~.snapshots.snapshot_merge`, fold the delta into
the rollup, and commit the rollup as its own snapshot version — so base
vN and rollup vN are consistent cuts, each time-travelable.

**Scale.** The batch is broadcast everywhere it meets the base (semi-
join for old images), the base is partition-pruned to the batch's
touched partitions before that lookup (same footprint argument as
``merge_changes``), and the delta groupBy shuffles O(batch) rows. The
rollup rewrite is O(rollup), which is the point: rollups are small.
Floating-point sums drift under fold-in vs recompute; keep additive
columns integral (longs / decimals) where bit-exactness matters —
tests pin exactness on longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.cdc import (
    latest_changes,
)
from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
    read_snapshot,
    snapshot_commit,
    snapshot_merge,
)

__all__ = [
    "agg_delta",
    "apply_agg_delta",
    "compute_agg",
    "refresh_groups",
    "maintain_agg_snapshot",
]

COUNT_COL = "__n_rows"


def agg_delta(
    target_before: DataFrame,
    changes: DataFrame,
    keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """The additive delta a change batch induces on
    ``GROUP BY group_cols: sum(sum_cols), count(*)``.

    ``target_before`` must be the PRE-merge base (pass it partition-
    pruned; :func:`maintain_agg_snapshot` does). Old images of changed
    keys are retracted (negated), surviving upserts inserted; both fold
    through one groupBy over O(batch) rows. Groups whose rows all
    disappear net out to ``__n_rows = 0`` and are dropped by
    :func:`apply_agg_delta`.
    """
    latest = latest_changes(changes, keys, seq_col, delete_col)
    old = target_before.join(
        F.broadcast(latest.select(*keys).distinct()), on=keys, how="left_semi"
    )
    upserts = latest
    if delete_col is not None:
        upserts = upserts.filter(~F.coalesce(F.col(delete_col), F.lit(False)))

    def signed(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *group_cols,
            *[(F.col(c) * sign).alias(c) for c in sum_cols],
            F.lit(sign).alias(COUNT_COL),
        )

    return (
        signed(old, -1)
        .unionByName(signed(upserts, 1))
        .groupBy(*group_cols)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(COUNT_COL).alias(COUNT_COL),
        )
    )


def apply_agg_delta(
    agg: DataFrame, delta: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Fold a delta into the rollup: union + one groupBy (no join, so
    null group values need no null-safe handling — groupBy already
    treats them as one group). Emptied groups (count 0) drop out."""
    return (
        agg.select(*group_cols, *sum_cols, COUNT_COL)
        .unionByName(delta.select(*group_cols, *sum_cols, COUNT_COL))
        .groupBy(*group_cols)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(COUNT_COL).alias(COUNT_COL),
        )
        .filter(F.col(COUNT_COL) > 0)
    )


def compute_agg(
    base: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """The full-recompute twin of the incremental path — rollup
    bootstrap, and the oracle the property tests compare against."""
    return base.groupBy(*group_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(COUNT_COL),
    )


def refresh_groups(
    agg: DataFrame,
    base_after: DataFrame,
    group_cols: list[str],
    agg_exprs: list[Column],
    affected: DataFrame,
) -> DataFrame:
    """Affected-group recompute — the bounded fallback for aggregates
    deltas cannot maintain (min/max/distinct under deletes). Rescans
    ONLY the groups in ``affected`` (broadcast semi-join prunes the
    base map-side) and splices the recomputed rows over the stale ones.
    ``agg_exprs`` must alias every output column."""
    aff = F.broadcast(affected.select(*group_cols).distinct())
    recomputed = (
        base_after.join(aff, on=group_cols, how="left_semi")
        .groupBy(*group_cols)
        .agg(*agg_exprs)
    )
    kept = agg.join(aff, on=group_cols, how="left_anti")
    return kept.unionByName(recomputed)


def maintain_agg_snapshot(
    spark: SparkSession,
    base_path: str,
    agg_path: str,
    changes: DataFrame,
    keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    seq_col: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    **merge_kw,
) -> dict:
    """Apply a change batch to the snapshot base table AND its rollup in
    one call: old images from base@current (partition-pruned to the
    batch's touched partitions), :func:`~.snapshots.snapshot_merge` on
    the base, delta fold into the rollup, rollup committed as its own
    snapshot version. Returns both new versions.

    The rollup bootstraps on first call (full recompute of the merged
    base — the only full scan this function ever does, once per rollup
    lifetime).
    """
    base_before = read_snapshot(spark, base_path)
    if partition_col is not None:
        touched = [
            r[0]
            for r in latest_changes(changes, keys, seq_col, delete_col)
            .select(partition_col)
            .distinct()
            .collect()
        ]
        base_before = base_before.filter(F.col(partition_col).isin(touched))
    # no checkpoint needed: base_before is bound to the CURRENT
    # manifest's immutable files, and snapshot_merge only ADDS files —
    # the pre-merge view stays valid right through the merge. This is
    # snapshot isolation doing the work a cache/checkpoint would
    # otherwise have to (CoW-replace would yank these files mid-plan).
    merge_stats = snapshot_merge(
        spark, base_path, changes, keys, seq_col,
        delete_col=delete_col, **merge_kw,
    )
    try:
        agg_before = read_snapshot(spark, agg_path)
    except FileNotFoundError:
        agg_before = None
    if agg_before is not None:
        delta = agg_delta(
            base_before, changes, keys, group_cols, sum_cols, seq_col,
            delete_col,
        )
        agg_after = apply_agg_delta(agg_before, delta, group_cols, sum_cols)
        op = "incremental"
    else:
        agg_after = compute_agg(
            read_snapshot(spark, base_path), group_cols, sum_cols
        )
        op = "bootstrap"
    agg_version = snapshot_commit(spark, agg_path, agg_after)
    return {
        "base_version": merge_stats["version"],
        "agg_version": agg_version,
        "agg_op": op,
    }
