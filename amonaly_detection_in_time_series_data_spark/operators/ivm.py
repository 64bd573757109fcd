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
snapshot layer: old images are time-traveled from the base version the
ROLLUP's manifest records as its consistent cut, the batch lands via
:func:`~.snapshots.snapshot_merge`, the delta folds into the rollup,
and the rollup commits with the new cut in its manifest meta — giving
exactly-once EFFECT under foreachBatch redelivery, including the
crashed-between-the-two-commits window (see the function docstring).

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
    snapshot_manifest,
    snapshot_merge,
)

__all__ = [
    "agg_delta",
    "apply_agg_delta",
    "compute_agg",
    "refresh_groups",
    "refresh_groups_with",
    "maintain_agg_snapshot",
    "maintain_agg_sink",
    "basket_pairs_delta",
    "compute_basket_pairs",
    "maintain_basket_snapshot",
    "maintain_basket_sink",
    "maintain_hll_snapshot",
    "maintain_kmv_snapshot",
    "maintain_hll_sink",
    "maintain_kmv_sink",
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
    ``agg_exprs`` must alias every output column.

    Both splice joins are NULL-SAFE on the group columns: a NULL group
    value is one group (exactly as groupBy treats it), so it must
    refresh and anti-match like any other — plain equi-join semantics
    would never recompute the NULL group and never retire its stale
    row. ``eqNullSafe`` keys still hash-join, so the broadcast prune
    is unchanged."""
    return refresh_groups_with(
        agg,
        base_after,
        group_cols,
        lambda pruned: pruned.groupBy(*group_cols).agg(*agg_exprs),
        affected,
    )


def refresh_groups_with(
    agg: DataFrame,
    base_after: DataFrame,
    group_cols: list[str],
    recompute_fn,
    affected: DataFrame,
) -> DataFrame:
    """:func:`refresh_groups` for recomputations that are not a single
    ``groupBy().agg()`` (e.g. the KMV build's distinct → rank-k →
    collect pipeline): ``recompute_fn`` receives the base PRUNED to the
    affected groups (broadcast null-safe semi-join) and must return a
    frame keyed by ``group_cols``; its rows are spliced over the stale
    ones (null-safe anti-join retires them)."""

    def _null_safe(left_alias: str, left: DataFrame, how: str):
        la = left.alias(left_alias)
        cond = None
        for c in group_cols:
            eq = F.col(f"{left_alias}.`{c}`").eqNullSafe(
                F.col(f"__ivm_aff.`{c}`")
            )
            cond = eq if cond is None else (cond & eq)
        return la.join(F.broadcast(aff), on=cond, how=how)

    aff = affected.select(*group_cols).distinct().alias("__ivm_aff")
    recomputed = recompute_fn(_null_safe("__ivm_base", base_after, "left_semi"))
    kept = _null_safe("__ivm_agg", agg, "left_anti")
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
    one call: old images from the base version the ROLLUP is consistent
    with (partition-pruned to the batch's touched partitions),
    :func:`~.snapshots.snapshot_merge` on the base, delta fold into the
    rollup, rollup committed with ``meta.base_version`` recording the
    cut it now reflects. Returns both new versions.

    **Exactly-once effect under redelivery**, with no cross-table
    transaction: each rollup manifest records the base version it is
    consistent with, and old images are time-traveled from THAT version
    — not from "latest". Re-delivering an already-applied batch makes
    the base merge a content-no-op and the delta literal zero (the
    batch's upserts ARE the old images at that cut). If the previous
    run crashed BETWEEN the base merge and the rollup commit, the
    rollup's recorded cut still points before that merge, so the
    redelivered batch's delta is computed against the pre-crash state
    and the rollup catches up — the torn window heals instead of
    under-counting. Both legs are snapshot commits, so a crash anywhere
    leaves only readable versions plus vacuumable orphans.

    The rollup bootstraps on first call (full recompute of the merged
    base — the only full scan this function ever does, once per rollup
    lifetime).

    **Contract on ``partition_col``: immutable per key.** The old-image
    lookup prunes the base to the batch's touched partitions; if a key's
    partition value could CHANGE between its old row and the batch, the
    old image would live in an unpruned partition and the rollup would
    double-count. Keys with NULL partition values are supported (the
    pruning predicate carries an explicit ``isNull`` branch), but the
    partition value of a key must never mutate — the same contract every
    hive-partitioned merge strategy imposes.
    """
    try:
        agg_man = snapshot_manifest(spark, agg_path)
    except FileNotFoundError:
        agg_man = None

    if agg_man is not None:
        base_cut = (agg_man.get("meta") or {}).get("base_version")
        if base_cut is None:
            raise ValueError(
                f"maintain_agg_snapshot: rollup at {agg_path} has no "
                "recorded base_version (created outside the maintainer?); "
                "delete it and let this function bootstrap it"
            )
        # snapshot isolation does the work a cache/checkpoint would:
        # this read binds to immutable files of the recorded cut and
        # stays valid right through the merge below (which only ADDS
        # files). CoW-replace would yank these files mid-plan.
        base_at_cut = read_snapshot(spark, base_path, version=base_cut)
        if partition_col is not None:
            touched = [
                r[0]
                for r in latest_changes(changes, keys, seq_col, delete_col)
                .select(partition_col)
                .distinct()
                .collect()
            ]
            # isin() never matches NULL; give NULL partition values an
            # explicit isNull branch so their old images still retract
            non_null = [v for v in touched if v is not None]
            cond = (
                F.col(partition_col).isin(non_null)
                if non_null
                else F.lit(False)
            )
            if any(v is None for v in touched):
                cond = cond | F.col(partition_col).isNull()
            base_at_cut = base_at_cut.filter(cond)
        delta = agg_delta(
            base_at_cut, changes, keys, group_cols, sum_cols, seq_col,
            delete_col,
        )

    merge_stats = snapshot_merge(
        spark, base_path, changes, keys, seq_col,
        delete_col=delete_col, **merge_kw,
    )

    if agg_man is not None:
        agg_before = read_snapshot(spark, agg_path)
        agg_after = apply_agg_delta(agg_before, delta, group_cols, sum_cols)
        op = "incremental"
    else:
        agg_after = compute_agg(
            read_snapshot(spark, base_path), group_cols, sum_cols
        )
        op = "bootstrap"
    agg_version = snapshot_commit(
        spark, agg_path, agg_after,
        meta={"base_version": merge_stats["version"]},
    )
    return {
        "base_version": merge_stats["version"],
        "agg_version": agg_version,
        "agg_op": op,
    }


def maintain_hll_snapshot(
    spark: SparkSession,
    base_path: str,
    sketch_path: str,
    changes: DataFrame,
    keys: list[str],
    group_cols: list[str],
    value_col: str,
    seq_col: str,
    delete_col: str | None = None,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
    **merge_kw,
) -> dict:
    """Maintain a per-group HLL sketch summary table
    (:mod:`~.hll`: one ``hll_sketch_agg`` binary per ``group_cols``
    group over ``value_col``) under the same CDC feed that maintains
    the base — the composition that turns the sketch operator into a
    LAKE feature: every later distinct-count rollup merges the summary
    table's sketches instead of rescanning the raw events.

    Distinct counts are the canonical NON-additive aggregate — a delete
    or update can remove a value only a rescan can find, so no delta
    folds (the reason :func:`maintain_agg_snapshot` handles sums and
    this function exists). The bounded strategy is affected-group
    recompute (:func:`refresh_groups`): rescan ONLY the groups the
    batch touched — the groups of the changed keys' OLD images (looked
    up at the sketch table's recorded base cut, same pruning as the
    additive path) plus the groups of the surviving upserts (a key that
    MIGRATES groups touches both) — over the post-merge base, and
    splice the recomputed sketches over the stale rows. Cost:
    O(batch) + a rescan of just the touched groups; never the world.

    **Exactly-once effect under redelivery**, same recorded-cut
    protocol as :func:`maintain_agg_snapshot` but strictly simpler to
    argue: the recomputed sketches are a pure function of the
    POST-merge base (no retraction arithmetic), so re-delivering an
    applied batch re-merges as a content-no-op and recomputes the same
    touched groups to identical bytes; a crash between the base merge
    and the sketch commit leaves the sketch cut pointing pre-merge, and
    the redelivered batch's old-image lookup at that cut still names
    every touched group, so the splice heals the torn window.

    Bootstraps on first call (full :func:`~.hll.hll_build` over the
    merged base — the one full scan per table lifetime). ``lg_k`` is
    recorded in the manifest meta and must not change across calls
    (sketches at mixed lg_k degrade the merge to the coarser accuracy);
    a mismatch raises. Returns
    ``{base_version, sketch_version, sketch_op}``.
    """
    from amonaly_detection_in_time_series_data_spark.operators.hll import (
        hll_build,
    )

    return _maintain_sketch_snapshot(
        spark, base_path, sketch_path, changes, keys, group_cols,
        seq_col, delete_col,
        recompute_fn=lambda base: hll_build(
            base, group_cols, value_col, lg_k, sketch_col
        ),
        meta_params={"lg_k": int(lg_k)},
        merge_kw=merge_kw,
    )


def maintain_kmv_snapshot(
    spark: SparkSession,
    base_path: str,
    sketch_path: str,
    changes: DataFrame,
    keys: list[str],
    group_cols: list[str],
    value_col: str,
    seq_col: str,
    delete_col: str | None = None,
    k: int = 256,
    hash_fn: str = "xxhash64",
    sketch_col: str = "kmv",
    **merge_kw,
) -> dict:
    """The KMV twin of :func:`maintain_hll_snapshot`: keep a per-group
    :func:`~.kmv.kmv_build` theta-sketch table in sync under the CDC
    feed — same affected-group recompute (a delete can remove one of
    the k smallest hashes, which only a rescan of that group restores),
    same recorded-cut exactly-once argument. Because the KMV rollup is
    LOSS-FREE, the maintained table answers not just rollup distinct
    counts but set intersections across its groups
    (:func:`~.kmv.kmv_intersect_estimate`) with zero base rescans.
    ``k``/``hash_fn`` are recorded in the manifest meta and must not
    change across calls. The maintained sketches equal a from-scratch
    build of the merged base ARRAY-for-array (hypothesis-pinned)."""
    from amonaly_detection_in_time_series_data_spark.operators.kmv import (
        kmv_build,
    )

    return _maintain_sketch_snapshot(
        spark, base_path, sketch_path, changes, keys, group_cols,
        seq_col, delete_col,
        recompute_fn=lambda base: kmv_build(
            base, group_cols, value_col, k, hash_fn, sketch_col
        ),
        meta_params={"k": int(k), "hash_fn": hash_fn},
        merge_kw=merge_kw,
    )


def _maintain_sketch_snapshot(
    spark: SparkSession,
    base_path: str,
    sketch_path: str,
    changes: DataFrame,
    keys: list[str],
    group_cols: list[str],
    seq_col: str,
    delete_col: str | None,
    recompute_fn,
    meta_params: dict,
    merge_kw: dict,
) -> dict:
    """Shared core of the NON-additive summary-table maintainers
    (:func:`maintain_hll_snapshot`, :func:`maintain_kmv_snapshot`):
    ``recompute_fn(base_frame) -> per-group sketch frame`` is the only
    sketch-specific piece — it runs over the FULL merged base on
    bootstrap and over the affected-groups-pruned base on refresh
    (:func:`refresh_groups_with` splices). ``meta_params`` are sketch
    parameters that change sketch VALUES; they are recorded in the
    manifest meta and a mismatch on a later call raises (mixing them
    silently degrades or breaks comparability)."""
    try:
        man = snapshot_manifest(spark, sketch_path)
    except FileNotFoundError:
        man = None

    affected = None
    if man is not None:
        meta = man.get("meta") or {}
        base_cut = meta.get("base_version")
        if base_cut is None:
            raise ValueError(
                f"sketch maintainer: sketch table at {sketch_path} has "
                "no recorded base_version (created outside the "
                "maintainer?); delete it and let this function bootstrap it"
            )
        for p, v in meta_params.items():
            if meta.get(p) is not None and meta[p] != v:
                raise ValueError(
                    f"sketch maintainer: sketch table was built with "
                    f"{p}={meta[p]}, called with {p}={v}; rebuild rather "
                    "than mixing sketch parameters"
                )
        latest = latest_changes(changes, keys, seq_col, delete_col)
        base_at_cut = read_snapshot(spark, base_path, version=base_cut)
        old_groups = base_at_cut.join(
            F.broadcast(latest.select(*keys).distinct()),
            on=keys,
            how="left_semi",
        ).select(*group_cols)
        upserts = latest
        if delete_col is not None:
            upserts = upserts.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            )
        # stays correct evaluated lazily AFTER the merge below: the
        # old-image leg binds to the recorded cut's immutable file list
        # (snapshot isolation — the merge only adds files)
        affected = (
            old_groups.unionByName(upserts.select(*group_cols)).distinct()
        )

    merge_stats = snapshot_merge(
        spark, base_path, changes, keys, seq_col,
        delete_col=delete_col, **merge_kw,
    )
    base_after = read_snapshot(spark, base_path)

    if man is not None:
        sk_before = read_snapshot(spark, sketch_path)
        sk_after = refresh_groups_with(
            sk_before, base_after, group_cols, recompute_fn, affected
        )
        op = "refresh"
    else:
        sk_after = recompute_fn(base_after)
        op = "bootstrap"
    sketch_version = snapshot_commit(
        spark, sketch_path, sk_after,
        meta={"base_version": merge_stats["version"], **meta_params},
    )
    return {
        "base_version": merge_stats["version"],
        "sketch_version": sketch_version,
        "sketch_op": op,
    }


def maintain_agg_sink(
    base_path: str,
    agg_path: str,
    keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    seq_col: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    **kw,
):
    """``foreachBatch`` adapter: every micro-batch of a CDC stream lands
    on the base table AND its rollup as consistent snapshot cuts.

    foreachBatch is at-least-once; :func:`maintain_agg_snapshot`'s
    recorded-cut protocol makes redelivery exactly-once in EFFECT even
    when the previous attempt crashed between the base merge and the
    rollup commit (the healing argument in its docstring). The base
    bootstraps from the stream schema on the first batch, the rollup
    bootstraps on its first maintain call — so one sink stands up the
    whole base+rollup pair from nothing. All base changes must flow
    through this sink (an out-of-band merge shifts the base under the
    rollup's recorded cut; the delta math then mis-retracts).
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _bootstrap_empty_base(
            batch_df, base_path, seq_col, delete_col, partition_col
        )
        maintain_agg_snapshot(
            batch_df.sparkSession, base_path, agg_path, batch_df, keys,
            group_cols, sum_cols, seq_col, delete_col=delete_col,
            partition_col=partition_col, **kw,
        )

    return apply


def _bootstrap_empty_base(
    batch_df: DataFrame,
    base_path: str,
    seq_col: str,
    delete_col: str | None,
    partition_col: str | None = None,
) -> None:
    """First-batch bootstrap shared by the foreachBatch sinks: if the
    base table does not exist yet, commit an empty snapshot whose schema
    is the stream's minus the CDC bookkeeping columns, so the first
    maintain call merges into a real (empty) base."""
    spark = batch_df.sparkSession
    from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
        _fs_and_path,
        _list_versions,
        snapshot_commit,
    )

    fs, _ = _fs_and_path(spark, base_path)
    if not _list_versions(spark, fs, base_path):
        drop = {seq_col, delete_col} - {None}
        cols = [c for c in batch_df.columns if c not in drop]
        snapshot_commit(
            spark,
            base_path,
            spark.createDataFrame([], batch_df.select(*cols).schema),
            partition_col=partition_col,
        )


def maintain_hll_sink(
    base_path: str,
    sketch_path: str,
    keys: list[str],
    group_cols: list[str],
    value_col: str,
    seq_col: str,
    delete_col: str | None = None,
    **kw,
):
    """``foreachBatch`` adapter for the HLL summary table: every
    micro-batch of a CDC stream lands on the base AND its per-group
    sketch table as consistent snapshot cuts — the streaming face of
    :func:`maintain_hll_snapshot`, exactly like :func:`maintain_agg_sink`
    is for the additive rollup.

    foreachBatch is at-least-once; the recorded-cut protocol in the
    batch maintainer makes redelivery exactly-once in EFFECT (its
    docstring carries the torn-window healing argument — for the
    non-additive class it is strictly simpler: recomputed sketches are
    a pure function of the post-merge base). The base bootstraps from
    the stream schema on the first batch; the sketch table bootstraps
    on its first maintain call. All base changes must flow through this
    sink (an out-of-band merge shifts the base under the sketch table's
    recorded cut)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _bootstrap_empty_base(batch_df, base_path, seq_col, delete_col)
        maintain_hll_snapshot(
            batch_df.sparkSession, base_path, sketch_path, batch_df,
            keys, group_cols, value_col, seq_col,
            delete_col=delete_col, **kw,
        )

    return apply


def maintain_kmv_sink(
    base_path: str,
    sketch_path: str,
    keys: list[str],
    group_cols: list[str],
    value_col: str,
    seq_col: str,
    delete_col: str | None = None,
    **kw,
):
    """``foreachBatch`` adapter for the KMV theta-sketch summary table —
    the streaming face of :func:`maintain_kmv_snapshot`; see
    :func:`maintain_hll_sink` for the at-least-once / recorded-cut
    exactly-once argument, identical here. Because the KMV rollup is
    loss-free, the continuously maintained table keeps answering set
    intersections across its groups with zero base rescans."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _bootstrap_empty_base(batch_df, base_path, seq_col, delete_col)
        maintain_kmv_snapshot(
            batch_df.sparkSession, base_path, sketch_path, batch_df,
            keys, group_cols, value_col, seq_col,
            delete_col=delete_col, **kw,
        )

    return apply


# ---------------------------------------------------------------------------
# self-join views (r11): the basket pair-count view
# ---------------------------------------------------------------------------
#
# A third IVM class beyond additive columns and non-additive sketches:
# views built from a SELF-JOIN of the base (here the Apriori-k=2 pair
# counts behind operators.product_analytics.basket_rules). A pair's
# count spans MANY baskets, so affected-group splice by the view key
# (the pair) would lose contributions from untouched baskets — the
# correct decomposition is by the JOIN key instead: pair_n is a sum of
# per-BASKET indicator terms, so recompute the terms of TOUCHED baskets
# only (old contents retracted, new contents inserted) and fold the
# result additively into the view. Cost: O(touched baskets x k^2),
# never a base rescan — the delta form of ΔA⋈A + A⋈ΔA + ΔA⋈ΔA
# specialized to the within-group pair triangle.


def _basket_pair_rows(rows: DataFrame, basket_col: str, item_col: str):
    """One row per (basket, item_a < item_b) under basket-presence
    semantics — the per-basket terms of the pair-count view."""
    b = (
        rows.select(
            F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
        )
        .filter(F.col("__bk").isNotNull() & F.col("__it").isNotNull())
        .distinct()
    )
    lhs = b.select("__bk", F.col("__it").alias("item_a"))
    rhs = b.select("__bk", F.col("__it").alias("item_b"))
    return lhs.join(rhs, "__bk").filter(F.col("item_a") < F.col("item_b"))


def compute_basket_pairs(
    base: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Full-recompute twin of the pair view (bootstrap + test oracle):
    ``(item_a, item_b, __n_rows = co-occurrence basket count)``."""
    return (
        _basket_pair_rows(base, basket_col, item_col)
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias(COUNT_COL))
    )


def basket_pairs_delta(
    base_before: DataFrame,
    changes: DataFrame,
    basket_col: str,
    item_col: str,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """The pair-count delta a change batch induces. Touched baskets =
    baskets of the batch's upserts UNION baskets of the old images of
    every changed key (so an item MOVING between baskets retracts from
    its old basket and lands in the new one). For those baskets the old
    contents' pair terms are retracted (-1) and the post-batch
    contents' terms inserted (+1); one groupBy nets the delta. All
    batch-derived sides are broadcast."""
    latest = latest_changes(changes, keys, seq_col, delete_col)
    chg_keys = latest.select(*keys).distinct()
    old_images = base_before.join(F.broadcast(chg_keys), keys, "left_semi")
    upserts = latest
    if delete_col is not None:
        upserts = upserts.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    touched = (
        old_images.select(F.col(basket_col).alias("__tb"))
        .unionByName(upserts.select(F.col(basket_col).alias("__tb")))
        .filter(F.col("__tb").isNotNull())
        .distinct()
    )
    old_rows = base_before.join(
        F.broadcast(touched),
        base_before[basket_col] == F.col("__tb"),
        "left_semi",
    )
    new_rows = (
        old_rows.join(F.broadcast(chg_keys), keys, "left_anti")
        .select(basket_col, item_col)
        .unionByName(upserts.select(basket_col, item_col))
    )

    def signed(rows: DataFrame, sign: int) -> DataFrame:
        return _basket_pair_rows(rows, basket_col, item_col).select(
            "item_a", "item_b", F.lit(sign).alias(COUNT_COL)
        )

    return (
        signed(old_rows, -1)
        .unionByName(signed(new_rows, 1))
        .groupBy("item_a", "item_b")
        .agg(F.sum(COUNT_COL).alias(COUNT_COL))
    )


def maintain_basket_snapshot(
    spark: SparkSession,
    base_path: str,
    pairs_path: str,
    changes: DataFrame,
    keys: list[str],
    basket_col: str,
    item_col: str,
    seq_col: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    **merge_kw,
) -> dict:
    """Maintain the pair-count view under the CDC feed with the SAME
    recorded-cut protocol as :func:`maintain_agg_snapshot` (old state
    time-traveled from the view's recorded base version; base merge;
    delta fold; view committed with the new cut — exactly-once EFFECT
    under redelivery, torn window heals; see that docstring).

    ``partition_col`` contract is STRICTER here: it must be immutable
    per key AND constant per basket (e.g. a basket-date partition) —
    the delta needs the touched baskets' FULL old contents, so pruning
    to the batch's partitions is only sound when a basket never spans
    partitions. Pass None (semi-join pruning only) otherwise.
    """
    try:
        pairs_man = snapshot_manifest(spark, pairs_path)
    except FileNotFoundError:
        pairs_man = None

    if pairs_man is not None:
        base_cut = (pairs_man.get("meta") or {}).get("base_version")
        if base_cut is None:
            raise ValueError(
                f"maintain_basket_snapshot: view at {pairs_path} has no "
                "recorded base_version (created outside the maintainer?); "
                "delete it and let this function bootstrap it"
            )
        base_at_cut = read_snapshot(spark, base_path, version=base_cut)
        if partition_col is not None:
            touched = [
                r[0]
                for r in latest_changes(changes, keys, seq_col, delete_col)
                .select(partition_col)
                .distinct()
                .collect()
            ]
            non_null = [v for v in touched if v is not None]
            cond = (
                F.col(partition_col).isin(non_null)
                if non_null
                else F.lit(False)
            )
            if any(v is None for v in touched):
                cond = cond | F.col(partition_col).isNull()
            base_at_cut = base_at_cut.filter(cond)
        delta = basket_pairs_delta(
            base_at_cut, changes, basket_col, item_col, keys, seq_col,
            delete_col,
        )

    merge_stats = snapshot_merge(
        spark, base_path, changes, keys, seq_col,
        delete_col=delete_col, **merge_kw,
    )

    if pairs_man is not None:
        pairs_before = read_snapshot(spark, pairs_path)
        pairs_after = apply_agg_delta(
            pairs_before, delta, ["item_a", "item_b"], []
        )
        op = "incremental"
    else:
        pairs_after = compute_basket_pairs(
            read_snapshot(spark, base_path), basket_col, item_col
        )
        op = "bootstrap"
    pairs_version = snapshot_commit(
        spark, pairs_path, pairs_after,
        meta={"base_version": merge_stats["version"]},
    )
    return {
        "base_version": merge_stats["version"],
        "pairs_version": pairs_version,
        "pairs_op": op,
    }


def maintain_basket_sink(
    base_path: str,
    pairs_path: str,
    keys: list[str],
    basket_col: str,
    item_col: str,
    seq_col: str,
    delete_col: str | None = None,
    **kw,
):
    """``foreachBatch`` adapter for the basket pair-count view — the
    streaming face of :func:`maintain_basket_snapshot`, completing the
    sink family (additive rollup / HLL / KMV / self-join view). Same
    at-least-once + recorded-cut exactly-once argument as
    :func:`maintain_agg_sink`; the self-join delta is computed against
    the view's recorded base cut, so a redelivered batch retracts and
    re-inserts identical per-basket terms and nets zero. All base
    changes must flow through this sink."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _bootstrap_empty_base(batch_df, base_path, seq_col, delete_col)
        maintain_basket_snapshot(
            batch_df.sparkSession, base_path, pairs_path, batch_df,
            keys, basket_col, item_col, seq_col,
            delete_col=delete_col, **kw,
        )

    return apply
