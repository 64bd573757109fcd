"""CDC merge / upsert: apply a change batch to a parquet table with
copy-on-write semantics, rewriting ONLY the partitions the batch
touches.

The reference pipeline re-reads its whole CSV per run; a 100 TB lake
cannot. The operational loop there is MERGE: a small change batch
(inserts + updates + deletes, e.g. from a CDC feed or a corrected
upstream extract) applied onto a large partitioned table. Table formats
(Delta/Iceberg/Hudi) do this with metadata transactions; this operator
implements the portable copy-on-write core on plain parquet:

    changes -> latest-per-key collapse (last-writer-wins by seq_col)
            -> touched partition values (tiny distinct + collect)
    target  -> scan ONLY touched partitions (partition-pruned)
            -> anti-join out rows whose key appears in the batch
    merged  = survivors UNION (non-delete latest changes)
    write   -> staging dir -> per-partition directory swap

**Semantics** (Delta ``MERGE`` for the CDC-apply case):

- the batch is collapsed to ONE action per key: highest ``seq_col``
  wins; on a seq tie a delete beats an upsert (deterministic).
- a key's latest action ``delete_col = true``  -> row removed,
- otherwise -> row replaced if the key exists, inserted if not.
- re-applying the same batch is a no-op (idempotent) — the retry
  contract a crashed orchestrator needs.

**Scale (100 TB table, MB..GB batch).** The target side is never
shuffled: only touched partitions are scanned (``partition_col``
pruning reaches the file listing), and the batch's keys are hash-joined
as the BROADCAST build side of a left-anti join, so the rewrite is a
map-only pass over exactly the partitions being replaced. Untouched
partitions are untouched on DISK too (asserted byte-for-byte in tests)
— cost scales with the batch's partition footprint, not table size.
The only driver-side materialization is the list of touched partition
VALUES (bounded by ``max_touched_partitions``, the same mega-guard
shape as ``max_bucket_size`` in the LSH pairing: a batch touching
every partition of a 100 TB table should be an explicit full rewrite,
not an accidental one). The swap is one filesystem rename per touched
partition — atomic per partition on HDFS; on S3 use a manifest/table
format for multi-partition atomicity (documented trade, same as Hive's
dynamic-partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
    _fs_and_path,
)

__all__ = [
    "latest_changes",
    "merged_view",
    "merge_changes",
    "scd2_apply",
    "cdc_merge_sink",
]


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Collapse a change batch to the final action per key.

    Last-writer-wins by ``seq_col``; on a seq tie a delete outranks an
    upsert so replay order cannot resurrect a deleted row; a residual
    tie (two upserts with the same key and seq — a malformed feed, but
    one that must not behave randomly) is broken by a hash of the full
    row, so the winner is a pure function of the DATA, never of the
    partitioning. One window shuffle over the BATCH only (the batch is
    the small side by assumption; the target table never enters this
    exchange).
    """
    order = [F.col(seq_col).desc()]
    if delete_col is not None:
        order.append(F.col(delete_col).desc_nulls_last())
    order.append(F.xxhash64(*[F.col(c) for c in changes.columns]).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merged_view(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """The merged result as a DataFrame (no I/O): target rows whose key
    is absent from the batch, plus the batch's surviving upserts
    projected to the target's columns.

    The anti-join build side is ``broadcast(latest keys)`` — the target
    side stays map-only, no target shuffle. Callers that manage their
    own storage can write this view however they like;
    :func:`merge_changes` wraps it with partition-scoped copy-on-write.
    """
    latest = latest_changes(changes, keys, seq_col, delete_col)
    survivors = target.join(
        F.broadcast(latest.select(*keys)), on=keys, how="left_anti"
    )
    upserts = latest
    if delete_col is not None:
        upserts = upserts.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        )
    upserts = upserts.select(*target.columns)
    return survivors.unionByName(upserts)


def scd2_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension **Type 2** apply: history-preserving —
    where :func:`merged_view` REPLACES a key's row (Type 1), this closes
    the key's current version and appends the new one, so every past
    state stays queryable (``AS OF`` = ``valid_from <= x AND (valid_to
    IS NULL OR valid_to > x)``).

    ``target`` rows carry ``valid_from_col``/``valid_to_col``
    (``valid_to IS NULL`` = current version). Per key's LATEST change
    (same last-writer-wins collapse as :func:`merged_view`):

    - upsert → the current row (if any) is closed with ``valid_to =``
      the change's ``seq_col`` value and a new current version is
      appended (``valid_from = seq``, ``valid_to = NULL``);
    - delete → the current row is closed, nothing appended.

    Already-closed history rows pass through untouched. ``seq_col`` is
    the version axis — use an event-time column when validity should be
    wall-clock time. Topology matches :func:`merged_view`: the batch
    collapses in one small window, then rides ONE broadcast into a
    map-only pass over the target — no target shuffle. Storage-side,
    compose with :func:`merge_changes`'s staging/swap or plain append +
    rewrite of the current-version partition (a ``valid_to IS NULL``
    partition flag keeps the close step copy-on-write-cheap).
    """
    latest = latest_changes(changes, keys, seq_col, delete_col)
    close_info = F.broadcast(
        latest.select(*keys, F.col(seq_col).alias("__close_seq"))
    )
    is_current = F.col(valid_to_col).isNull()
    closed_or_passing = (
        target.join(close_info, on=keys, how="left")
        .withColumn(
            valid_to_col,
            F.when(
                is_current & F.col("__close_seq").isNotNull(),
                F.col("__close_seq").cast(target.schema[valid_to_col].dataType),
            ).otherwise(F.col(valid_to_col)),
        )
        .drop("__close_seq")
    )
    new_versions = latest
    if delete_col is not None:
        new_versions = new_versions.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        )
    data_cols = [
        c for c in target.columns if c not in (valid_from_col, valid_to_col)
    ]
    new_versions = new_versions.select(
        *data_cols,
        F.col(seq_col)
        .cast(target.schema[valid_from_col].dataType)
        .alias(valid_from_col),
        F.lit(None).cast(target.schema[valid_to_col].dataType)
        .alias(valid_to_col),
    ).select(*target.columns)
    return closed_or_passing.unionByName(new_versions)


def scd2_as_of(
    df: DataFrame,
    version,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Time-travel over an SCD2 table: the row version of each key that
    was current AS OF ``version`` (same axis as :func:`scd2_apply`'s
    ``seq_col``). Map-only; on a table partitioned/clustered by the
    validity columns the two range predicates prune at the scan."""
    return df.filter(
        (F.col(valid_from_col) <= F.lit(version))
        & (F.col(valid_to_col).isNull() | (F.col(valid_to_col) > F.lit(version)))
    )


def merge_changes(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    max_touched_partitions: int = 1024,
    fmt: str = "parquet",
) -> dict:
    """Apply ``changes`` onto the table at ``table_path`` in place,
    rewriting only touched partitions; returns merge stats.

    ``partition_col``: the table's on-disk partition column
    (``partitionBy`` at write time). When set, only partitions present
    in the batch are read, rewritten to a staging directory, and swapped
    in; every other partition directory is not even listed. When None,
    the whole table is rewritten through staging (correct, but the
    copy-on-write benefit is gone — partition your table).

    **Contract: a key's partition value must be stable.** The pruned
    scan only sees the partitions the batch names, so an upsert that
    MOVES a key to a new partition would leave the stale row in the old
    partition untouched (the standard copy-on-write hazard — scanning
    the whole table to rule it out would defeat the pruning). Express a
    partition move as delete(old partition) + insert(new partition) in
    the same batch; both partitions are then touched and rewritten.
    """
    fs, jtable = _fs_and_path(spark, table_path)
    latest = latest_changes(changes, keys, seq_col, delete_col)

    def _read_target():
        # a prior batch of pure deletes can legitimately empty every
        # partition (only _SUCCESS / empty dirs remain -> schema
        # inference fails). That is the ONLY case allowed to fall back
        # to an empty table: merge rewrites-and-swaps the touched
        # partitions, so swallowing a transient read failure (perms,
        # corrupt footer, flaky FS) would silently destroy every
        # surviving row in them. Decide emptiness from the filesystem,
        # not from which exception the reader happened to raise.
        def _has_data_file(jpath):
            for st in fs.listStatus(jpath):
                name = st.getPath().getName()
                if st.isDirectory():
                    if _has_data_file(st.getPath()):
                        return True
                elif not (name.startswith("_") or name.startswith(".")):
                    return True
            return False

        if not fs.exists(jtable) or not _has_data_file(jtable):
            drop = {seq_col, delete_col} - {None}
            data_cols = [c for c in changes.columns if c not in drop]
            return spark.createDataFrame([], changes.select(*data_cols).schema)
        return spark.read.format(fmt).load(table_path)

    if partition_col is not None:
        touched_rows = latest.select(partition_col).distinct().collect()
        touched = sorted(r[0] for r in touched_rows)
        if len(touched) > max_touched_partitions:
            raise ValueError(
                f"merge_changes: batch touches {len(touched)} partitions "
                f"(> max_touched_partitions={max_touched_partitions}); "
                "a near-full rewrite should be an explicit compact/"
                "rewrite job, not an accidental merge"
            )
        target = _read_target().filter(F.col(partition_col).isin(touched))
    else:
        touched = None
        target = _read_target()

    merged = merged_view(target, changes, keys, seq_col, delete_col)

    staging = table_path.rstrip("/") + "_merge_staging"
    jstaging = spark._jvm.org.apache.hadoop.fs.Path(staging)
    if fs.exists(jstaging):  # leftover from a crashed merge: recompute
        fs.delete(jstaging, True)
    writer = merged.write.mode("overwrite").format(fmt)
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.save(staging)

    # swap: one rename per touched partition (atomic per partition on
    # HDFS-like filesystems). Non-partitioned: swap the whole table dir.
    Path = spark._jvm.org.apache.hadoop.fs.Path
    if partition_col is not None:
        for v in touched:
            part = f"{partition_col}={v}"
            dst = Path(jtable, part)
            src = Path(jstaging, part)
            if fs.exists(dst):
                fs.delete(dst, True)
            if fs.exists(src):  # a batch of pure deletes may empty it
                fs.rename(src, dst)
        fs.delete(jstaging, True)
    else:
        fs.delete(jtable, True)
        fs.rename(jstaging, jtable)

    stats = {
        "touched_partitions": len(touched) if touched is not None else None,
        "batch_rows": changes.count(),
    }
    return stats


def cdc_merge_sink(
    table_path: str,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    stats_index_path: str | None = None,
    stats_cols: list[str] | None = None,
    **kw,
):
    """``foreachBatch`` adapter: apply each micro-batch of a CDC change
    stream onto the table via :func:`merge_changes`.

        (changes.writeStream
            .foreachBatch(cdc_merge_sink(table, ["k"], "seq",
                                         delete_col="deleted",
                                         partition_col="day"))
            .option("checkpointLocation", ckpt).start())

    foreachBatch's delivery contract is at-least-once: a crashed batch
    is redelivered. :func:`merge_changes` is idempotent (re-applying a
    batch is a no-op — tested), so redelivery converges to the same
    table state: exactly-once EFFECTIVE without any sink-side
    transaction log. Ordering across micro-batches is the stream's
    ordering; within and across redelivered batches, last-writer-wins
    by ``seq_col`` makes the merge insensitive to replay interleaving
    for keys carrying distinct sequence numbers.

    ``stats_index_path`` + ``stats_cols``: after each merge, upsert the
    persisted :func:`~.maintenance.file_stats_index` for the files the
    merge rewrote (new files gain rows, replaced files drop out) —
    O(touched partition files), never a table rescan.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_changes(
            batch_df.sparkSession, table_path, batch_df, keys, seq_col,
            delete_col=delete_col, partition_col=partition_col, **kw,
        )
        if stats_index_path is not None:
            from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
                file_stats_index_update,
            )

            file_stats_index_update(
                batch_df.sparkSession, table_path, stats_cols or [],
                stats_index_path,
            )

    return apply
