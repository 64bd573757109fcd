"""Snapshot-versioned tables: manifest commits, time travel, vacuum.

:func:`~.cdc.merge_changes` gives copy-on-write merges but REPLACES the
touched partition directories — the previous table state is gone the
moment the swap lands, and a reader that started before the swap can
lose files mid-scan. Table formats (Delta/Iceberg/Hudi) fix both with
one idea: data files are IMMUTABLE, and a tiny metadata commit — the
manifest — names the set of files that constitutes each table version.
This module is that idea on plain parquet, format-agnostic:

    table/
      _manifests/v00000001.json   one JSON per committed version:
                                  {"version", "op", "files": [...],
                                   "schema", "partition_col"}
      data/<part_col>=<v>/s00000001-part-*.parquet
                                  immutable data files; the commit that
                                  added a file is burned into its name

- **Commit** = write new files + write manifest vN+1 (staging write,
  then one atomic rename of the manifest file — the manifest IS the
  transaction; a crash before the rename leaves vN intact and only
  orphan data files, which vacuum collects).
- **Snapshot isolation / time travel**: a reader binds to one
  manifest's file list; concurrent commits never touch those files, so
  the read is stable, and any retained version is readable forever
  (``read_snapshot(version=3)``).
- **Merge** (:func:`snapshot_merge`) reuses the CDC collapse
  (:func:`~.cdc.latest_changes` / :func:`~.cdc.merged_view`): only
  touched partitions are rescanned and rewritten as NEW files; the new
  manifest carries every untouched file FORWARD BY NAME. Cost scales
  with the batch's partition footprint, exactly like ``merge_changes``
  — plus old versions stay readable.
- **Vacuum** deletes files referenced by no retained manifest — the
  explicit, bounded-retention step that CoW-swap does implicitly and
  irrevocably.

**Scale.** Manifest size is O(files of one version) — at 100 TB /
256 MB files that is ~400k paths, a few tens of MB of JSON: driver-side
metadata, same order as the file listing every planner already holds.
Reads hand Spark the explicit file list (no directory listing at all —
on S3 that alone is the win) with ``basePath`` so hive-style partition
columns still materialize. Single-writer is assumed (commits are
sequential versions); multi-writer needs a log-store/CAS on the
manifest rename, the same boundary Delta draws on S3.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from amonaly_detection_in_time_series_data_spark.operators.cdc import (
    latest_changes,
    merged_view,
)
from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
    _fs_and_path,
)

__all__ = [
    "snapshot_commit",
    "snapshot_merge",
    "snapshot_merge_sink",
    "read_snapshot",
    "snapshot_manifest",
    "snapshot_history",
    "snapshot_diff",
    "vacuum_snapshots",
]

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _jpath(spark: SparkSession, *parts: str):
    return spark._jvm.org.apache.hadoop.fs.Path("/".join(parts))


def _write_text_atomic(spark: SparkSession, fs, path: str, text: str) -> None:
    """Write-then-rename so the manifest appears atomically or not at
    all (rename is atomic on HDFS-like filesystems)."""
    tmp, dst = _jpath(spark, path + ".tmp"), _jpath(spark, path)
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"snapshot: manifest rename failed for {path}")


def _read_text(spark: SparkSession, fs, path: str) -> str:
    stream = fs.open(_jpath(spark, path))
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def _list_versions(spark: SparkSession, fs, table_path: str) -> list[int]:
    mdir = _jpath(spark, table_path, _MANIFEST_DIR)
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _manifest_path(table_path: str, version: int) -> str:
    return f"{table_path.rstrip('/')}/{_MANIFEST_DIR}/v{version:08d}.json"


def _load_manifest(spark: SparkSession, fs, table_path: str, version: int) -> dict:
    path = _manifest_path(table_path, version)
    if not fs.exists(_jpath(spark, path)):
        have = _list_versions(spark, fs, table_path)
        raise FileNotFoundError(
            f"snapshot: version {version} of {table_path} does not exist "
            f"(retained versions: {have}) — it may have been vacuumed"
        )
    return json.loads(_read_text(spark, fs, path))


def _collect_data_files(fs, jdir) -> list:
    """All data-file Paths under ``jdir`` (recursive), metadata excluded."""
    out = []
    if not fs.exists(jdir):
        return out
    it = fs.listFiles(jdir, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append(st.getPath())
    return out


def _adopt_staging_files(
    spark: SparkSession, fs, staging: str, table_path: str, version: int
) -> list[str]:
    """Move the staging write's data files into ``table/data/``, burning
    the commit version into each file name (immutability by
    construction: no later commit can produce the same name). Returns
    the adopted files' table-relative paths."""
    jstaging = _jpath(spark, staging)
    jdata = _jpath(spark, table_path, _DATA_DIR)
    staging_uri = jstaging.toUri().getPath()
    rel_files = []
    for src in _collect_data_files(fs, jstaging):
        rel = src.toUri().getPath()[len(staging_uri) :].lstrip("/")
        parts = rel.split("/")
        parts[-1] = f"s{version:08d}-{parts[-1]}"
        rel_dst = "/".join(parts)
        dst = _jpath(spark, table_path, _DATA_DIR, rel_dst)
        fs.mkdirs(dst.getParent())
        if not fs.rename(src, dst):
            raise IOError(f"snapshot: failed to adopt {rel} into {jdata}")
        rel_files.append(f"{_DATA_DIR}/{rel_dst}")
    fs.delete(jstaging, True)
    return sorted(rel_files)


def _touched_partition_dirs(
    spark: SparkSession, fs, root: str, latest: DataFrame,
    partition_col: str, fmt: str,
) -> list[str]:
    """Hive-escaped directory names (``col=value``) for the partitions a
    collapsed batch touches. Derived from an actual partitioned Spark
    write of the distinct values — NOT from Python string formatting —
    so NULL (``__HIVE_DEFAULT_PARTITION__``), booleans (``true`` vs
    Python ``True``), and %%-escaped special characters classify exactly
    as the real staged write lays them out. Cost: one tiny probe write,
    one row per touched partition (bounded by ``max_touched_partitions``
    at the caller)."""
    probe = root + "_probe_touched"
    (
        latest.select(partition_col).distinct()
        .withColumn("__one", F.lit(1))
        .write.mode("overwrite").partitionBy(partition_col).format(fmt)
        .save(probe)
    )
    jprobe = _jpath(spark, probe)
    dirs = sorted(
        st.getPath().getName()
        for st in fs.listStatus(jprobe)
        if st.isDirectory()
        and "=" in st.getPath().getName()
        and not st.getPath().getName().startswith(("_", "."))
    )
    fs.delete(jprobe, True)
    return dirs


def _commit(
    spark: SparkSession,
    fs,
    table_path: str,
    files: list[str],
    schema_json: str,
    partition_col: str | None,
    op: str,
    meta: dict | None = None,
) -> int:
    versions = _list_versions(spark, fs, table_path)
    version = (versions[-1] if versions else 0) + 1
    manifest = {
        "version": version,
        "op": op,
        "files": files,
        "schema": schema_json,
        "partition_col": partition_col,
        "meta": meta or {},
    }
    _write_text_atomic(
        spark, fs, _manifest_path(table_path, version), json.dumps(manifest)
    )
    return version


def snapshot_commit(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    mode: str = "overwrite",
    partition_col: str | None = None,
    fmt: str = "parquet",
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the next table version; returns the version.

    ``overwrite``: the new version is exactly these files (prior
    versions remain readable until vacuumed). ``append``: the new
    version carries the previous version's files plus these. Partition
    layout is fixed at table creation (hive-style ``col=value`` dirs);
    later commits must pass the same ``partition_col``. ``meta`` is an
    arbitrary JSON-able dict stored in the manifest — the hook
    cross-table consistency protocols hang their bookkeeping on (IVM
    records the base version each rollup commit is consistent with).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"snapshot_commit: unknown mode {mode!r}")
    fs, _ = _fs_and_path(spark, table_path)
    versions = _list_versions(spark, fs, table_path)
    prev = _load_manifest(spark, fs, table_path, versions[-1]) if versions else None
    if prev is not None and prev["partition_col"] != partition_col:
        raise ValueError(
            f"snapshot_commit: table is partitioned by "
            f"{prev['partition_col']!r}, got {partition_col!r}"
        )
    version = (versions[-1] if versions else 0) + 1
    staging = table_path.rstrip("/") + f"_staging_v{version:08d}"
    writer = df.write.mode("overwrite").format(fmt)
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.save(staging)
    files = _adopt_staging_files(spark, fs, staging, table_path, version)
    if mode == "append" and prev is not None:
        files = sorted(set(prev["files"]) | set(files))
    return _commit(
        spark, fs, table_path, files, df.schema.json(), partition_col, mode,
        meta=meta,
    )


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """The table as of ``version`` (default: latest). Binds to that
    manifest's explicit file list — no directory listing, and
    concurrent commits cannot disturb the scan."""
    fs, _ = _fs_and_path(spark, table_path)
    if version is None:
        versions = _list_versions(spark, fs, table_path)
        if not versions:
            raise FileNotFoundError(f"snapshot: no versions at {table_path}")
        version = versions[-1]
    man = _load_manifest(spark, fs, table_path, version)
    if not man["files"]:
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(man["schema"]))
        )
    root = table_path.rstrip("/")
    reader = spark.read.format(fmt)
    if man["partition_col"] is not None:
        reader = reader.option("basePath", f"{root}/{_DATA_DIR}")
    return reader.load([f"{root}/{f}" for f in man["files"]])


def snapshot_merge(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
    max_touched_partitions: int = 1024,
    fmt: str = "parquet",
) -> dict:
    """CDC merge as a snapshot commit: same semantics as
    :func:`~.cdc.merge_changes` (last-writer-wins by ``seq_col``, seq-tie
    delete-beats-upsert, idempotent replay), but non-destructive — the
    previous version stays readable, and partial failure can never lose
    rows because nothing is deleted or renamed away, only added.

    Touched partitions are identified from the collapsed batch, their
    FILES (by manifest path prefix — no listing, no scan) are re-read,
    merged, and rewritten as new files; every untouched file is carried
    forward by name into the new manifest. Cost: one scan+write of the
    touched partition footprint + one manifest write.
    """
    fs, _ = _fs_and_path(spark, table_path)
    versions = _list_versions(spark, fs, table_path)
    if not versions:
        raise FileNotFoundError(
            f"snapshot_merge: no table at {table_path}; snapshot_commit first"
        )
    man = _load_manifest(spark, fs, table_path, versions[-1])
    partition_col = man["partition_col"]
    root = table_path.rstrip("/")
    schema = StructType.fromJson(json.loads(man["schema"]))
    latest = latest_changes(changes, keys, seq_col, delete_col)

    if partition_col is not None:
        touched = _touched_partition_dirs(
            spark, fs, root, latest, partition_col, fmt
        )
        if len(touched) > max_touched_partitions:
            raise ValueError(
                f"snapshot_merge: batch touches {len(touched)} partitions "
                f"(> max_touched_partitions={max_touched_partitions}); "
                "run an explicit rewrite instead"
            )
        prefixes = tuple(f"{_DATA_DIR}/{d}/" for d in touched)
        touched_files = [f for f in man["files"] if f.startswith(prefixes)]
        untouched_files = [f for f in man["files"] if not f.startswith(prefixes)]
    else:
        touched = None
        touched_files, untouched_files = list(man["files"]), []

    if touched_files:
        reader = spark.read.format(fmt)
        if partition_col is not None:
            reader = reader.option("basePath", f"{root}/{_DATA_DIR}")
        target = reader.load([f"{root}/{f}" for f in touched_files])
    else:
        target = spark.createDataFrame([], schema)

    merged = merged_view(target, changes, keys, seq_col, delete_col)

    version = versions[-1] + 1
    staging = root + f"_staging_v{version:08d}"
    writer = merged.write.mode("overwrite").format(fmt)
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.save(staging)
    new_files = _adopt_staging_files(spark, fs, staging, table_path, version)
    all_files = sorted(set(untouched_files) | set(new_files))
    v = _commit(
        spark, fs, table_path, all_files, man["schema"], partition_col, "merge"
    )
    return {
        "version": v,
        "touched_partitions": len(touched) if touched is not None else None,
        "rewritten_files": len(touched_files),
        "new_files": len(new_files),
        "carried_files": len(untouched_files),
    }


def snapshot_merge_sink(
    table_path: str,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    **kw,
):
    """``foreachBatch`` adapter: apply each micro-batch of a CDC stream
    as a snapshot-versioned merge — the streaming twin of
    :func:`~.cdc.cdc_merge_sink`, with versioned history instead of
    in-place swaps. Same exactly-once-EFFECT argument: redelivery of a
    crashed batch re-merges idempotently (the redundant version has
    identical content), and readers never see a torn table because
    every version is an atomic manifest. First batch bootstraps the
    table (upserts only, via an empty-schema commit then merge)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fs, _ = _fs_and_path(spark, table_path)
        if not _list_versions(spark, fs, table_path):
            drop = {seq_col, delete_col} - {None}
            cols = [c for c in batch_df.columns if c not in drop]
            snapshot_commit(
                spark,
                table_path,
                spark.createDataFrame([], batch_df.select(*cols).schema),
                partition_col=partition_col,
            )
        snapshot_merge(
            spark, table_path, batch_df, keys, seq_col,
            delete_col=delete_col, **kw,
        )

    return apply


def snapshot_manifest(
    spark: SparkSession, table_path: str, version: int | None = None
) -> dict:
    """The raw manifest of ``version`` (default: latest) — version, op,
    files, schema, partition_col, and the committer's ``meta``."""
    fs, _ = _fs_and_path(spark, table_path)
    if version is None:
        versions = _list_versions(spark, fs, table_path)
        if not versions:
            raise FileNotFoundError(f"snapshot: no versions at {table_path}")
        version = versions[-1]
    return _load_manifest(spark, fs, table_path, version)


def snapshot_history(spark: SparkSession, table_path: str) -> list[dict]:
    """Retained versions, oldest first: version, op, file count."""
    fs, _ = _fs_and_path(spark, table_path)
    out = []
    for v in _list_versions(spark, fs, table_path):
        man = _load_manifest(spark, fs, table_path, v)
        out.append(
            {"version": v, "op": man["op"], "n_files": len(man["files"])}
        )
    return out


def snapshot_diff(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
    keys: list[str] | None = None,
    fmt: str = "parquet",
) -> dict:
    """What changed between two table versions — the incremental-read
    primitive (Iceberg's changelog scan on plain parquet): downstream
    consumers reprocess the delta instead of re-reading the table.

    Because data files are IMMUTABLE and manifests name them, any file
    present in both manifests cannot contain a change — the row-level
    work reads ONLY the symmetric difference of the two file sets. Cost
    scales with the changed-file footprint (one merge touches a few
    partitions of a 100 TB table; the diff reads just those), never
    with table size, and the file-level answer is free (manifest set
    algebra, driver-side, no scan at all).

    With ``keys`` (unique per version — true for any merge-maintained
    table), rows are classified by a null-safe full-outer join of the
    two sides: ``insert`` (key only in new), ``delete`` (key only in
    old), ``update`` (both, non-key columns differ). Rows that merely
    moved files unchanged (compaction, partition rewrite) compare equal
    and drop out. Without ``keys``, positional multiset semantics:
    ``exceptAll`` both ways, tagged ``insert``/``delete``.

    Returns ``{"from_version", "to_version", "added_files",
    "removed_files", "carried_files", "rows"}`` where ``rows`` is a
    DataFrame of ``__change`` + the data columns (post-image for
    insert/update, pre-image for delete).
    """
    fs, _ = _fs_and_path(spark, table_path)
    if to_version is None:
        versions = _list_versions(spark, fs, table_path)
        if not versions:
            raise FileNotFoundError(f"snapshot: no versions at {table_path}")
        to_version = versions[-1]
    man_a = _load_manifest(spark, fs, table_path, from_version)
    man_b = _load_manifest(spark, fs, table_path, to_version)
    files_a, files_b = set(man_a["files"]), set(man_b["files"])
    removed_files = sorted(files_a - files_b)
    added_files = sorted(files_b - files_a)
    root = table_path.rstrip("/")
    schema = StructType.fromJson(json.loads(man_b["schema"]))
    partition_col = man_b["partition_col"]

    def _read(files: list[str]) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        reader = spark.read.format(fmt)
        if partition_col is not None:
            reader = reader.option("basePath", f"{root}/{_DATA_DIR}")
        # normalize to manifest column order: a partitioned read appends
        # the partition column last, and exceptAll matches by position
        return reader.load([f"{root}/{f}" for f in files]).select(
            *schema.fieldNames()
        )

    old, new = _read(removed_files), _read(added_files)
    data_cols = old.columns

    if keys:
        missing = [k for k in keys if k not in data_cols]
        if missing:
            raise ValueError(f"snapshot_diff: keys not in table: {missing}")
        # side-presence via probe columns, not key IS NOT NULL — a NULL
        # key is a legal value and must not read as "absent"
        o = old.withColumn("__op", F.lit(1)).alias("__o")
        n = new.withColumn("__np", F.lit(1)).alias("__n")
        cond = None
        for k in keys:
            c = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
            cond = c if cond is None else (cond & c)
        non_key = [c for c in data_cols if c not in keys]
        if non_key:
            o_img = F.struct(*[F.col(f"__o.{c}") for c in non_key])
            n_img = F.struct(*[F.col(f"__n.{c}") for c in non_key])
            img_differ = ~o_img.eqNullSafe(n_img)
        else:  # key-only table: a key either appears or not, never mutates
            img_differ = F.lit(False)
        joined = o.join(n, cond, "full_outer")
        change = (
            F.when(F.col("__op").isNull(), F.lit("insert"))
            .when(F.col("__np").isNull(), F.lit("delete"))
            .when(img_differ, F.lit("update"))
        )
        rows = (
            joined.withColumn("__change", change)
            .where(F.col("__change").isNotNull())
            .select(
                "__change",
                *[
                    F.coalesce(F.col(f"__n.{c}"), F.col(f"__o.{c}")).alias(c)
                    if c not in non_key
                    else F.when(
                        F.col("__change") == "delete", F.col(f"__o.{c}")
                    ).otherwise(F.col(f"__n.{c}")).alias(c)
                    for c in data_cols
                ],
            )
        )
    else:
        rows = new.exceptAll(old).select(
            F.lit("insert").alias("__change"), *data_cols
        ).unionAll(
            old.exceptAll(new).select(F.lit("delete").alias("__change"), *data_cols)
        )

    return {
        "from_version": from_version,
        "to_version": to_version,
        "added_files": len(added_files),
        "removed_files": len(removed_files),
        "carried_files": len(files_a & files_b),
        "rows": rows,
    }


def vacuum_snapshots(
    spark: SparkSession, table_path: str, keep_last: int = 2
) -> dict:
    """Drop all but the newest ``keep_last`` versions and delete every
    data file no retained manifest references (including post-adoption
    orphans from crashed commits). Stale sibling staging directories
    (``<table>_staging_vNNNNNNNN`` left by a crash BEFORE file adoption)
    are also removed for versions at or below the newest committed
    version — those versions already landed, so their staging dirs
    cannot be in flight under the single-writer assumption. A staging
    dir for a NOT-yet-committed version is left alone (it may be the
    writer's live attempt). Time travel to a vacuumed version then
    raises with the retained range — the explicit retention boundary
    that CoW-replace crosses silently."""
    if keep_last < 1:
        raise ValueError("vacuum_snapshots: keep_last must be >= 1")
    fs, _ = _fs_and_path(spark, table_path)
    versions = _list_versions(spark, fs, table_path)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_load_manifest(spark, fs, table_path, v)["files"])
    root = table_path.rstrip("/")
    jdata = _jpath(spark, root, _DATA_DIR)
    data_root = jdata.toUri().getPath()
    deleted_files = 0
    for p in _collect_data_files(fs, jdata):
        rel = f"{_DATA_DIR}/{p.toUri().getPath()[len(data_root):].lstrip('/')}"
        if rel not in referenced:
            fs.delete(p, False)
            deleted_files += 1
    for v in drop:
        fs.delete(_jpath(spark, _manifest_path(root, v)), False)
    # stale pre-adoption staging dirs + the merge probe dir: siblings of
    # table_path, so scan its parent for our own name prefix only
    deleted_staging = 0
    latest_v = versions[-1] if versions else 0
    jroot = _jpath(spark, root)
    parent, base = jroot.getParent(), jroot.getName()
    if parent is not None and fs.exists(parent):
        import re as _re

        pat = _re.compile(_re.escape(base) + r"_staging_v(\d{8})$")
        for st in fs.listStatus(parent):
            name = st.getPath().getName()
            m = pat.match(name)
            if m and int(m.group(1)) <= latest_v:
                fs.delete(st.getPath(), True)
                deleted_staging += 1
            elif name == base + "_probe_touched":
                fs.delete(st.getPath(), True)
                deleted_staging += 1
    return {
        "kept_versions": keep,
        "dropped_versions": drop,
        "deleted_files": deleted_files,
        "deleted_staging_dirs": deleted_staging,
    }
