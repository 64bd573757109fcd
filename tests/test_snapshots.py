"""Snapshot-versioned tables (operators.snapshots).

Contract under test:
1. merge semantics match the CDC oracle (same collapse as merge_changes)
   while EVERY prior version stays readable (time travel);
2. carry-forward granularity — untouched partitions' files appear in the
   new manifest BY NAME (the same immutable physical files, zero
   rewrite), only touched partitions produce new files;
3. idempotency — re-applying a batch yields a new version with the same
   content;
4. vacuum — drops only unreferenced files + old manifests, keeps the
   retained versions readable, collects crashed-commit orphans, and
   time travel past retention raises with the retained range;
5. empty-table and non-partitioned paths round-trip.
"""

from __future__ import annotations

import glob
import os

import pytest

from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
    read_snapshot,
    snapshot_commit,
    snapshot_history,
    snapshot_merge,
    vacuum_snapshots,
)

SCHEMA = "k int, p int, v string"
CHANGES_SCHEMA = "k int, p int, v string, seq bigint, deleted boolean"

# touches partitions 1 and 2 of p in 0..3 (same shape as test_cdc)
CHANGES = [
    (1, 1, "new5", 5, False),
    (1, 1, "new9", 9, False),
    (5, 1, None, 3, True),
    (9, 1, None, 7, True),
    (101, 1, "ins101", 1, False),
    (2, 2, "upd2", 1, False),
]


def _base_rows():
    return [(k, k % 4, f"base_{k}") for k in range(40)]


def _expected():
    exp = {k: (k % 4, f"base_{k}") for k in range(40)}
    exp[1] = (1, "new9")
    exp.pop(5)
    exp.pop(9)
    exp[101] = (1, "ins101")
    exp[2] = (2, "upd2")
    return exp


def _as_dict(df):
    return {r["k"]: (r["p"], r["v"]) for r in df.collect()}


class TestSnapshots:
    def test_merge_time_travel_and_carry_forward(self, spark, tmp_path):
        table = str(tmp_path / "t")
        v1 = snapshot_commit(
            spark,
            table,
            spark.createDataFrame(_base_rows(), SCHEMA),
            partition_col="p",
        )
        assert v1 == 1
        changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
        stats = snapshot_merge(
            spark, table, changes, keys=["k"], seq_col="seq",
            delete_col="deleted",
        )
        assert stats["version"] == 2
        assert stats["touched_partitions"] == 2

        # latest == CDC oracle; v1 == the original rows (time travel)
        assert _as_dict(read_snapshot(spark, table)) == _expected()
        assert _as_dict(read_snapshot(spark, table, version=1)) == {
            k: (k % 4, f"base_{k}") for k in range(40)
        }

        # untouched partitions (p=0, p=3) carried forward BY NAME:
        # the two manifests share exactly those files
        import json

        def files(v):
            with open(
                os.path.join(table, "_manifests", f"v{v:08d}.json")
            ) as fh:
                return set(json.load(fh)["files"])

        shared = files(1) & files(2)
        assert shared and all(
            f.startswith(("data/p=0/", "data/p=3/")) for f in shared
        )
        assert all(
            f.startswith(("data/p=1/", "data/p=2/"))
            for f in files(2) - files(1)
        )
        # physical files are immutable: every referenced file exists once
        on_disk = {
            os.path.relpath(f, table)
            for f in glob.glob(os.path.join(table, "data", "p=*", "*.parquet"))
        }
        assert (files(1) | files(2)) == on_disk

        # idempotent replay: v3 content == v2 content
        snapshot_merge(
            spark, table, changes, keys=["k"], seq_col="seq",
            delete_col="deleted",
        )
        assert _as_dict(read_snapshot(spark, table, version=3)) == _expected()
        assert [h["version"] for h in snapshot_history(spark, table)] == [
            1, 2, 3,
        ]

    def test_merge_hive_escaped_and_null_partitions(self, spark, tmp_path):
        """Partition values that hive-escape differently from their raw
        Python repr (NULL → __HIVE_DEFAULT_PARTITION__, ``/`` and ``=``
        → %%-escapes) must still classify their files as TOUCHED — the
        r7 failure mode carried the old files forward next to the
        rewrite, duplicating keys silently."""
        table = str(tmp_path / "t")
        schema = "k int, p string, v string"
        base = [
            (1, None, "a"),
            (2, "plain", "b"),
            (3, "a/b", "c"),
            (4, "x=y", "d"),
        ]
        snapshot_commit(
            spark, table, spark.createDataFrame(base, schema),
            partition_col="p",
        )
        changes = spark.createDataFrame(
            [
                (1, None, "a2", 1, False),   # update inside NULL partition
                (3, "a/b", None, 1, True),   # delete inside %-escaped dir
                (5, "q?r", "e", 1, False),   # insert new escaped partition
            ],
            "k int, p string, v string, seq bigint, deleted boolean",
        )
        stats = snapshot_merge(
            spark, table, changes, keys=["k"], seq_col="seq",
            delete_col="deleted",
        )
        assert stats["touched_partitions"] == 3
        got = {
            r["k"]: (r["p"], r["v"])
            for r in read_snapshot(spark, table).collect()
        }
        assert got == {
            1: (None, "a2"),
            2: ("plain", "b"),
            4: ("x=y", "d"),
            5: ("q?r", "e"),
        }
        # the failure mode was duplicate keys (old + new side by side)
        assert read_snapshot(spark, table).count() == 4
        # untouched escaped partition carried forward BY NAME; touched
        # NULL partition was NOT carried forward
        import json

        def files(v):
            with open(
                os.path.join(table, "_manifests", f"v{v:08d}.json")
            ) as fh:
                return set(json.load(fh)["files"])

        shared = files(1) & files(2)
        assert any("p=plain" in f for f in shared)
        assert any("p=x%3Dy" in f for f in shared)
        assert not any("__HIVE_DEFAULT_PARTITION__" in f for f in shared)
        # the probe directory is cleaned up after the merge
        assert not os.path.exists(str(tmp_path / "t_probe_touched"))

    def test_vacuum_retention_and_orphans(self, spark, tmp_path):
        table = str(tmp_path / "t")
        snapshot_commit(
            spark,
            table,
            spark.createDataFrame(_base_rows(), SCHEMA),
            partition_col="p",
        )
        changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
        snapshot_merge(
            spark, table, changes, keys=["k"], seq_col="seq",
            delete_col="deleted",
        )
        snapshot_merge(
            spark, table, changes, keys=["k"], seq_col="seq",
            delete_col="deleted",
        )
        # a crashed commit leaves an orphan data file no manifest knows
        orphan_dir = os.path.join(table, "data", "p=1")
        orphan = os.path.join(orphan_dir, "s99999999-part-orphan.parquet")
        with open(orphan, "wb") as fh:
            fh.write(b"not really parquet")
        # a crash BEFORE adoption leaves a sibling staging dir for an
        # already-committed version — vacuum must collect it too
        stale_staging = str(tmp_path / "t_staging_v00000002")
        os.makedirs(stale_staging)
        with open(os.path.join(stale_staging, "part-0.parquet"), "wb") as fh:
            fh.write(b"stale")
        # a staging dir for a NOT-yet-committed version may be a live
        # writer attempt — must be left alone
        live_staging = str(tmp_path / "t_staging_v00000009")
        os.makedirs(live_staging)

        res = vacuum_snapshots(spark, table, keep_last=2)
        assert res["dropped_versions"] == [1]
        assert res["kept_versions"] == [2, 3]
        assert res["deleted_files"] > 0
        assert res["deleted_staging_dirs"] == 1
        assert not os.path.exists(orphan)
        assert not os.path.exists(stale_staging)
        assert os.path.exists(live_staging)

        # retained versions still read correctly end-to-end
        assert _as_dict(read_snapshot(spark, table, version=2)) == _expected()
        assert _as_dict(read_snapshot(spark, table, version=3)) == _expected()
        # vacuumed version raises with the retained range
        with pytest.raises(FileNotFoundError, match=r"\[2, 3\]"):
            read_snapshot(spark, table, version=1)
        # every surviving file is referenced by a retained manifest
        import json

        referenced = set()
        for v in (2, 3):
            with open(
                os.path.join(table, "_manifests", f"v{v:08d}.json")
            ) as fh:
                referenced |= set(json.load(fh)["files"])
        on_disk = {
            os.path.relpath(f, table)
            for f in glob.glob(os.path.join(table, "data", "p=*", "*.parquet"))
        }
        assert on_disk == referenced

    def test_nonpartitioned_append_and_empty(self, spark, tmp_path):
        table = str(tmp_path / "t")
        df1 = spark.createDataFrame([(1, 0, "a")], SCHEMA)
        df2 = spark.createDataFrame([(2, 0, "b")], SCHEMA)
        snapshot_commit(spark, table, df1)
        snapshot_commit(spark, table, df2, mode="append")
        assert _as_dict(read_snapshot(spark, table)) == {
            1: (0, "a"),
            2: (0, "b"),
        }
        # non-partitioned merge: delete everything -> empty but readable
        changes = spark.createDataFrame(
            [(1, 0, None, 1, True), (2, 0, None, 1, True)], CHANGES_SCHEMA
        )
        snapshot_merge(
            spark, table, changes, keys=["k"], seq_col="seq",
            delete_col="deleted",
        )
        latest = read_snapshot(spark, table)
        assert latest.count() == 0
        assert latest.columns == ["k", "p", "v"]
        # and time travel still sees the data
        assert _as_dict(read_snapshot(spark, table, version=2)) == {
            1: (0, "a"),
            2: (0, "b"),
        }

    def test_streaming_sink_bootstraps_versions_and_matches_batch(
        self, spark, tmp_path
    ):
        """A CDC stream applied via foreachBatch(snapshot_merge_sink)
        bootstraps the table on the first micro-batch, lands one version
        per micro-batch, and the final version equals the sequential
        batch merges — with the intermediate version still readable
        (what the in-place cdc_merge_sink cannot offer). The split is
        mid-key-history (k=1's seq-5 / seq-9 updates in different
        micro-batches) to cover cross-batch last-writer-wins."""
        from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
            snapshot_merge_sink,
        )

        table = str(tmp_path / "stream_tbl")
        src = tmp_path / "changes_src"
        base_batch = [
            (k, p, v, -1, False) for k, (p, v) in
            {k: (k % 4, f"base_{k}") for k in range(40)}.items()
        ]
        first = base_batch + [c for c in CHANGES if c[3] <= 5]
        second = [c for c in CHANGES if c[3] > 5]
        for i, batch in enumerate([first, second]):
            spark.createDataFrame(batch, CHANGES_SCHEMA).coalesce(
                1
            ).write.mode("overwrite").parquet(str(src / f"b{i}"))

        stream = (
            spark.readStream.schema(CHANGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "b*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                snapshot_merge_sink(
                    table, ["k"], "seq", delete_col="deleted",
                    partition_col="p",
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # v1 = bootstrap (empty), v2/v3 = one merge per micro-batch
        assert [h["version"] for h in snapshot_history(spark, table)] == [
            1, 2, 3,
        ]
        assert _as_dict(read_snapshot(spark, table)) == _expected()
        # the mid-stream version is a coherent historical cut: base rows
        # + the seq<=5 changes only (k=1 at new5, k=5 tie-delete gone)
        mid = _as_dict(read_snapshot(spark, table, version=2))
        assert mid[1] == (1, "new5")
        assert 5 not in mid and 9 in mid

    def test_snapshot_diff_keyed_and_positional(self, spark, tmp_path):
        from amonaly_detection_in_time_series_data_spark.operators.snapshots import snapshot_diff

        table = str(tmp_path / "t")
        snapshot_commit(
            spark,
            table,
            spark.createDataFrame(_base_rows(), SCHEMA),
            partition_col="p",
        )
        snapshot_merge(
            spark,
            table,
            spark.createDataFrame(CHANGES, CHANGES_SCHEMA),
            keys=["k"],
            seq_col="seq",
            delete_col="deleted",
        )

        d = snapshot_diff(spark, table, 1, 2, keys=["k"])
        # only partitions 1 and 2 were touched: their v1 files are the
        # removed set, their rewrites the added set, p=0/p=3 carried
        assert d["carried_files"] > 0
        assert d["removed_files"] > 0 and d["added_files"] > 0
        got = {
            r["k"]: (r["__change"], r["p"], r["v"]) for r in d["rows"].collect()
        }
        # exactly the 5 net changes; rewritten-but-identical rows in the
        # touched partitions (e.g. k=13 in p=1) must NOT appear
        assert got == {
            1: ("update", 1, "new9"),
            2: ("update", 2, "upd2"),
            5: ("delete", 1, "base_5"),
            9: ("delete", 1, "base_9"),
            101: ("insert", 1, "ins101"),
        }

        # positional mode: an update splits into delete(pre) + insert(post)
        pos = snapshot_diff(spark, table, 1, 2)["rows"]
        by_change = {
            (r["__change"], r["k"]): r["v"] for r in pos.collect()
        }
        assert by_change[("delete", 1)] == "base_1"
        assert by_change[("insert", 1)] == "new9"
        n_ins = sum(1 for c, _ in by_change if c == "insert")
        n_del = sum(1 for c, _ in by_change if c == "delete")
        assert (n_ins, n_del) == (3, 4)

    def test_snapshot_diff_identity_and_compaction_are_empty(
        self, spark, tmp_path
    ):
        from amonaly_detection_in_time_series_data_spark.operators.snapshots import snapshot_diff

        table = str(tmp_path / "t")
        df = spark.createDataFrame(_base_rows(), SCHEMA)
        snapshot_commit(spark, table, df, partition_col="p")
        d = snapshot_diff(spark, table, 1, 1, keys=["k"])
        assert d["rows"].count() == 0
        assert d["added_files"] == d["removed_files"] == 0

        # a physical rewrite with identical content (compaction shape):
        # every file changes, no row change survives the keyed diff
        snapshot_commit(
            spark, table, df.repartition(1), partition_col="p"
        )
        d2 = snapshot_diff(spark, table, 1, 2, keys=["k"])
        assert d2["removed_files"] > 0 and d2["added_files"] > 0
        assert d2["rows"].count() == 0

    def test_snapshot_diff_append_only_nonpartitioned(self, spark, tmp_path):
        from amonaly_detection_in_time_series_data_spark.operators.snapshots import snapshot_diff

        table = str(tmp_path / "t")
        snapshot_commit(
            spark, table, spark.createDataFrame([(1, 0, "a")], SCHEMA)
        )
        snapshot_commit(
            spark,
            table,
            spark.createDataFrame([(2, 0, "b")], SCHEMA),
            mode="append",
        )
        d = snapshot_diff(spark, table, 1, keys=["k"])  # to latest
        assert d["to_version"] == 2
        assert d["carried_files"] > 0 and d["removed_files"] == 0
        rows = d["rows"].collect()
        assert [(r["__change"], r["k"]) for r in rows] == [("insert", 2)]
        with pytest.raises(ValueError, match="keys not in table"):
            snapshot_diff(spark, table, 1, 2, keys=["nope"])

    def test_partition_col_mismatch_and_missing_table(self, spark, tmp_path):
        table = str(tmp_path / "t")
        snapshot_commit(
            spark,
            table,
            spark.createDataFrame(_base_rows(), SCHEMA),
            partition_col="p",
        )
        with pytest.raises(ValueError, match="partitioned by"):
            snapshot_commit(
                spark, table, spark.createDataFrame(_base_rows(), SCHEMA)
            )
        with pytest.raises(FileNotFoundError, match="snapshot_commit first"):
            snapshot_merge(
                spark,
                str(tmp_path / "nope"),
                spark.createDataFrame(CHANGES, CHANGES_SCHEMA),
                keys=["k"],
                seq_col="seq",
            )
