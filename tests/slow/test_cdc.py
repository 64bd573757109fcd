"""CDC merge / upsert (operators.cdc).

Contract under test:
1. merge semantics vs a pure-Python oracle — last-writer-wins by seq,
   delete-beats-upsert on a seq tie, replace/insert/remove;
2. copy-on-write granularity — untouched partition FILES are untouched
   on disk (same paths, sizes, mtimes), a fully-deleted partition's
   directory disappears;
3. plan shape — the target scan is partition-pruned to the touched
   values and the anti-join broadcasts the batch keys (target side is
   never shuffled);
4. idempotency — re-applying the same batch changes nothing;
5. the ``max_touched_partitions`` mega-guard raises instead of
   silently rewriting the world.
"""

from __future__ import annotations

import glob
import os
import re

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.cdc import (
    latest_changes,
    merge_changes,
    merged_view,
)

SCHEMA = "k int, p int, v string"
CHANGES_SCHEMA = "k int, p int, v string, seq bigint, deleted boolean"


def _write_table(spark, path):
    rows = [(k, k % 4, f"base_{k}") for k in range(40)]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").partitionBy(
        "p"
    ).parquet(path)
    return {k: (k % 4, f"base_{k}") for k in range(40)}


def _file_state(path):
    out = {}
    for f in glob.glob(os.path.join(path, "p=*", "*.parquet")):
        st = os.stat(f)
        out[f] = (st.st_size, st.st_mtime_ns)
    return out


# the batch touches partitions 1 and 2 only:
#  k=1  two updates, seq 5 then 9           -> v=new9 wins
#  k=5  update seq 3 AND delete seq 3 (tie) -> delete wins
#  k=9  delete                              -> removed
#  k=101 insert (new key, partition 1)      -> inserted
#  k=2  update in partition 2               -> replaced
CHANGES = [
    (1, 1, "new5", 5, False),
    (1, 1, "new9", 9, False),
    (5, 1, "tie_upsert", 3, False),
    (5, 1, None, 3, True),
    (9, 1, None, 7, True),
    (101, 1, "ins101", 1, False),
    (2, 2, "upd2", 1, False),
]


def _expected(base: dict) -> dict:
    exp = dict(base)
    exp[1] = (1, "new9")
    exp.pop(5)
    exp.pop(9)
    exp[101] = (1, "ins101")
    exp[2] = (2, "upd2")
    return exp


class TestMergeChanges:
    def test_merge_semantics_and_cow_granularity(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        base = _write_table(spark, path)
        before = _file_state(path)
        untouched_before = {
            f: s for f, s in before.items() if "/p=1/" not in f and "/p=2/" not in f
        }

        changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
        stats = merge_changes(
            spark, path, changes, keys=["k"], seq_col="seq",
            delete_col="deleted", partition_col="p",
        )
        assert stats["touched_partitions"] == 2

        got = {
            r["k"]: (r["p"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == _expected(base)

        # untouched partitions: byte-identical files, same mtimes
        after = _file_state(path)
        untouched_after = {
            f: s for f, s in after.items() if "/p=1/" not in f and "/p=2/" not in f
        }
        assert untouched_after == untouched_before
        assert not os.path.exists(path + "_merge_staging")

        # idempotent: re-applying the same batch is a no-op
        merge_changes(
            spark, path, changes, keys=["k"], seq_col="seq",
            delete_col="deleted", partition_col="p",
        )
        got2 = {
            r["k"]: (r["p"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got2 == got

    def test_pure_delete_removes_partition_dir(self, spark, tmp_path):
        path = str(tmp_path / "tbl2")
        _write_table(spark, path)
        # delete every key of partition 3 (3, 7, 11, ..., 39)
        dels = [(k, 3, None, 1, True) for k in range(3, 40, 4)]
        merge_changes(
            spark, path, spark.createDataFrame(dels, CHANGES_SCHEMA),
            keys=["k"], seq_col="seq", delete_col="deleted",
            partition_col="p",
        )
        assert not os.path.exists(os.path.join(path, "p=3"))
        assert spark.read.parquet(path).filter("p = 3").count() == 0
        assert spark.read.parquet(path).count() == 30

    def test_plan_prunes_partitions_and_broadcasts_keys(self, spark, tmp_path):
        path = str(tmp_path / "tbl3")
        _write_table(spark, path)
        changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
        target = spark.read.parquet(path).filter(F.col("p").isin([1, 2]))
        view = merged_view(
            target, changes, keys=["k"], seq_col="seq", delete_col="deleted"
        )
        plan = view._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "1" in m.group(1) and "2" in m.group(1), plan
        assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan
        assert "SortMergeJoin" not in plan

    def test_latest_changes_tiebreak(self, spark):
        changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
        latest = {
            r["k"]: (r["seq"], r["deleted"])
            for r in latest_changes(
                changes, ["k"], "seq", "deleted"
            ).collect()
        }
        assert latest[1] == (9, False)
        assert latest[5] == (3, True)  # tie -> delete wins

    def test_full_tie_is_partitioning_invariant(self, spark):
        """Two upserts with the SAME key and seq (malformed feed): the
        winner is a pure function of the row data (hash tiebreak), so
        repartitioning cannot flip it."""
        rows = [
            (1, 1, "alpha", 5, False),
            (1, 1, "bravo", 5, False),
        ]
        df = spark.createDataFrame(rows, CHANGES_SCHEMA)
        a = latest_changes(df, ["k"], "seq", "deleted").collect()[0]["v"]
        b = latest_changes(
            df.repartition(8), ["k"], "seq", "deleted"
        ).collect()[0]["v"]
        c = latest_changes(
            spark.createDataFrame(rows[::-1], CHANGES_SCHEMA),
            ["k"], "seq", "deleted",
        ).collect()[0]["v"]
        assert a == b == c

    def test_streaming_cdc_apply_matches_batch_merge(self, spark, tmp_path):
        """A CDC change stream applied via foreachBatch(cdc_merge_sink)
        lands the same table state as merging the batches sequentially.
        The micro-batch split point is mid-key-history (k=1's seq-5 and
        seq-9 updates arrive in different micro-batches), so the test
        also covers cross-batch last-writer-wins."""
        from amonaly_detection_in_time_series_data_spark.operators.cdc import (
            cdc_merge_sink,
        )

        path = str(tmp_path / "stream_tbl")
        base = _write_table(spark, path)
        src = tmp_path / "changes_src"
        # seq doubles as arrival order: micro-batch 0 = seq <= 5 (k=1's
        # seq-5 update), micro-batch 1 = the rest (k=1's seq-9 update)
        first = [c for c in CHANGES if c[3] <= 5]
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
                cdc_merge_sink(
                    path, ["k"], "seq", delete_col="deleted",
                    partition_col="p",
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            r["k"]: (r["p"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == _expected(base)

    def test_scd2_history_preserving_apply(self, spark):
        """Type 2: the current version is CLOSED (valid_to = change seq)
        and a new version appended; deletes close without appending;
        history rows pass through; pure inserts get an open version."""
        from amonaly_detection_in_time_series_data_spark.operators.cdc import (
            scd2_apply,
        )

        target = spark.createDataFrame(
            [
                # k=1: one closed historical version + one current
                (1, "v1_old", 10, 20),
                (1, "v1_cur", 20, None),
                # k=2: current only (will be deleted)
                (2, "v2_cur", 15, None),
                # k=3: current only (double update, latest wins)
                (3, "v3_cur", 5, None),
                # k=4: untouched by the batch
                (4, "v4_cur", 1, None),
            ],
            "k int, v string, valid_from bigint, valid_to bigint",
        )
        changes = spark.createDataFrame(
            [
                (1, "v1_new", 30, False),
                (2, None, 40, True),
                (3, "v3_mid", 50, False),
                (3, "v3_new", 60, False),
                (9, "v9_ins", 70, False),
            ],
            "k int, v string, seq bigint, deleted boolean",
        )
        out = scd2_apply(
            target, changes, keys=["k"], seq_col="seq", delete_col="deleted"
        )
        rows = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in out.collect()
        }
        assert rows == {
            (1, "v1_old", 10, 20),      # history untouched
            (1, "v1_cur", 20, 30),      # closed at the change seq
            (1, "v1_new", 30, None),    # new current
            (2, "v2_cur", 15, 40),      # delete closes, no new version
            (3, "v3_cur", 5, 60),       # closed at the LATEST change
            (3, "v3_new", 60, None),    # latest of the two updates
            (4, "v4_cur", 1, None),     # untouched key passes through
            (9, "v9_ins", 70, None),    # pure insert, open version
        }
        # no target shuffle: the close join is broadcast, never sort-merge
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

        # AS-OF time travel reads consistent historical snapshots
        from amonaly_detection_in_time_series_data_spark.operators.cdc import (
            scd2_as_of,
        )

        at25 = {
            (r["k"], r["v"]) for r in scd2_as_of(out, 25).collect()
        }
        assert at25 == {(1, "v1_cur"), (2, "v2_cur"), (3, "v3_cur"), (4, "v4_cur")}
        at65 = {
            (r["k"], r["v"]) for r in scd2_as_of(out, 65).collect()
        }
        assert at65 == {(1, "v1_new"), (3, "v3_new"), (4, "v4_cur")}

    def test_random_change_sequences_match_dict_replay(self, spark, tmp_path):
        """Property: for ANY change sequence and ANY contiguous batch
        split, applying the batches through merge_changes equals a
        row-by-row Python dict replay (seq is globally increasing, so
        last-writer-wins batch collapse == sequential replay)."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
        from amonaly_detection_in_time_series_data_spark.operators.cdc import (
            merge_changes,
        )

        OPS = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key
                st.booleans(),                           # is_delete
                st.integers(min_value=0, max_value=99),  # value
            ),
            min_size=1,
            max_size=12,
        )

        counter = [0]

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(ops=OPS, n_batches=st.integers(min_value=1, max_value=3))
        def check(ops, n_batches):
            counter[0] += 1
            path = str(tmp_path / f"prop_{counter[0]}")
            base_rows = [(k, k % 2, f"base_{k}") for k in range(4)]
            spark.createDataFrame(base_rows, SCHEMA).write.mode(
                "overwrite"
            ).partitionBy("p").parquet(path)

            # python oracle: sequential replay
            state = {k: (k % 2, f"base_{k}") for k in range(4)}
            changes = []
            for seq, (k, is_del, val) in enumerate(ops):
                changes.append((k, k % 2, f"v{val}", seq, is_del))
                if is_del:
                    state.pop(k, None)
                else:
                    state[k] = (k % 2, f"v{val}")

            # spark: apply in n_batches contiguous slices
            step = max(1, len(changes) // n_batches)
            for lo in range(0, len(changes), step):
                batch = changes[lo:lo + step]
                merge_changes(
                    spark, path,
                    spark.createDataFrame(batch, CHANGES_SCHEMA),
                    keys=["k"], seq_col="seq", delete_col="deleted",
                    partition_col="p",
                )
            # explicit schema: a sequence deleting every key leaves an
            # empty (but valid) table that schema inference can't read
            got = {
                r["k"]: (r["p"], r["v"])
                for r in spark.read.schema("k int, v string, p int")
                .parquet(path).collect()
            }
            assert got == state

        check()

    def test_mega_guard(self, spark, tmp_path):
        path = str(tmp_path / "tbl4")
        _write_table(spark, path)
        changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
        with pytest.raises(ValueError, match="max_touched_partitions"):
            merge_changes(
                spark, path, changes, keys=["k"], seq_col="seq",
                delete_col="deleted", partition_col="p",
                max_touched_partitions=1,
            )
