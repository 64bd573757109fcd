"""Incremental view maintenance (operators.ivm).

Contract under test:
1. property — for ANY change sequence and ANY contiguous batch split,
   the incrementally maintained rollup is BIT-EQUAL (long sums) to a
   full GROUP BY recompute of the final base table;
2. the composed snapshot driver keeps base and rollup at consistent
   versions, bootstraps on first call, and stays incremental after;
3. emptied groups drop out; null group values fold as one group;
4. refresh_groups recomputes ONLY affected groups and splices them in —
   the min/max-under-delete case deltas cannot maintain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.ivm import (
    COUNT_COL,
    agg_delta,
    apply_agg_delta,
    compute_agg,
    maintain_agg_snapshot,
    refresh_groups,
)
from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
    read_snapshot,
    snapshot_commit,
)

SCHEMA = "k int, p int, g string, x long"
CHANGES_SCHEMA = "k int, p int, g string, x long, seq bigint, deleted boolean"


def _rollup_dict(df):
    return {
        r["g"]: (r["x"], r[COUNT_COL])
        for r in df.collect()
    }


class TestIvm:
    def test_random_batches_match_full_recompute(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        OPS = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),    # key
                st.booleans(),                            # is_delete
                st.integers(min_value=-50, max_value=50), # x
                st.sampled_from(["a", "b", None]),        # group (can move!)
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
            base = str(tmp_path / f"base_{counter[0]}")
            agg = str(tmp_path / f"agg_{counter[0]}")
            base_rows = [(k, k % 2, "a" if k % 3 else "b", k * 10)
                         for k in range(4)]
            snapshot_commit(
                spark, base,
                spark.createDataFrame(base_rows, SCHEMA),
                partition_col="p",
            )
            changes = [
                (k, k % 2, g, x, seq, is_del)
                for seq, (k, is_del, x, g) in enumerate(ops)
            ]
            step = max(1, len(changes) // n_batches)
            ops_seen = 0
            for lo in range(0, len(changes), step):
                batch = spark.createDataFrame(
                    changes[lo:lo + step], CHANGES_SCHEMA
                )
                res = maintain_agg_snapshot(
                    spark, base, agg, batch,
                    keys=["k"], group_cols=["g"], sum_cols=["x"],
                    seq_col="seq", delete_col="deleted",
                    partition_col="p",
                )
                ops_seen += 1
                assert res["agg_op"] == (
                    "bootstrap" if ops_seen == 1 else "incremental"
                )
            got = _rollup_dict(read_snapshot(spark, agg))
            want = _rollup_dict(
                compute_agg(read_snapshot(spark, base), ["g"], ["x"])
            )
            assert got == want

        check()

    def test_emptied_group_drops_and_null_group_folds(self, spark, tmp_path):
        base_df = spark.createDataFrame(
            [(1, 0, "only", 5), (2, 0, None, 7), (3, 0, None, 9)], SCHEMA
        )
        agg0 = compute_agg(base_df, ["g"], ["x"])
        # delete the sole member of 'only'; update one null-group row
        changes = spark.createDataFrame(
            [(1, 0, "only", 0, 1, True), (2, 0, None, 100, 1, False)],
            CHANGES_SCHEMA,
        )
        delta = agg_delta(
            base_df, changes, ["k"], ["g"], ["x"], "seq", "deleted"
        )
        after = apply_agg_delta(agg0, delta, ["g"], ["x"])
        assert _rollup_dict(after) == {None: (109, 2)}

    def test_group_migration_retracts_from_old_group(self, spark, tmp_path):
        base_df = spark.createDataFrame([(1, 0, "a", 5), (2, 0, "b", 7)], SCHEMA)
        agg0 = compute_agg(base_df, ["g"], ["x"])
        # key 1 moves from group a to group b
        changes = spark.createDataFrame(
            [(1, 0, "b", 5, 1, False)], CHANGES_SCHEMA
        )
        delta = agg_delta(
            base_df, changes, ["k"], ["g"], ["x"], "seq", "deleted"
        )
        after = apply_agg_delta(agg0, delta, ["g"], ["x"])
        assert _rollup_dict(after) == {"b": (12, 2)}

    def test_null_partition_values_retract_old_images(self, spark, tmp_path):
        """r7 ADVICE: ``isin()`` pruning never matches NULL, so changed
        keys living in the NULL partition kept their old images and the
        rollup double-counted. The predicate now carries an explicit
        ``isNull`` branch."""
        base = str(tmp_path / "base")
        agg = str(tmp_path / "agg")
        base_rows = [(1, None, "a", 10), (2, 0, "a", 20), (3, None, "b", 30)]
        snapshot_commit(
            spark, base, spark.createDataFrame(base_rows, SCHEMA),
            partition_col="p",
        )
        kw = dict(
            keys=["k"], group_cols=["g"], sum_cols=["x"],
            seq_col="seq", delete_col="deleted", partition_col="p",
        )
        b0 = spark.createDataFrame([(4, 0, "b", 5, 1, False)], CHANGES_SCHEMA)
        maintain_agg_snapshot(spark, base, agg, b0, **kw)
        # update + delete keys whose partition value is NULL
        b1 = spark.createDataFrame(
            [(1, None, "a", 100, 2, False), (3, None, "b", 0, 2, True)],
            CHANGES_SCHEMA,
        )
        res = maintain_agg_snapshot(spark, base, agg, b1, **kw)
        assert res["agg_op"] == "incremental"
        got = _rollup_dict(read_snapshot(spark, agg))
        want = _rollup_dict(
            compute_agg(read_snapshot(spark, base), ["g"], ["x"])
        )
        assert got == want == {"a": (120, 2), "b": (5, 1)}

    def test_redelivery_and_crash_window_are_exactly_once(
        self, spark, tmp_path
    ):
        """At-least-once delivery healing: (a) redelivering an already-
        applied batch leaves the rollup unchanged (delta is literally
        zero at the recorded cut); (b) a crash BETWEEN the base merge
        and the rollup commit — simulated by merging the batch directly
        then redelivering through the maintainer — catches the rollup
        up instead of double- or under-counting."""
        from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
            snapshot_manifest,
            snapshot_merge,
        )

        base = str(tmp_path / "base")
        agg = str(tmp_path / "agg")
        base_rows = [(k, k % 2, "a" if k % 3 else "b", k * 10)
                     for k in range(4)]
        snapshot_commit(
            spark, base, spark.createDataFrame(base_rows, SCHEMA),
            partition_col="p",
        )
        kw = dict(keys=["k"], group_cols=["g"], sum_cols=["x"],
                  seq_col="seq", delete_col="deleted", partition_col="p")

        b1 = spark.createDataFrame(
            [(0, 0, "a", 7, 1, False), (1, 1, None, 5, 1, False),
             (2, 0, "b", 0, 1, True)],
            CHANGES_SCHEMA,
        )
        maintain_agg_snapshot(spark, base, agg, b1, **kw)   # bootstrap
        b2 = spark.createDataFrame(
            [(1, 1, None, 50, 2, False), (5, 1, "b", 99, 2, False)],
            CHANGES_SCHEMA,
        )
        maintain_agg_snapshot(spark, base, agg, b2, **kw)

        def check_consistent():
            got = _rollup_dict(read_snapshot(spark, agg))
            want = _rollup_dict(
                compute_agg(read_snapshot(spark, base), ["g"], ["x"])
            )
            assert got == want
            assert (
                snapshot_manifest(spark, agg)["meta"]["base_version"]
                == snapshot_manifest(spark, base)["version"]
            )

        check_consistent()
        # (a) plain redelivery of b2
        maintain_agg_snapshot(spark, base, agg, b2, **kw)
        check_consistent()

        # (b) crash window: base merged b3, rollup never updated...
        b3 = spark.createDataFrame(
            [(0, 0, "a", 1000, 3, False), (5, 1, None, 3, 3, True)],
            CHANGES_SCHEMA,
        )
        snapshot_merge(spark, base, b3, keys=["k"], seq_col="seq",
                       delete_col="deleted")
        # ...then the orchestrator redelivers b3 through the maintainer
        maintain_agg_snapshot(spark, base, agg, b3, **kw)
        check_consistent()

    def test_streaming_sink_stands_up_base_and_rollup(self, spark, tmp_path):
        """One foreachBatch sink bootstraps the base from the stream
        schema, maintains the rollup per micro-batch, and the final
        rollup equals a full recompute of the final base."""
        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_agg_sink,
        )

        base = str(tmp_path / "sbase")
        agg = str(tmp_path / "sagg")
        src = tmp_path / "feed"
        batches = [
            [(0, 0, "a", 5, 0, False), (1, 1, "b", 7, 0, False)],
            [(0, 0, "a", 50, 1, False), (2, 0, None, 9, 1, False),
             (1, 1, "b", 0, 1, True)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(
                1
            ).write.mode("overwrite").parquet(str(src / f"b{i}"))
        stream = (
            spark.readStream.schema(CHANGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "b*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                maintain_agg_sink(
                    base, agg, keys=["k"], group_cols=["g"],
                    sum_cols=["x"], seq_col="seq", delete_col="deleted",
                    partition_col="p",
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = _rollup_dict(read_snapshot(spark, agg))
        want = _rollup_dict(
            compute_agg(read_snapshot(spark, base), ["g"], ["x"])
        )
        assert got == want == {"a": (50, 1), None: (9, 1)}

    def test_sketch_sinks_stand_up_base_and_sketch_tables(
        self, spark, tmp_path
    ):
        """r11 (r10 verdict task 7): the foreachBatch adapters for the
        NON-additive summary tables. Stream a CDC feed (with an update,
        a delete, and a group migration) through maintain_hll_sink and
        maintain_kmv_sink; the final sketch tables must equal
        from-scratch builds of the final base — the same streaming-vs-
        batch parity contract maintain_agg_sink pins."""
        from amonaly_detection_in_time_series_data_spark.operators.hll import (
            hll_build,
            hll_estimate,
        )
        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_hll_sink,
            maintain_kmv_sink,
        )
        from amonaly_detection_in_time_series_data_spark.operators.kmv import (
            kmv_build,
        )

        src = tmp_path / "feed"
        batches = [
            [(0, 0, "a", 5, 0, False), (1, 1, "b", 7, 0, False),
             (2, 0, "a", 7, 0, False)],
            [(0, 0, "b", 5, 1, False),    # group migration a -> b
             (3, 1, None, 9, 1, False),   # NULL group
             (1, 1, "b", 0, 1, True)],    # delete
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(
                1
            ).write.mode("overwrite").parquet(str(src / f"b{i}"))

        def run(sink, ckpt):
            stream = (
                spark.readStream.schema(CHANGES_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src / "b*"))
            )
            q = (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        hbase, hsk = str(tmp_path / "hbase"), str(tmp_path / "hsk")
        run(
            maintain_hll_sink(
                hbase, hsk, keys=["k"], group_cols=["g"], value_col="x",
                seq_col="seq", delete_col="deleted", lg_k=10,
            ),
            "hckpt",
        )
        base_after = read_snapshot(spark, hbase)
        got = {
            r["g"]: r["est"]
            for r in read_snapshot(spark, hsk).select(
                "g", hll_estimate("hll_sketch").alias("est")
            ).collect()
        }
        want = {
            r["g"]: r["est"]
            for r in hll_build(base_after, ["g"], "x", 10).select(
                "g", hll_estimate("hll_sketch").alias("est")
            ).collect()
        }
        assert got == want and set(got) == {"a", "b", None}

        kbase, ksk = str(tmp_path / "kbase"), str(tmp_path / "ksk")
        run(
            maintain_kmv_sink(
                kbase, ksk, keys=["k"], group_cols=["g"], value_col="x",
                seq_col="seq", delete_col="deleted", k=16,
            ),
            "kckpt",
        )
        kbase_after = read_snapshot(spark, kbase)
        kgot = {
            r["g"]: r["kmv"] for r in read_snapshot(spark, ksk).collect()
        }
        kwant = {
            r["g"]: r["kmv"]
            for r in kmv_build(kbase_after, ["g"], "x", k=16).collect()
        }
        assert kgot == kwant and set(kgot) == {"a", "b", None}

    def test_hll_sketch_table_random_batches_match_rebuild(
        self, spark, tmp_path
    ):
        # r10: the HLL summary table maintained under the CDC feed must,
        # after ANY contiguous batch split (with deletes, updates and
        # group migration), equal a from-scratch hll_build of the merged
        # base — per-group estimates AND group set — and its rollup
        # (merging the per-group sketches to one) must equal the direct
        # whole-base estimate (loss-free at matched lg_k).
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from amonaly_detection_in_time_series_data_spark.operators.hll import (
            hll_build,
            hll_estimate,
            hll_rollup,
        )
        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_hll_snapshot,
        )

        OPS = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),    # key
                st.booleans(),                            # is_delete
                st.integers(min_value=-9, max_value=9),   # x (the value)
                st.sampled_from(["a", "b", None]),        # group (can move!)
            ),
            min_size=1,
            max_size=12,
        )

        counter = [0]

        def est_dict(sk):
            return {
                r["g"]: r["est"]
                for r in sk.select(
                    "g", hll_estimate("hll_sketch").alias("est")
                ).collect()
            }

        @settings(
            max_examples=6, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(ops=OPS, n_batches=st.integers(min_value=1, max_value=3))
        def check(ops, n_batches):
            counter[0] += 1
            base = str(tmp_path / f"hbase_{counter[0]}")
            sk = str(tmp_path / f"hsk_{counter[0]}")
            base_rows = [(k, k % 2, "a" if k % 3 else "b", k * 10)
                         for k in range(4)]
            snapshot_commit(
                spark, base,
                spark.createDataFrame(base_rows, SCHEMA),
                partition_col="p",
            )
            changes = [
                (k, k % 2, g, x, seq, is_del)
                for seq, (k, is_del, x, g) in enumerate(ops)
            ]
            step = max(1, len(changes) // n_batches)
            calls = 0
            for lo in range(0, len(changes), step):
                batch = spark.createDataFrame(
                    changes[lo:lo + step], CHANGES_SCHEMA
                )
                res = maintain_hll_snapshot(
                    spark, base, sk, batch,
                    keys=["k"], group_cols=["g"], value_col="x",
                    seq_col="seq", delete_col="deleted", lg_k=12,
                )
                calls += 1
                assert res["sketch_op"] == (
                    "bootstrap" if calls == 1 else "refresh"
                )
            merged = read_snapshot(spark, base)
            got = est_dict(read_snapshot(spark, sk))
            want = est_dict(hll_build(merged, ["g"], "x", lg_k=12))
            assert got == want
            # loss-free rollup: merge the maintained per-group sketches
            # to ONE and compare against the direct whole-base estimate
            overall = (
                hll_rollup(
                    read_snapshot(spark, sk).withColumn("one", F.lit(1)),
                    ["one"],
                )
                .select(hll_estimate("hll_sketch").alias("est"))
                .collect()[0]["est"]
            )
            direct = (
                merged.agg(
                    F.hll_sketch_estimate(
                        F.hll_sketch_agg(F.col("x"), F.lit(12))
                    ).alias("est")
                ).collect()[0]["est"]
            )
            assert overall == direct

        check()

    def test_kmv_sketch_table_random_batches_match_rebuild(
        self, spark, tmp_path
    ):
        # r10: the KMV maintainer is held to a STRONGER bar than HLL —
        # the maintained sketches must be ARRAY-equal to a from-scratch
        # kmv_build of the merged base (not just estimate-equal),
        # because affected-group recompute is a pure function of the
        # post-merge base.
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from amonaly_detection_in_time_series_data_spark.operators.kmv import (
            kmv_build,
        )
        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_kmv_snapshot,
        )

        OPS = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),    # key
                st.booleans(),                            # is_delete
                st.integers(min_value=-9, max_value=9),   # x (the value)
                st.sampled_from(["a", "b", None]),        # group (can move!)
            ),
            min_size=1,
            max_size=12,
        )

        counter = [0]

        def arr_dict(sk):
            return {r["g"]: tuple(r["kmv"]) for r in sk.collect()}

        @settings(
            max_examples=6, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(ops=OPS, n_batches=st.integers(min_value=1, max_value=3))
        def check(ops, n_batches):
            counter[0] += 1
            base = str(tmp_path / f"kbase_{counter[0]}")
            sk = str(tmp_path / f"ksk_{counter[0]}")
            base_rows = [(kk, kk % 2, "a" if kk % 3 else "b", kk * 10)
                         for kk in range(4)]
            snapshot_commit(
                spark, base,
                spark.createDataFrame(base_rows, SCHEMA),
                partition_col="p",
            )
            changes = [
                (kk, kk % 2, g, x, seq, is_del)
                for seq, (kk, is_del, x, g) in enumerate(ops)
            ]
            step = max(1, len(changes) // n_batches)
            for lo in range(0, len(changes), step):
                batch = spark.createDataFrame(
                    changes[lo:lo + step], CHANGES_SCHEMA
                )
                maintain_kmv_snapshot(
                    spark, base, sk, batch,
                    keys=["k"], group_cols=["g"], value_col="x",
                    seq_col="seq", delete_col="deleted", k=8,
                )
            merged = read_snapshot(spark, base)
            got = arr_dict(read_snapshot(spark, sk))
            want = arr_dict(kmv_build(merged, ["g"], "x", k=8))
            assert got == want

        check()

    def test_hll_maintainer_redelivery_and_lg_k_guard(self, spark, tmp_path):
        from amonaly_detection_in_time_series_data_spark.operators.hll import (
            hll_estimate,
        )
        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_hll_snapshot,
        )

        base = str(tmp_path / "rbase")
        sk = str(tmp_path / "rsk")
        snapshot_commit(
            spark, base,
            spark.createDataFrame([(1, 0, "a", 10), (2, 0, "b", 20)], SCHEMA),
        )
        b1 = spark.createDataFrame(
            [(3, 0, "a", 30, 1, False), (2, 0, "b", 20, 2, True)],
            CHANGES_SCHEMA,
        )
        kw = dict(keys=["k"], group_cols=["g"], value_col="x",
                  seq_col="seq", delete_col="deleted", lg_k=12)
        maintain_hll_snapshot(spark, base, sk, b1, **kw)   # bootstrap
        r2 = maintain_hll_snapshot(spark, base, sk, b1, **kw)  # redelivery
        assert r2["sketch_op"] == "refresh"

        def snap(path):
            return {
                r["g"]: r["est"]
                for r in read_snapshot(spark, path).select(
                    "g", hll_estimate("hll_sketch").alias("est")
                ).collect()
            }

        # group b was emptied by the delete -> dropped; redelivery is a
        # value no-op
        assert snap(sk) == {"a": 2}
        with pytest.raises(ValueError, match="lg_k"):
            maintain_hll_snapshot(
                spark, base, sk, b1, **{**kw, "lg_k": 13}
            )

    def test_refresh_groups_min_max_under_delete(self, spark, tmp_path):
        base_after = spark.createDataFrame(
            [(1, 0, "a", 5), (3, 0, "a", 2), (4, 0, "b", 8)], SCHEMA
        )
        # stale rollup: group a still remembers a deleted max of 99
        stale = spark.createDataFrame(
            [("a", 2, 99), ("b", 8, 8), ("c", 1, 1)],
            "g string, min_x long, max_x long",
        )
        affected = spark.createDataFrame([("a",)], "g string")
        fresh = refresh_groups(
            stale,
            base_after,
            ["g"],
            [F.min("x").alias("min_x"), F.max("x").alias("max_x")],
            affected,
        )
        got = {r["g"]: (r["min_x"], r["max_x"]) for r in fresh.collect()}
        # a recomputed from base; b and c untouched (c not even in base)
        assert got == {"a": (2, 5), "b": (8, 8), "c": (1, 1)}
        # the base scan is pruned map-side by a broadcast semi-join
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and "Broadcast" in plan
