"""Self-join view maintenance (operators.ivm r11): the basket
pair-count view under a CDC feed.

Contract under test:
1. property — for ANY change sequence (inserts, updates, deletes, items
   MOVING between baskets, NULL baskets/items) and ANY contiguous batch
   split, the incrementally maintained pair view is EXACTLY equal to
   compute_basket_pairs over the final base;
2. the snapshot driver bootstraps, stays incremental, and a redelivered
   batch is a no-op (recorded-cut protocol);
3. the named delta classes: adding an item to an existing basket
   creates pairs with the basket's EXISTING items (the A⋈ΔA term);
   removing one retracts them; a basket emptied to < 2 items drops out.
"""

from __future__ import annotations

from amonaly_detection_in_time_series_data_spark.operators.ivm import (
    COUNT_COL,
    compute_basket_pairs,
    maintain_basket_snapshot,
)
from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
    read_snapshot,
    snapshot_commit,
)

SCHEMA = "k int, bk int, it string"
CHANGES_SCHEMA = "k int, bk int, it string, seq bigint, deleted boolean"
KW = dict(
    keys=["k"], basket_col="bk", item_col="it",
    seq_col="seq", delete_col="deleted",
)


def _pairs_dict(df):
    return {(r["item_a"], r["item_b"]): r[COUNT_COL] for r in df.collect()}


class TestBasketView:
    def test_random_batches_match_full_recompute(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        OPS = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7),        # key
                st.booleans(),                                # is_delete
                st.sampled_from([0, 1, 2, None]),             # basket (moves!)
                st.sampled_from(["a", "b", "c", "d", None]),  # item
            ),
            min_size=1,
            max_size=14,
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
            view = str(tmp_path / f"pairs_{counter[0]}")
            base_rows = [
                (k, k % 3, "abcd"[k % 4]) for k in range(6)
            ]
            snapshot_commit(
                spark, base, spark.createDataFrame(base_rows, SCHEMA)
            )
            changes = [
                (k, bk, it, seq, is_del)
                for seq, (k, is_del, bk, it) in enumerate(ops)
            ]
            step = max(1, len(changes) // n_batches)
            n_calls = 0
            for lo in range(0, len(changes), step):
                batch = spark.createDataFrame(
                    changes[lo:lo + step], CHANGES_SCHEMA
                )
                res = maintain_basket_snapshot(
                    spark, base, view, batch, **KW
                )
                n_calls += 1
                assert res["pairs_op"] == (
                    "bootstrap" if n_calls == 1 else "incremental"
                )
            got = _pairs_dict(read_snapshot(spark, view))
            want = _pairs_dict(
                compute_basket_pairs(read_snapshot(spark, base), "bk", "it")
            )
            assert got == want

        check()

    def test_join_term_classes_and_redelivery(self, spark, tmp_path):
        base = str(tmp_path / "base")
        view = str(tmp_path / "pairs")
        # basket 0: {a, b}; basket 1: {c}
        snapshot_commit(
            spark, base,
            spark.createDataFrame(
                [(0, 0, "a"), (1, 0, "b"), (2, 1, "c")], SCHEMA
            ),
        )
        b0 = spark.createDataFrame([(9, 9, "z", 0, False)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b0, **KW)  # bootstrap
        assert _pairs_dict(read_snapshot(spark, view)) == {("a", "b"): 1}

        # A⋈ΔA: new item joins basket 0 -> pairs with BOTH existing items
        b1 = spark.createDataFrame([(3, 0, "c", 1, False)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b1, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {
            ("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
        }

        # redelivery of the SAME batch is a no-op (recorded cut)
        maintain_basket_snapshot(spark, base, view, b1, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {
            ("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
        }

        # retraction: delete item b -> only pairs without b survive
        b2 = spark.createDataFrame([(1, 0, "b", 2, True)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b2, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {("a", "c"): 1}

        # move: item a moves to basket 1 -> retracts (a,c) in basket 0,
        # creates (a,c) in basket 1 (c lives there) — net same pair key
        b3 = spark.createDataFrame([(0, 1, "a", 3, False)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b3, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {("a", "c"): 1}

        # emptied below 2 items: delete c from basket 1
        b4 = spark.createDataFrame([(2, 1, "c", 4, True)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b4, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {}

    def test_duplicate_item_rows_count_once(self, spark, tmp_path):
        base = str(tmp_path / "base")
        view = str(tmp_path / "pairs")
        # two keys carry the SAME (basket, item): presence semantics
        snapshot_commit(
            spark, base,
            spark.createDataFrame(
                [(0, 0, "a"), (1, 0, "a"), (2, 0, "b")], SCHEMA
            ),
        )
        b0 = spark.createDataFrame([(9, 9, "z", 0, False)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b0, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {("a", "b"): 1}
        # deleting ONE of the duplicate 'a' rows must NOT retract the pair
        b1 = spark.createDataFrame([(0, 0, "a", 1, True)], CHANGES_SCHEMA)
        maintain_basket_snapshot(spark, base, view, b1, **KW)
        assert _pairs_dict(read_snapshot(spark, view)) == {("a", "b"): 1}

    def test_streaming_sink_stands_up_base_and_view(self, spark, tmp_path):
        """maintain_basket_sink: one foreachBatch sink bootstraps the
        base from the stream schema and keeps the pair view maintained
        per micro-batch; the final view equals a full recompute of the
        final base — the streaming-vs-batch parity contract the other
        sinks pin, here for the self-join class."""
        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_basket_sink,
        )

        base = str(tmp_path / "sbase")
        view = str(tmp_path / "spairs")
        src = tmp_path / "feed"
        batches = [
            # basket 0 = {a, b}; basket 1 = {c}
            [(0, 0, "a", 0, False), (1, 0, "b", 0, False),
             (2, 1, "c", 0, False)],
            # c joins basket 0; a moves to basket 1; b deleted
            [(3, 0, "c", 1, False), (0, 1, "a", 1, False),
             (1, 0, "b", 1, True)],
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
                maintain_basket_sink(base, view, **KW)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = _pairs_dict(read_snapshot(spark, view))
        want = _pairs_dict(
            compute_basket_pairs(read_snapshot(spark, base), "bk", "it")
        )
        # final state: basket 0 = {c}, basket 1 = {a, c} -> one pair
        assert got == want == {("a", "c"): 1}
