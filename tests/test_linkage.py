"""Blocked fuzzy matching / entity resolution (operators.linkage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.linkage import (
    blocked_fuzzy_join,
)

CATALOG = [
    (1, "goldenrod lace"),
    (2, "golden widget"),
    (3, "crimson bolt"),
    (4, "crimson jolt"),
    (5, "unrelated thing"),
]


class TestBlockedFuzzyJoin:
    def test_matches_within_block_and_distance(self, spark):
        right = spark.createDataFrame(CATALOG, "pid bigint, name string")
        left = spark.createDataFrame(
            [(10, "goldenrod lac"), (11, "crimsn bolt"), (12, "zzz nothing")],
            "qid bigint, q string",
        )
        out = blocked_fuzzy_join(
            left, right, "q", "name", max_edit=2,
            left_keep=["qid"], right_keep=["pid", "name"],
        ).collect()
        best = {
            r["l_qid"]: (r["r_pid"], r["edit_dist"])
            for r in out
            if r["match_rank"] == 1
        }
        assert best[10] == (1, 1)  # dropped char
        assert best[11] == (3, 1)  # "crimsn bolt" -> "crimson bolt"
        assert 12 not in best  # different block, no match
        # "crimson jolt" is edit 2 from "crimsn bolt": present at rank 2
        ranks11 = sorted(
            (r["match_rank"], r["r_pid"]) for r in out if r["l_qid"] == 11
        )
        assert ranks11 == [(1, 3), (2, 4)]

    def test_never_cartesian(self, spark):
        right = spark.createDataFrame(CATALOG, "pid bigint, name string")
        left = spark.createDataFrame([(10, "x y")], "qid bigint, q string")
        df = blocked_fuzzy_join(left, right, "q", "name")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_max_block_size_caps_degenerate_blocks(self, spark):
        # 50 rows all sharing one block: with the cap, zero candidates
        right = spark.createDataFrame(
            [(i, f"aaa-{i:03d}") for i in range(50)], "pid bigint, name string"
        )
        left = spark.createDataFrame([(1, "aaa-001")], "qid bigint, q string")
        uncapped = blocked_fuzzy_join(left, right, "q", "name", max_edit=2)
        assert uncapped.count() > 0
        capped = blocked_fuzzy_join(
            left, right, "q", "name", max_edit=2, max_block_size=10
        )
        assert capped.count() == 0

    def test_all_pairs_mode(self, spark):
        right = spark.createDataFrame(CATALOG, "pid bigint, name string")
        left = spark.createDataFrame(
            [(11, "crimsn bolt")], "qid bigint, q string"
        )
        out = blocked_fuzzy_join(
            left, right, "q", "name", max_edit=2, best_per_left=False
        ).collect()
        assert {r["r_pid"] for r in out} == {3, 4}
        assert all("match_rank" not in r.asDict() for r in out)
