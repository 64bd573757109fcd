"""KMV theta sketches (operators.kmv).

Contract under test:
1. exactness below k (the sketch holds every distinct hash);
2. estimate error envelope at ~1/sqrt(k-2) RSE on a 20k-distinct set;
3. rollup == direct build EXACTLY (array equality — the min-wise
   loss-free property that makes it a summary-table operator);
4. union-of-sketches == sketch-of-union exactly; commutative;
5. intersection/Jaccard estimators recover a planted overlap;
6. the build plan carries WindowGroupLimit (rank-k pushed into partial
   aggregation — the bounded-state scale contract) and both hash
   families work; sketches survive a parquet roundtrip.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.kmv import (
    kmv_build,
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_jaccard_estimate,
    kmv_rollup,
    kmv_union,
)

K = 256


def _ids(spark, lo, hi, key="g"):
    return spark.range(lo, hi).select(
        F.lit(key).alias("g"), F.col("id").alias("v")
    )


class TestKmv:
    def test_exact_below_k(self, spark):
        df = _ids(spark, 0, 100)
        # duplicates must not inflate: union with itself
        df = df.unionByName(df)
        sk = kmv_build(df, ["g"], "v", k=K)
        row = sk.select(
            F.size("kmv").alias("n"),
            kmv_estimate("kmv", K).alias("est"),
        ).collect()[0]
        assert row["n"] == 100
        assert row["est"] == 100.0

    @pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
    def test_estimate_envelope(self, spark, hash_fn):
        n = 20_000
        sk = kmv_build(_ids(spark, 0, n), ["g"], "v", k=K, hash_fn=hash_fn)
        est = sk.select(
            kmv_estimate("kmv", K, hash_fn).alias("e")
        ).collect()[0]["e"]
        rse = 1.0 / math.sqrt(K - 2)
        assert abs(est - n) / n < 5 * rse, f"{hash_fn}: est={est}"

    def test_rollup_equals_direct_exactly(self, spark):
        base = spark.range(0, 30_000).select(
            (F.col("id") % 3).alias("day"),
            F.lit("g").alias("g"),
            (F.col("id") % 7_001).alias("v"),
        )
        per_day = kmv_build(base, ["g", "day"], "v", k=K)
        rolled = kmv_rollup(per_day, ["g"], K)
        direct = kmv_build(base, ["g"], "v", k=K)
        got = rolled.collect()[0]["kmv"]
        want = direct.collect()[0]["kmv"]
        assert got == want  # arrays identical, not just estimates

    def test_union_matches_sketch_of_union(self, spark):
        a = kmv_build(_ids(spark, 0, 6_000), ["g"], "v", k=K)
        b = kmv_build(_ids(spark, 3_000, 9_000), ["g"], "v", k=K)
        joined = a.select(F.col("kmv").alias("ka")).crossJoin(
            b.select(F.col("kmv").alias("kb"))
        )
        u_ab = joined.select(kmv_union("ka", "kb", K).alias("u")).collect()[
            0
        ]["u"]
        u_ba = joined.select(kmv_union("kb", "ka", K).alias("u")).collect()[
            0
        ]["u"]
        direct = kmv_build(_ids(spark, 0, 9_000), ["g"], "v", k=K).collect()[
            0
        ]["kmv"]
        assert u_ab == u_ba == direct

    def test_intersection_recovers_planted_overlap(self, spark):
        # |A|=6000 (0..5999), |B|=6000 (3000..8999): |A∩B|=3000,
        # |A∪B|=9000, J=1/3
        a = kmv_build(_ids(spark, 0, 6_000), ["g"], "v", k=K)
        b = kmv_build(_ids(spark, 3_000, 9_000), ["g"], "v", k=K)
        row = (
            a.select(F.col("kmv").alias("ka"))
            .crossJoin(b.select(F.col("kmv").alias("kb")))
            .select(
                kmv_jaccard_estimate("ka", "kb", K).alias("jac"),
                kmv_intersect_estimate("ka", "kb", K).alias("inter"),
            )
            .collect()[0]
        )
        # Jaccard RSE at k=256 is ~8%; allow 4 sigma on both
        assert abs(row["jac"] - 1 / 3) < 4 * (1 / 3) / math.sqrt(K - 2) + 0.05
        assert abs(row["inter"] - 3_000) / 3_000 < 0.35

    def test_difference_partitions_the_union(self, spark):
        # inter + diff(a,b) + diff(b,a) == union_est BY CONSTRUCTION
        # (all score against the one union sample), and the planted
        # sizes are recovered: |A\B| = |B\A| = 3000 on the 1/3 fixture
        from amonaly_detection_in_time_series_data_spark.operators.kmv import (
            kmv_difference_estimate,
        )

        a = kmv_build(_ids(spark, 0, 6_000), ["g"], "v", k=K)
        b = kmv_build(_ids(spark, 3_000, 9_000), ["g"], "v", k=K)
        row = (
            a.select(F.col("kmv").alias("ka"))
            .crossJoin(b.select(F.col("kmv").alias("kb")))
            .select(
                kmv_intersect_estimate("ka", "kb", K).alias("inter"),
                kmv_difference_estimate("ka", "kb", K).alias("d_ab"),
                kmv_difference_estimate("kb", "ka", K).alias("d_ba"),
                kmv_estimate(kmv_union("ka", "kb", K), K).alias("u"),
            )
            .collect()[0]
        )
        assert row["inter"] + row["d_ab"] + row["d_ba"] == pytest.approx(
            row["u"], rel=1e-12
        )
        assert abs(row["d_ab"] - 3_000) / 3_000 < 0.35
        assert abs(row["d_ba"] - 3_000) / 3_000 < 0.35

    def test_disjoint_sets_intersect_near_zero(self, spark):
        a = kmv_build(_ids(spark, 0, 5_000), ["g"], "v", k=K)
        b = kmv_build(_ids(spark, 100_000, 105_000), ["g"], "v", k=K)
        row = (
            a.select(F.col("kmv").alias("ka"))
            .crossJoin(b.select(F.col("kmv").alias("kb")))
            .select(kmv_jaccard_estimate("ka", "kb", K).alias("jac"))
            .collect()[0]
        )
        assert row["jac"] == 0.0  # same permutation: exact membership

    def test_build_plan_bounded_state(self, spark):
        # real (varying) key: the rank-k filter must push into partial
        # aggregation as WindowGroupLimit so no task buffers more than
        # ~k rows per key. (With a CONSTANT key Catalyst goes further —
        # TakeOrderedAndProject, a global top-k — also bounded.)
        df = spark.range(0, 10_000).select(
            (F.col("id") % 7).alias("g"), F.col("id").alias("v")
        )
        sk = kmv_build(df, ["g"], "v", k=K)
        plan = sk._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, plan[:2000]

    def test_parquet_roundtrip(self, spark, tmp_path):
        sk = kmv_build(_ids(spark, 0, 9_000), ["g"], "v", k=K)
        p = str(tmp_path / "kmv")
        sk.write.parquet(p)
        back = spark.read.parquet(p)
        assert back.collect()[0]["kmv"] == sk.collect()[0]["kmv"]
        est = back.select(kmv_estimate("kmv", K).alias("e")).collect()[0]["e"]
        assert est > 0

    def test_null_values_ignored(self, spark):
        df = spark.createDataFrame(
            [("g", 1), ("g", None), ("g", 2)], "g string, v int"
        )
        sk = kmv_build(df, ["g"], "v", k=K)
        assert sk.select(F.size("kmv")).collect()[0][0] == 2

    def test_empty_and_singleton_sketch_edges(self, spark):
        # r10 VERDICT task: empty/NULL/singleton sketch contract.
        # - two EMPTY sketches: union empty, jaccard/intersect/diff 0.0
        #   (not NULL from 0/0);
        # - a NULL sketch (missing group) propagates NULL — absence of
        #   a sketch is not an empty set;
        # - singleton vs itself: jaccard 1.0, diff 0.0, intersect 1.0
        #   (exact below k);
        # - singleton vs empty: jaccard 0.0, |a\b| = 1.0.
        from amonaly_detection_in_time_series_data_spark.operators.kmv import (
            kmv_difference_estimate,
        )

        df = spark.createDataFrame(
            [
                ("empty_empty", [], []),
                ("null_b", [1], None),
                ("single_self", [7], [7]),
                ("single_empty", [7], []),
            ],
            "label string, a array<bigint>, b array<bigint>",
        )
        rows = {
            r["label"]: r
            for r in df.select(
                "label",
                kmv_jaccard_estimate("a", "b", K).alias("jac"),
                kmv_intersect_estimate("a", "b", K).alias("inter"),
                kmv_difference_estimate("a", "b", K).alias("a_only"),
                F.size(kmv_union("a", "b", K)).alias("u_size"),
            ).collect()
        }
        ee = rows["empty_empty"]
        assert (ee["jac"], ee["inter"], ee["a_only"]) == (0.0, 0.0, 0.0)
        assert ee["u_size"] == 0
        nb = rows["null_b"]
        assert nb["jac"] is None and nb["inter"] is None and nb["a_only"] is None
        ss = rows["single_self"]
        assert (ss["jac"], ss["inter"], ss["a_only"]) == (1.0, 1.0, 0.0)
        se = rows["single_empty"]
        assert (se["jac"], se["inter"], se["a_only"]) == (0.0, 0.0, 1.0)
