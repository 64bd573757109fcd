"""Persistable HLL sketch columns (operators.hll): the
build-once/merge-forever contract.

1. estimates sit inside the published error envelope vs exact counts;
2. rollup of fine-grained sketches == the sketch built directly at the
   coarse grain (merge is loss-free at matched lg_k — estimates EQUAL,
   not approximately equal);
3. sketch bytes survive a parquet round-trip and merge after reload
   (the summary-table pattern end-to-end);
4. distinct counts do not add — the union is NOT the sum (the reason
   sketches exist).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.hll import (
    hll_build,
    hll_estimate,
    hll_rollup,
)


def _events(spark, n=30_000, users=4_000, days=6, seed=1):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(days), f"u{rng.randrange(users)}") for _ in range(n)
    ]
    return spark.createDataFrame(rows, "day long, user string")


class TestHllSketchColumns:
    def test_envelope_and_lossfree_rollup(self, spark):
        df = _events(spark)
        daily = hll_build(df, ["day"], "user", lg_k=12)
        # per-day estimates inside ~5 sigma of the 1.6% RSE envelope
        exact = {
            r["day"]: r["n"]
            for r in df.groupBy("day")
            .agg(F.countDistinct("user").alias("n"))
            .collect()
        }
        for r in daily.select("day", hll_estimate().alias("est")).collect():
            assert abs(r["est"] - exact[r["day"]]) <= 0.08 * exact[r["day"]]

        # rollup of the 6 daily sketches == direct sketch over all rows:
        # estimates EQUAL (merge is loss-free at matched lg_k)
        total_from_rollup = (
            hll_rollup(daily.withColumn("all", F.lit(1)), ["all"])
            .select(hll_estimate().alias("est"))
            .collect()[0]["est"]
        )
        direct = (
            df.withColumn("all", F.lit(1))
            .groupBy("all")
            .agg(F.hll_sketch_agg("user", F.lit(12)).alias("hll_sketch"))
            .select(hll_estimate().alias("est"))
            .collect()[0]["est"]
        )
        assert total_from_rollup == direct

    def test_parquet_roundtrip_then_merge(self, spark, tmp_path):
        df = _events(spark, seed=2)
        daily = hll_build(df, ["day"], "user", lg_k=12)
        path = str(tmp_path / "daily_sketches")
        daily.write.mode("overwrite").parquet(path)
        reloaded = spark.read.parquet(path)
        before = (
            hll_rollup(daily.withColumn("k", F.lit(1)), ["k"])
            .select(hll_estimate().alias("e")).collect()[0]["e"]
        )
        after = (
            hll_rollup(reloaded.withColumn("k", F.lit(1)), ["k"])
            .select(hll_estimate().alias("e")).collect()[0]["e"]
        )
        assert before == after  # bytes are the state; storage changes nothing

    def test_union_is_not_the_sum(self, spark):
        # heavy user overlap between days: summed daily distincts vastly
        # exceed the true union — the failure sketches fix
        df = _events(spark, n=20_000, users=500, days=4, seed=3)
        daily = hll_build(df, ["day"], "user")
        per_day_sum = sum(
            r["e"]
            for r in daily.select(hll_estimate().alias("e")).collect()
        )
        union_est = (
            hll_rollup(daily.withColumn("k", F.lit(1)), ["k"])
            .select(hll_estimate().alias("e")).collect()[0]["e"]
        )
        true_union = df.select("user").distinct().count()
        assert per_day_sum > 2 * true_union
        assert abs(union_est - true_union) <= 0.08 * true_union
