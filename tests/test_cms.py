"""Count-Min sketch (operators.cms): textbook guarantees + mergeability.

Contract under test:
1. cm_est >= true count ALWAYS (counters only over-count);
2. the (eps, delta) envelope: est <= true + eps*N for width=ceil(e/eps)
   on a zipf-ish stream (probabilistic bound checked with slack);
3. merge(sketch(A), sketch(B)) == sketch(A union B) cell-for-cell;
4. both hash families agree on the invariants; the sketch is bounded
   at depth*width cells regardless of input size.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.cms import (
    cm_estimate,
    cm_merge,
    cm_sketch,
)


def _stream_df(spark, seed=0, n=20_000, vocab=2_000):
    rng = random.Random(seed)
    # zipf-ish: item k with weight ~ 1/(k+1)
    rows = [
        (f"item_{min(int(rng.paretovariate(1.1)), vocab)}",)
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "token string")


class TestCountMin:
    @pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
    def test_overestimate_invariant_and_envelope(self, spark, hash_fn):
        df = _stream_df(spark)
        n = df.count()
        depth, width = 4, 256  # eps = e/256 ~ 0.0106, delta = e^-4
        truth = df.groupBy("token").agg(F.count("*").alias("cnt"))
        sk = cm_sketch(df, "token", depth, width, hash_fn)
        est = cm_estimate(truth, sk, "token", depth, width, hash_fn)
        rows = est.collect()
        assert len(rows) > 100
        eps_n = math.e / width * n
        n_at_bound = 0
        for r in rows:
            assert r["cm_est"] >= r["cnt"], r["token"]  # never under
            if r["cm_est"] > r["cnt"] + eps_n:
                n_at_bound += 1
        # P(est > true + eps*N) <= e^-depth per item; allow 3x slack
        assert n_at_bound <= max(3, 3 * math.exp(-depth) * len(rows))

    def test_sketch_is_bounded(self, spark):
        df = _stream_df(spark, seed=1)
        sk = cm_sketch(df, "token", depth=3, width=64)
        assert sk.count() <= 3 * 64
        # exactly depth distinct seed rows
        assert sk.select("seed").distinct().count() == 3

    def test_merge_equals_sketch_of_union(self, spark):
        a = _stream_df(spark, seed=2, n=5_000)
        b = _stream_df(spark, seed=3, n=7_000)
        sk_a = cm_sketch(a, "token", 4, 128)
        sk_b = cm_sketch(b, "token", 4, 128)
        merged = {
            (r["seed"], r["bucket"]): r["cnt"]
            for r in cm_merge(sk_a, sk_b).collect()
        }
        direct = {
            (r["seed"], r["bucket"]): r["cnt"]
            for r in cm_sketch(a.unionByName(b), "token", 4, 128).collect()
        }
        assert merged == direct

    def test_exact_when_no_collisions(self, spark):
        # tiny vocab vs wide sketch: every estimate exact
        df = spark.createDataFrame(
            [(f"t{i % 5}",) for i in range(100)], "token string"
        )
        truth = df.groupBy("token").agg(F.count("*").alias("cnt"))
        sk = cm_sketch(df, "token", 4, 4096)
        for r in cm_estimate(truth, sk, "token", 4, 4096).collect():
            assert r["cm_est"] == r["cnt"]

    def test_unseen_item_estimates_zero_or_collision(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "token string")
        sk = cm_sketch(df, "token", 4, 1024)
        items = spark.createDataFrame([("zzz_never_seen",)], "token string")
        (r,) = cm_estimate(items, sk, "token", 4, 1024).collect()
        assert r["cm_est"] in (0, 1, 2)  # 0 unless it collides

    def test_bad_dims_raise(self, spark):
        df = spark.createDataFrame([("a",)], "token string")
        with pytest.raises(ValueError, match="dims"):
            cm_sketch(df, "token", depth=0, width=16)

    def test_weighted_build_equals_raw_build(self, spark):
        # weighted mode over the (value, count) aggregate must produce
        # IDENTICAL cells to the raw-occurrence stream
        df = _stream_df(spark, seed=5, n=8_000)
        raw = {
            (r["seed"], r["bucket"]): r["cnt"]
            for r in cm_sketch(df, "token", 4, 128).collect()
        }
        counted = df.groupBy("token").agg(F.count("*").alias("w"))
        weighted = {
            (r["seed"], r["bucket"]): r["cnt"]
            for r in cm_sketch(
                counted, "token", 4, 128, weight_col="w"
            ).collect()
        }
        assert weighted == raw
