"""Binned histogram sketches (operators.binsketch) — the ADDITIVE
summary-table sketch.

Contract under test:
1. bin assignment: underflow/overflow/interior/NULL edges, fp edge at
   hi;
2. quantile estimates land within one bin width of the exact
   percentile (the operator's stated bound) and hit exact values on
   point-mass distributions;
3. rollup == direct build EXACTLY (linearity);
4. THE differentiator: the sketch table is maintained by the EXISTING
   additive IVM machinery (maintain_agg_snapshot, bin columns as
   sum_cols) under ANY change sequence and batch split — deletes
   retract, no affected-group rescan — bit-equal to a from-scratch
   rebuild (hypothesis property, like the HLL/KMV ones but through the
   delta-fold path);
5. empty/degenerate sketches -> NULL quantile; invalid params raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.binsketch import (
    hist_array,
    hist_bin,
    hist_quantile,
    hist_rollup,
    hist_sketch,
)

B = 10  # interior bins over [0, 100) in most tests -> width 10


class TestBinSketch:
    def test_bin_edges(self, spark):
        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (9.999,), (10.0,), (99.999,), (100.0,),
             (250.0,), (None,)],
            "v double",
        )
        got = [
            r["b"]
            for r in df.select(hist_bin("v", 0.0, 100.0, B).alias("b")).collect()
        ]
        assert got == [0, 1, 1, 2, 10, 11, 11, None]

    def test_quantiles_within_one_bin_width(self, spark):
        df = spark.range(0, 10_000).select(
            (F.col("id") % 100).cast("double").alias("v"),
            F.lit("g").alias("g"),
        )
        sk = hist_sketch(df, ["g"], "v", 0.0, 100.0, B)
        row = sk.select(
            *[
                hist_quantile(hist_array(B), q, 0.0, 100.0, B).alias(f"q{i}")
                for i, q in enumerate((0.1, 0.5, 0.9))
            ]
        ).collect()[0]
        exact = {0: 9.9, 1: 49.5, 2: 89.1}  # uniform over 0..99
        for i, q in enumerate((0.1, 0.5, 0.9)):
            assert row[f"q{i}"] == pytest.approx(100 * q, abs=10.0), (q, row)

    def test_point_mass_exact(self, spark):
        # all mass in one interior bin: the interpolated quantile sits
        # inside that bin for every q
        df = spark.createDataFrame([(42.0,)] * 8, "v double").withColumn(
            "g", F.lit("g")
        )
        sk = hist_sketch(df, ["g"], "v", 0.0, 100.0, B)
        for q in (0.0, 0.25, 1.0):
            got = sk.select(
                hist_quantile(hist_array(B), q, 0.0, 100.0, B).alias("e")
            ).collect()[0]["e"]
            assert 40.0 <= got <= 50.0, (q, got)

    def test_under_overflow_clamp(self, spark):
        df = spark.createDataFrame(
            [(-10.0,), (-5.0,), (500.0,)], "v double"
        ).withColumn("g", F.lit("g"))
        sk = hist_sketch(df, ["g"], "v", 0.0, 100.0, B)
        lo_q = sk.select(
            hist_quantile(hist_array(B), 0.1, 0.0, 100.0, B).alias("e")
        ).collect()[0]["e"]
        hi_q = sk.select(
            hist_quantile(hist_array(B), 0.99, 0.0, 100.0, B).alias("e")
        ).collect()[0]["e"]
        assert lo_q == 0.0 and hi_q == 100.0

    def test_rollup_equals_direct_exactly(self, spark):
        df = spark.range(0, 5_000).select(
            (F.col("id") % 3).alias("g"),
            (F.col("id") % 2).alias("g2"),
            (F.col("id") % 137).cast("double").alias("v"),
        )
        fine = hist_sketch(df, ["g", "g2"], "v", 0.0, 100.0, B)
        rolled = {
            r["g"]: r
            for r in hist_rollup(fine, ["g"], B).collect()
        }
        direct = {
            r["g"]: r for r in hist_sketch(df, ["g"], "v", 0.0, 100.0, B).collect()
        }
        assert rolled.keys() == direct.keys()
        cols = [f"b{i}" for i in range(B + 2)]
        for g in direct:
            assert [rolled[g][c] for c in cols] == [direct[g][c] for c in cols]

    def test_nulls_ignored_and_empty_null(self, spark):
        df = spark.createDataFrame(
            [("g", None), ("g", 5.0), ("h", None)], "g string, v double"
        )
        sk = hist_sketch(df, ["g"], "v", 0.0, 100.0, B)
        rows = {r["g"]: r for r in sk.collect()}
        assert sum(rows["g"][f"b{i}"] for i in range(B + 2)) == 1
        assert sum(rows["h"][f"b{i}"] for i in range(B + 2)) == 0
        ests = {
            r["g"]: r["e"]
            for r in sk.select(
                "g", hist_quantile(hist_array(B), 0.5, 0.0, 100.0, B).alias("e")
            ).collect()
        }
        assert ests["h"] is None and ests["g"] is not None

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="hi > lo"):
            hist_bin("v", 10.0, 10.0, 4)
        with pytest.raises(ValueError, match="n_bins"):
            hist_bin("v", 0.0, 1.0, 0)
        with pytest.raises(ValueError, match="q must be"):
            hist_quantile("c", 1.5, 0.0, 1.0, 4)

    def test_one_shuffle_no_explode(self, spark):
        df = spark.range(0, 10_000).select(
            (F.col("id") % 7).alias("g"), (F.col("id") % 97).cast("double").alias("v")
        )
        sk = hist_sketch(df, ["g"], "v", 0.0, 100.0, B)
        plan = sk._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") == 1, plan[:1500]
        assert "Generate" not in plan and "BatchEvalPython" not in plan
        assert "partial" in plan.lower()  # map-side combine

    def test_maintained_by_additive_ivm_matches_rebuild(self, spark, tmp_path):
        """The point of the wide layout: bin columns are sum_cols for
        maintain_agg_snapshot, so ANY change sequence (updates, deletes,
        group moves, NULL groups/values) under ANY contiguous batch
        split keeps the sketch table bit-equal to a from-scratch
        rebuild — via pure delta folds, no affected-group rescan."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from amonaly_detection_in_time_series_data_spark.operators.ivm import (
            maintain_agg_snapshot,
        )
        from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
            read_snapshot,
        )

        NB = 4  # [0, 40) in 4 bins + under/over
        cols = [f"b{i}" for i in range(NB + 2)]
        OPS = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),     # key
                st.booleans(),                             # is_delete
                st.one_of(
                    st.none(),
                    st.floats(min_value=-10, max_value=60,
                              allow_nan=False, allow_infinity=False),
                ),                                         # value
                st.sampled_from(["a", "b", None]),         # group
            ),
            min_size=1,
            max_size=10,
        )
        counter = [0]

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(ops=OPS, cut=st.integers(min_value=0, max_value=10))
        def run(ops, cut):
            counter[0] += 1
            base = str(tmp_path / f"hb{counter[0]}")
            agg = str(tmp_path / f"ha{counter[0]}")
            cut = min(cut, len(ops))
            batches = [b for b in (ops[:cut], ops[cut:]) if b]
            seq = 0
            for batch in batches:
                rows = []
                for k, is_del, v, g in batch:
                    rows.append((k, g, v, seq, is_del))
                changes = spark.createDataFrame(
                    rows, "k int, g string, v double, seq bigint, deleted boolean"
                )
                # bin columns derive map-side from the value BEFORE the
                # maintainer sees the batch — the sketch build riding a
                # CDC feed
                binned = changes.select(
                    "k", "g", "seq", "deleted",
                    *[
                        F.coalesce(
                            (hist_bin("v", 0.0, 40.0, NB) == i).cast("bigint"),
                            F.lit(0),
                        ).alias(c)
                        for i, c in enumerate(cols)
                    ],
                )
                if seq == 0:
                    from amonaly_detection_in_time_series_data_spark.operators.snapshots import (
                        snapshot_commit,
                    )

                    snapshot_commit(
                        spark, base,
                        spark.createDataFrame(
                            [], binned.drop("seq", "deleted").schema
                        ),
                    )
                maintain_agg_snapshot(
                    spark, base, agg, binned, keys=["k"], group_cols=["g"],
                    sum_cols=cols, seq_col="seq", delete_col="deleted",
                )
                seq += 1
            got = {
                r["g"]: tuple(r[c] for c in cols)
                for r in read_snapshot(spark, agg).collect()
            }
            want = {
                r["g"]: tuple(r[c] for c in cols)
                for r in read_snapshot(spark, base)
                .groupBy("g")
                .agg(*[F.sum(c).alias(c) for c in cols])
                .collect()
            }
            assert got == want

        run()
