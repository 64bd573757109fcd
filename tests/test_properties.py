"""Property-based tests (SURVEY.md §5.2 item 4) — hypothesis-generated
series through the Spark operators, invariants asserted exactly:

- lag_k(x)[i] == x[i-k]
- rolling mean over a constant series == that constant
- minmax-scaled output ∈ [0, 1] (constant column -> 0.0, sklearn rule)
- sequence count == max(0, n - L + 1)
- positional dedup output has unique keys and keeps the FIRST arrival
"""

from __future__ import annotations

import math

import pandas as pd

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.dedup import (
    dedup_keep_positional,
)
from amonaly_detection_in_time_series_data_spark.operators.features import (
    add_lag_features,
    add_rolling_features,
)
from amonaly_detection_in_time_series_data_spark.operators.scaling import minmax_scale
from amonaly_detection_in_time_series_data_spark.operators.sequences import (
    create_sequences,
)

FINITE = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
SERIES = st.lists(FINITE, min_size=1, max_size=40)

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _series_df(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "i int, x double"
    )


class TestOperatorProperties:
    @PROP
    @given(xs=SERIES, k=st.integers(min_value=1, max_value=5))
    def test_lag_is_shift(self, spark, xs, k):
        df = _series_df(spark, xs)
        out = add_lag_features(df, "x", [k], key_cols=[], order_cols=["i"])
        rows = {r["i"]: r[f"x_lag_{k}"] for r in out.collect()}
        for i in range(len(xs)):
            expected = xs[i - k] if i - k >= 0 else None
            assert rows[i] == expected

    @PROP
    @given(
        c=FINITE,
        n=st.integers(min_value=2, max_value=30),
        w=st.integers(min_value=1, max_value=8),
    )
    def test_rolling_mean_of_constant_is_constant(self, spark, c, n, w):
        df = _series_df(spark, [c] * n)
        out = add_rolling_features(
            df, "x", windows=[w], aggs=["mean"], key_cols=[], order_cols=["i"]
        )
        rows = {r["i"]: r[f"x_roll_mean_{w}h"] for r in out.collect()}
        assert rows[0] is None  # empty past-only frame at row 0
        for i in range(1, n):
            # approx: sum/count in IEEE754 (e.g. 1.9*3/3) is not exact
            assert rows[i] == pytest.approx(c, rel=1e-12, abs=1e-12)

    @PROP
    @given(xs=SERIES)
    def test_minmax_scale_bounds(self, spark, xs):
        df = _series_df(spark, xs)
        out = minmax_scale(df, ["x"])
        vals = [r["x"] for r in out.collect()]
        if max(xs) == min(xs):
            assert all(v == 0.0 for v in vals)  # sklearn constant-column rule
        else:
            assert all(0.0 <= v <= 1.0 for v in vals)
            assert math.isclose(min(vals), 0.0) and math.isclose(max(vals), 1.0)

    @PROP
    @given(xs=SERIES, L=st.integers(min_value=1, max_value=10))
    def test_sequence_count(self, spark, xs, L):
        df = _series_df(spark, xs).withColumn("ts", F.col("i").cast("timestamp"))
        out = create_sequences(df, ["x"], L, key_cols=[], order_cols=["i"])
        assert out.count() == max(0, len(xs) - L + 1)

    @PROP
    @given(
        xs=SERIES,
        L=st.integers(min_value=1, max_value=10),
        stride=st.integers(min_value=1, max_value=12),
    )
    def test_strided_sequences_are_slices(self, spark, xs, L, stride):
        """r11: for ANY stride, the strided output is exactly the
        stride-1 windows at start offsets 0, stride, 2*stride, ... —
        the groupBy fast path (stride == L) and the filtered window
        path must both equal python slicing of the series."""
        df = _series_df(spark, xs).withColumn("ts", F.col("i").cast("timestamp"))
        out = create_sequences(
            df, ["x"], L, key_cols=[], order_cols=["i"], stride=stride
        )
        rows = sorted(out.collect(), key=lambda r: r["seq_start_ts"])
        want = [
            [[float(v)] for v in xs[s : s + L]]
            for s in range(0, max(0, len(xs) - L + 1), stride)
        ]
        assert [r["seq"] for r in rows] == want

    @PROP
    @given(
        pairs=st.lists(
            st.tuples(st.integers(min_value=0, max_value=5), FINITE),
            min_size=1,
            max_size=40,
        )
    )
    def test_dedup_first_keeps_first_arrival(self, spark, pairs):
        df = spark.createDataFrame(
            [(i, int(k), float(v)) for i, (k, v) in enumerate(pairs)],
            "arrival int, k int, v double",
        )
        out = dedup_keep_positional(df, ["k"], arrival_col="arrival")
        got = {r["k"]: (r["arrival"], r["v"]) for r in out.collect()}
        first = {}
        for i, (k, v) in enumerate(pairs):
            first.setdefault(k, (i, v))
        assert len(got) == len(first)
        for k, (i, v) in first.items():
            assert got[k] == (i, v)


class TestTextProperties:
    """Random token streams through the r5-rewritten text primitives,
    pinned against exact Python oracles — guards the zip_with-over-slices
    formulations (shingles, quality_rules bigrams) against semantic
    regressions on arbitrary inputs, not just the fixtures."""

    @PROP
    @given(
        toks=st.lists(
            st.text(alphabet="abcX", min_size=1, max_size=3),
            min_size=0,
            max_size=30,
        ),
        n=st.integers(min_value=2, max_value=4),
    )
    def test_shingles_match_python_oracle(self, spark, toks, n):
        from amonaly_detection_in_time_series_data_spark.operators.similarity import (
            shingles,
        )

        text = " ".join(toks)
        df = spark.createDataFrame([(1, text)], "id long, text string")
        got = df.select(shingles(F.col("text"), n).alias("g")).collect()[0]["g"]
        low = [t for t in text.lower().split() if t]
        want, seen = [], set()
        if len(low) >= n:
            for i in range(len(low) - n + 1):
                g = " ".join(low[i : i + n])
                if g not in seen:
                    seen.add(g)
                    want.append(g)
        assert got == want

    @PROP
    @given(
        toks=st.lists(
            st.text(alphabet="abyz", min_size=1, max_size=2),
            min_size=0,
            max_size=30,
        )
    )
    def test_quality_rules_bigram_fraction_matches_oracle(self, spark, toks):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            quality_rules,
        )

        text = " ".join(toks)
        df = spark.createDataFrame([(1, text)], "id long, text string")
        row = quality_rules(df).collect()[0]
        low = [t for t in text.lower().split() if t]
        bigrams = [f"{a} {b}" for a, b in zip(low, low[1:])]
        if bigrams:
            want = round(1 - len(set(bigrams)) / len(bigrams), 4)
        else:
            want = 0.0
        assert row["dup_bigram_frac"] == pytest.approx(want, abs=1e-9)
        assert row["n_tokens"] == len(low)


class TestBucketedRollingProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        gaps=st.lists(
            st.integers(min_value=1, max_value=500), min_size=5, max_size=60
        ),
        w=st.integers(min_value=1, max_value=10),
    )
    def test_equals_global_window_for_any_gap_pattern(self, spark, gaps, w):
        """For ARBITRARY inter-arrival gaps (hours; up to ~20 days, so
        buckets may be dense, sparse, or empty relative to the 7-day
        bucket), the parallel bucketed rolling mean equals the
        single-partition global window on every row."""
        import itertools

        from pyspark.sql import Window

        from amonaly_detection_in_time_series_data_spark.operators.features import (
            bucketed_rolling,
        )

        hours = list(itertools.accumulate(gaps))
        rows = [
            (i, (pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h)).to_pydatetime(),
             float((i * 13) % 7))
            for i, h in enumerate(hours)
        ]
        df = spark.createDataFrame(rows, "pos long, ts timestamp, value double")
        got = {
            r["pos"]: r[f"value_roll_mean_{w}h"]
            for r in bucketed_rolling(
                df, "value", w, ["mean"], ["ts", "pos"], bucket="7 days"
            ).collect()
        }
        wspec = Window.orderBy("ts", "pos").rowsBetween(-w, -1)
        want = {
            r["pos"]: r["exp"]
            for r in df.withColumn("exp", F.avg("value").over(wspec)).collect()
        }
        assert len(got) == len(want) == len(rows)
        for pos, exp in want.items():
            if exp is None:
                assert got[pos] is None, pos
            else:
                assert got[pos] == pytest.approx(exp, rel=1e-9), pos


class TestIntervalJoinProperties:
    @PROP
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 500_000)),
            min_size=1, max_size=25,
        ),
        ivs=st.lists(
            st.tuples(
                st.integers(0, 2), st.integers(0, 500_000), st.integers(1, 200_000)
            ),
            min_size=1, max_size=12,
        ),
        bucket=st.sampled_from([3_600, 86_400]),
    )
    def test_matches_brute_force_containment(self, spark, pts, ivs, bucket):
        """Bucketized equi-join form == brute-force [start, end)
        containment for arbitrary keys, offsets, durations, buckets."""
        import datetime as dt

        from amonaly_detection_in_time_series_data_spark.operators.timeseries import (
            point_in_interval_join,
        )

        t0 = dt.datetime(2024, 1, 1)
        prow = [
            (i, f"k{k}", t0 + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(pts)
        ]
        irow = [
            (j, f"k{k}", t0 + dt.timedelta(seconds=s),
             t0 + dt.timedelta(seconds=s + d))
            for j, (k, s, d) in enumerate(ivs)
        ]
        pdf = spark.createDataFrame(
            prow, "pid int, key string, ts timestamp"
        )
        idf = spark.createDataFrame(
            irow, "iid int, key string, start timestamp, end timestamp"
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in point_in_interval_join(
                pdf, idf, ["key"], "ts", "start", "end", bucket_seconds=bucket
            ).collect()
        )
        want = sorted(
            (i, j)
            for i, (pk, ps) in enumerate(pts)
            for j, (ik, is_, d) in enumerate(ivs)
            if pk == ik and is_ <= ps < is_ + d
        )
        assert got == want


class TestMixtureResampleProperties:
    @PROP
    @given(
        counts=st.lists(st.integers(1, 40), min_size=2, max_size=5),
        weights=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=5),
    )
    def test_quota_invariants(self, spark, counts, weights):
        """For any domain sizes and positive weights: quota_d <= n_d
        (never upsamples), quota_d = floor(w_norm_d * S) with
        S = min floor(n_d / w_norm_d), and exactly quota_d rows kept."""
        import math

        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            mixture_resample,
        )

        k = min(len(counts), len(weights))
        counts, weights = counts[:k], weights[:k]
        rows = [
            (d * 1000 + i, f"d{d}")
            for d, n in enumerate(counts)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, domain string")
        tw = {f"d{d}": w for d, w in enumerate(weights)}
        out = mixture_resample(df, "domain", "id", tw).collect()
        total_w = sum(weights)
        wn = [w / total_w for w in weights]
        s_feasible = min(math.floor(n / w) for n, w in zip(counts, wn))
        kept = {}
        quota = {}
        for r in out:
            kept[r["domain"]] = kept.get(r["domain"], 0) + r["mix_keep"]
            quota[r["domain"]] = r["mix_quota"]
        for d, (n, w) in enumerate(zip(counts, wn)):
            name = f"d{d}"
            expect = min(math.floor(w * s_feasible), n)
            assert quota[name] == expect, (name, quota[name], expect)
            assert kept[name] == expect
            assert quota[name] <= n


class TestDetectorProperties:
    """Invariants of the r6 detector battery, hypothesis-generated."""

    @PROP
    @given(xs=st.lists(FINITE, min_size=2, max_size=40))
    def test_page_hinkley_stats_nonnegative_and_zero_start(self, spark, xs):
        from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
            page_hinkley,
        )

        df = spark.createDataFrame(
            [("k", i, float(x)) for i, x in enumerate(xs)],
            "key string, i int, value double",
        )
        out = page_hinkley(df, "value", ["key"], ["i"]).orderBy("i").collect()
        # first observation: u == min(u), d == max(d) -> both stats 0
        assert out[0]["ph_inc"] == 0.0 and out[0]["ph_dec"] == 0.0
        for r in out:
            assert r["ph_inc"] >= 0 and r["ph_dec"] >= 0
        # constant series stays identically 0 (xbar == x at every step)
        cst = spark.createDataFrame(
            [("k", i, 7.5) for i in range(10)], "key string, i int, value double"
        )
        for r in page_hinkley(cst, "value", ["key"], ["i"]).collect():
            assert r["ph_inc"] == 0.0 and r["ph_dec"] == 0.0 and r["ph_alarm"] == 0

    @PROP
    @given(xs=st.lists(FINITE, min_size=2, max_size=30))
    def test_ewma_between_window_extremes(self, spark, xs):
        from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
            ewma_deviation,
        )

        df = spark.createDataFrame(
            [("k", i, float(x)) for i, x in enumerate(xs)],
            "key string, i int, value double",
        )
        out = (
            ewma_deviation(df, "value", 8, ["key"], ["i"]).orderBy("i").collect()
        )
        assert out[0]["ewma"] is None
        for t, r in enumerate(out):
            if r["ewma"] is None:
                continue
            window = xs[max(0, t - 8) : t]
            lo, hi = min(window), max(window)
            # a convex combination of the window can't leave [min, max]
            assert lo - 1e-9 <= r["ewma"] <= hi + 1e-9, (t, r["ewma"], window)

    @PROP
    @given(xs=st.lists(FINITE, min_size=4, max_size=40))
    def test_iqr_fences_bracket_quartiles(self, spark, xs):
        from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
            iqr_flags,
        )

        df = spark.createDataFrame(
            [("k", i, float(x)) for i, x in enumerate(xs)],
            "key string, i int, value double",
        )
        out = iqr_flags(df, "value", ["key"]).collect()
        lo, hi = out[0]["iqr_lo"], out[0]["iqr_hi"]
        assert lo <= hi
        srt = sorted(xs)
        import numpy as np

        q1, q3 = np.percentile(srt, [25, 75], method="linear")
        assert lo <= q1 + 1e-9 and hi >= q3 - 1e-9
        # flags agree with the fences row-by-row
        for r in out:
            want = int(r["value"] < lo or r["value"] > hi)
            assert r["iqr_alarm"] == want

    @PROP
    @given(xs=st.lists(FINITE, min_size=3, max_size=30))
    def test_robust_median_is_true_median(self, spark, xs):
        import numpy as np

        from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
            robust_zscore_flags,
        )

        df = spark.createDataFrame(
            [("k", i, float(x)) for i, x in enumerate(xs)],
            "key string, i int, value double",
        )
        out = robust_zscore_flags(df, "value", ["key"]).collect()
        assert out[0]["med"] == pytest.approx(float(np.median(xs)), rel=1e-9, abs=1e-9)
        dev = [abs(x - float(np.median(xs))) for x in xs]
        assert out[0]["mad"] == pytest.approx(float(np.median(dev)), rel=1e-9, abs=1e-9)


class TestSessionFormulationAgreement:
    """Two INDEPENDENT session implementations — the batch lag/cumsum
    ``sessionize`` (strict ``> gap`` starts a new session) and Spark's
    native gap-merged ``session_window`` (inclusive ``last + gap``
    boundary, measured) — must produce identical sessions on any input.
    Integer-second event times make exact-boundary collisions likely,
    so the agreement is fuzzed right where the contracts could diverge.
    """

    @PROP
    @given(
        offsets=st.lists(
            st.integers(min_value=0, max_value=240),
            min_size=1,
            max_size=25,
            unique=True,
        ),
        gap_s=st.sampled_from([30, 60, 120]),
    )
    def test_sessionize_equals_session_window(self, spark, offsets, gap_s):
        from amonaly_detection_in_time_series_data_spark.operators.timeseries import (
            sessionize,
        )
        from amonaly_detection_in_time_series_data_spark.streaming.rolling import (
            sessionized_stats,
        )

        df = spark.createDataFrame(
            [(1, o, 1.0) for o in offsets], "user_id int, off int, value double"
        ).select(
            "user_id",
            F.timestamp_seconds(F.lit(1700000000) + F.col("off")).alias("ts"),
            "value",
        )

        native = {
            (r["session_start"], r["session_end"], r["n_events"])
            for r in sessionized_stats(
                df, gap=f"{gap_s} seconds", key="user_id"
            ).collect()
        }
        derived = {
            (r["s"], r["e"], r["n"])
            for r in sessionize(
                df, ["user_id"], "ts", gap=f"{gap_s} seconds"
            )
            .groupBy("session_id")
            .agg(
                F.min("ts").alias("s"),
                (F.max("ts") + F.expr(f"INTERVAL {gap_s} seconds")).alias("e"),
                F.count("*").alias("n"),
            )
            .collect()
        }
        assert native == derived
