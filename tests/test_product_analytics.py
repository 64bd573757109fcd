"""Funnel and cohort-retention analytics: hand fixtures, a
chained-min-join reference implementation differential, and
partition invariance."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
    cohort_retention,
    funnel_steps,
    funnel_user_depth,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), e) for u, m, e in rows],
        "user_id string, ts timestamp, event string",
    )


STEPS = ["signup", "view", "purchase"]


def _ref_depth(pdf: pd.DataFrame, steps) -> dict[str, int]:
    """Chained min-over-filter reference (the oracle-SQL formulation)."""
    out = {}
    for u, g in pdf.groupby("user_id"):
        last = None
        depth = 0
        for s in steps:
            cand = g[g.event == s]
            if last is not None:
                cand = cand[cand.ts > last]
            if len(cand) == 0:
                break
            last = cand.ts.min()
            depth += 1
        out[u] = depth
    return out


class TestFunnel:
    def test_hand_fixture(self, spark):
        rows = [
            # u1 completes everything in order
            ("u1", 0, "signup"), ("u1", 5, "view"), ("u1", 9, "purchase"),
            # u2 purchases BEFORE viewing -> depth 2 only... but a later
            # purchase exists, so depth 3 via the later one
            ("u2", 0, "signup"), ("u2", 1, "purchase"), ("u2", 2, "view"),
            ("u2", 3, "purchase"),
            # u3 same-timestamp view (not strictly later) -> stuck at 1
            ("u3", 0, "signup"), ("u3", 0, "view"),
            # u4 never signs up -> 0
            ("u4", 0, "view"), ("u4", 1, "purchase"),
        ]
        df = _ev(spark, rows)
        depth = {
            r["user_id"]: r["funnel_depth"]
            for r in funnel_user_depth(df, "ts", "user_id", "event", STEPS).collect()
        }
        assert depth == {"u1": 3, "u2": 3, "u3": 1, "u4": 0}
        fun = (
            funnel_steps(df, "ts", "user_id", "event", STEPS)
            .toPandas()
            .sort_values("step_idx")
            .reset_index(drop=True)
        )
        assert fun["users"].tolist() == [3, 2, 2]
        assert fun["conv_from_first"].tolist() == [1.0, 2 / 3, 2 / 3]
        assert fun["conv_from_prev"].tolist() == [1.0, 2 / 3, 1.0]

    def test_zero_user_steps_still_emitted(self, spark):
        df = _ev(spark, [("u1", 0, "signup")])
        fun = funnel_steps(df, "ts", "user_id", "event", STEPS).toPandas()
        assert len(fun) == 3
        got = fun.sort_values("step_idx")["users"].tolist()
        assert got == [1, 0, 0]
        assert fun.sort_values("step_idx")["conv_from_first"].tolist() == [1.0, 0.0, 0.0]

    def test_differential_vs_chained_min_join(self, spark):
        rng = np.random.default_rng(44)
        evs = ["signup", "view", "click", "purchase", "error"]
        rows = [
            (
                f"u{rng.integers(0, 40)}",
                int(rng.integers(0, 500)),
                evs[rng.integers(0, len(evs))],
            )
            for _ in range(2000)
        ]
        df = _ev(spark, rows)
        steps = ["signup", "view", "click", "purchase"]
        got = {
            r["user_id"]: r["funnel_depth"]
            for r in funnel_user_depth(df, "ts", "user_id", "event", steps).collect()
        }
        pdf = pd.DataFrame(
            [(u, T0 + dt.timedelta(minutes=m), e) for u, m, e in rows],
            columns=["user_id", "ts", "event"],
        )
        ref = _ref_depth(pdf, steps)
        ref = {u: d for u, d in ref.items() if pdf[pdf.user_id == u].event.isin(steps).any()}
        assert got == ref

    def test_partition_invariance(self, spark):
        rng = np.random.default_rng(45)
        rows = [
            (f"u{rng.integers(0, 20)}", int(rng.integers(0, 300)), s)
            for s in ["signup", "view", "purchase"] * 300
        ]
        df = _ev(spark, rows)
        a = funnel_steps(df, "ts", "user_id", "event", STEPS).toPandas()
        b = funnel_steps(df.repartition(17), "ts", "user_id", "event", STEPS).toPandas()
        k = "step_idx"
        pd.testing.assert_frame_equal(
            a.sort_values(k).reset_index(drop=True),
            b.sort_values(k).reset_index(drop=True),
        )

    def test_duplicate_steps_raise(self, spark):
        df = _ev(spark, [("u1", 0, "signup")])
        with pytest.raises(ValueError, match="distinct"):
            funnel_steps(df, "ts", "user_id", "event", ["a", "a"])


class TestCohortRetention:
    def test_hand_fixture_days(self, spark):
        rows = [
            ("a", 0, "x"), ("a", 60 * 24, "x"), ("a", 60 * 48, "x"),  # days 0,1,2
            ("b", 0, "x"), ("b", 60 * 48, "x"),                       # days 0,2
            ("c", 60 * 24, "x"),                                      # day 1 only
        ]
        df = _ev(spark, rows)
        out = cohort_retention(df, "ts", "user_id", period="day").toPandas()
        out = out.sort_values(["cohort", "offset"]).reset_index(drop=True)
        d1 = dt.date(2024, 3, 1)
        d2 = dt.date(2024, 3, 2)
        got = {
            (r.cohort, r.offset): (r.users, r.cohort_size, r.retention)
            for r in out.itertuples()
        }
        assert got[(d1, 0)] == (2, 2, 1.0)
        assert got[(d1, 1)] == (1, 2, 0.5)
        assert got[(d1, 2)] == (2, 2, 1.0)
        assert got[(d2, 0)] == (1, 1, 1.0)
        assert len(got) == 4

    def test_week_offsets_integral(self, spark):
        rng = np.random.default_rng(46)
        rows = [
            (f"u{rng.integers(0, 30)}", int(rng.integers(0, 60 * 24 * 35)), "x")
            for _ in range(1500)
        ]
        df = _ev(spark, rows)
        out = cohort_retention(df, "ts", "user_id", period="week").toPandas()
        assert (out["offset"] >= 0).all()
        assert (out["users"] <= out["cohort_size"]).all()
        base = out[out.offset == 0]
        assert (base["retention"] == 1.0).all()
        # every user's cohort has an offset-0 cell (by construction)
        assert out.groupby("cohort")["offset"].min().eq(0).all()

    def test_bad_period_raises(self, spark):
        df = _ev(spark, [("u1", 0, "x")])
        with pytest.raises(ValueError, match="period"):
            cohort_retention(df, "ts", "user_id", period="month")


class TestTransitionMatrix:
    def _df(self, spark):
        # two sessions for user 1, one for user 2; transitions must not
        # cross session boundaries
        rows = [
            # (user, session, t, type)
            (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "buy"),
            (1, 2, 4, "view"), (1, 2, 5, "view"),
            (2, 1, 1, "view"), (2, 1, 2, "click"), (2, 1, 3, "view"),
        ]
        return spark.createDataFrame(
            rows, "user_id long, session_id long, t long, event_type string"
        )

    def test_counts_and_probs_hand_computed(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
            transition_matrix,
        )

        tm = {
            (r["from_type"], r["to_type"]): (r["cnt"], r["prob"])
            for r in transition_matrix(
                self._df(spark), ["user_id", "session_id"], ["t"]
            ).collect()
        }
        # transitions: v->c (u1s1), c->b (u1s1), v->v (u1s2),
        #              v->c (u2s1), c->v (u2s1)
        assert tm[("view", "click")][0] == 2
        assert tm[("click", "buy")][0] == 1
        assert tm[("view", "view")][0] == 1
        assert tm[("click", "view")][0] == 1
        # no cross-session transition buy->view (s1 ends at buy)
        assert ("buy", "view") not in tm
        # row-normalization: from 'view' -> 2/3 click, 1/3 view
        assert tm[("view", "click")][1] == pytest.approx(2 / 3)
        assert tm[("view", "view")][1] == pytest.approx(1 / 3)
        assert tm[("click", "buy")][1] == pytest.approx(1 / 2)

    def test_output_bounded_by_vocab_squared(self, spark):
        import random

        from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
            transition_matrix,
        )

        rng = random.Random(3)
        rows = [
            (i % 7, i % 31, i, rng.choice(["a", "b", "c"]))
            for i in range(3_000)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, session_id long, t long, event_type string"
        )
        tm = transition_matrix(df, ["user_id", "session_id"], ["t"])
        assert tm.count() <= 9
        # probs row-normalize to 1 per from_type
        from pyspark.sql import functions as SF

        sums = tm.groupBy("from_type").agg(SF.sum("prob").alias("s")).collect()
        for r in sums:
            assert r["s"] == pytest.approx(1.0)


class TestJourneyPaths:
    """journey_paths (r12): length-k run counts vs a Python brute
    force — session boundaries, NULL-run dropping, exact shares."""

    def _brute(self, rows, k):
        by_u = {}
        for u, ts, eid, et in rows:
            by_u.setdefault(u, []).append((ts, eid, et))
        counts = {}
        for evs in by_u.values():
            evs.sort()
            types = [e[2] for e in evs]
            for i in range(len(types) - k + 1):
                run = types[i:i + k]
                if any(t is None for t in run):
                    continue
                counts[">".join(run)] = counts.get(">".join(run), 0) + 1
        total = sum(counts.values())
        return {p: (c, c / total) for p, c in counts.items()}

    def test_matches_brute_force(self, spark):
        import datetime as dt

        from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
            journey_paths,
        )

        B = dt.datetime(2024, 1, 1)
        rows = [
            (1, B, 1, "a"), (1, B, 2, "b"), (1, B, 3, "c"), (1, B, 4, "a"),
            (2, B, 5, "a"), (2, B, 6, "b"), (2, B, 7, None), (2, B, 8, "c"),
            (3, B, 9, "a"), (3, B, 10, "b"),  # too short for k=3
        ]
        df = spark.createDataFrame(
            rows, "u bigint, ts timestamp, eid bigint, et string"
        )
        for k in (2, 3, 4):
            got = {
                r["path"]: (r["cnt"], r["share"])
                for r in journey_paths(
                    df, ["u"], ["ts", "eid"], "et", k=k
                ).collect()
            }
            assert got == self._brute(rows, k)
        # sessions never crossed: user 3's 'b' followed by user 1's 'a'
        # would fabricate b>a at k=2 — assert absent unless organic
        got2 = self._brute(rows, 2)
        assert "c>a" in got2  # within user 1

    def test_k_validation(self, spark):
        import pytest as _pytest

        from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
            journey_paths,
        )

        df = spark.createDataFrame([(1, 1, "a")], ["u", "o", "et"])
        with _pytest.raises(ValueError):
            journey_paths(df, ["u"], ["o"], "et", k=1)


class TestWindowFunnel:
    """funnel with the r12 `within` deadline: greedy chain anchored at
    the user's first step-1 event, every step within the window."""

    @staticmethod
    def _ref_depth_within(pdf, steps, within_s):
        out = {}
        for u, g in pdf.groupby("user_id"):
            last = None
            anchor = None
            depth = 0
            for s in steps:
                cand = g[g.event == s]
                if last is not None:
                    cand = cand[cand.ts > last]
                if anchor is not None:
                    cand = cand[cand.ts <= anchor + pd.Timedelta(seconds=within_s)]
                if len(cand) == 0:
                    break
                last = cand.ts.min()
                if anchor is None:
                    anchor = last
                depth += 1
            out[u] = depth
        return out

    def test_deadline_binds(self, spark):
        rows = [
            # u1: completes within 10s of signup
            ("u1", 0, "signup"), ("u1", 3, "view"), ("u1", 8, "purchase"),
            # u2: view inside, purchase OUTSIDE the window -> depth 2
            ("u2", 0, "signup"), ("u2", 5, "view"), ("u2", 7200, "purchase"),
            # u3: a LATER signup would allow full depth, but the anchor
            # is the FIRST signup -> view at 7000 is out of window
            ("u3", 0, "signup"), ("u3", 6995, "signup"),
            ("u3", 7000, "view"), ("u3", 7001, "purchase"),
        ]
        df = _ev(spark, rows)
        got = {
            r["user_id"]: r["funnel_depth"]
            for r in funnel_user_depth(
                df, "ts", "user_id", "event", STEPS, within="1 hours"
            ).collect()
        }
        want = self._ref_depth_within(df.toPandas(), STEPS, 3600)
        assert got == dict(want)
        assert got == {"u1": 3, "u2": 2, "u3": 1}

    def test_no_deadline_identical_to_plain(self, spark):
        rows = [
            ("u1", 0, "signup"), ("u1", 5, "view"), ("u1", 9, "purchase"),
            ("u2", 0, "signup"), ("u2", 400000, "view"),  # 277 days later
        ]
        df = _ev(spark, rows)
        plain = {
            r["user_id"]: r["funnel_depth"]
            for r in funnel_user_depth(df, "ts", "user_id", "event", STEPS).collect()
        }
        wide = {
            r["user_id"]: r["funnel_depth"]
            for r in funnel_user_depth(
                df, "ts", "user_id", "event", STEPS, within="365 days"
            ).collect()
        }
        assert plain == wide

    def test_bad_within_raises(self, spark):
        import pytest as _pytest

        df = _ev(spark, [("u1", 0, "signup")])
        with _pytest.raises(ValueError):
            funnel_user_depth(
                df, "ts", "user_id", "event", STEPS, within="whenever"
            )
