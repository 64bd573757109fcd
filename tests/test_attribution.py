"""attribution_credit (first/last/linear/position/decay marketing
attribution): equality against a Python brute force — strict-earlier
touch window, equal-timestamp tie resolution via the struct min/max,
exact ppm splits (linear, U-shaped 40-20-40, quantized half-life
decay), the (direct) fallback, and lookback-boundary edges.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
    attribution_credit,
)

BASE = dt.datetime(2024, 1, 1)
TOUCH_TYPES = ("view", "click", "email")
LOOKBACK_US = 7 * 86_400_000_000


def _brute(rows):
    # rows: (user, dt, event_type); conversions are 'purchase'
    out: dict[tuple, list] = {}
    by_user: dict[object, list] = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    for u, evs in by_user.items():
        for t, e in evs:
            if e != "purchase":
                continue
            c_us = int(t.timestamp() * 1_000_000)
            touches = [
                (int(tt.timestamp() * 1_000_000), ee)
                for tt, ee in evs
                if ee in TOUCH_TYPES
                and c_us - LOOKBACK_US
                <= int(tt.timestamp() * 1_000_000)
                <= c_us - 1
            ]
            first = min(touches)[1] if touches else "(direct)"
            last = max(touches)[1] if touches else "(direct)"
            for model, ch in (("first", first), ("last", last)):
                e2 = out.setdefault((model, ch), [0, 0])
                e2[0] += 1
                e2[1] += 1_000_000
            if touches:
                ppm = 1_000_000 // len(touches)
                for _, ch in touches:
                    e2 = out.setdefault(("linear", ch), [0, 0])
                    e2[0] += 1
                    e2[1] += ppm
                srt = sorted(touches)
                n = len(srt)
                if n == 1:
                    credits = [(srt[0][1], 1_000_000)]
                elif n == 2:
                    credits = [(srt[0][1], 500_000), (srt[1][1], 500_000)]
                else:
                    credits = (
                        [(srt[0][1], 400_000)]
                        + [(t[1], 200_000 // (n - 2)) for t in srt[1:-1]]
                        + [(srt[-1][1], 400_000)]
                    )
                for ch, ppm2 in credits:
                    e2 = out.setdefault(("position", ch), [0, 0])
                    e2[0] += 1
                    e2[1] += ppm2
                hl = 86_400_000_000
                ks = [(c_us - tu) // hl for tu, _ in srt]
                kmin = min(ks)
                ws = [1 << (40 - min(k - kmin, 40)) for k in ks]
                sumw = sum(ws)
                for (tu, ch), w in zip(srt, ws):
                    e2 = out.setdefault(("decay", ch), [0, 0])
                    e2[0] += 1
                    e2[1] += (1_000_000 * w) // sumw
            else:
                for model in ("linear", "position", "decay"):
                    e2 = out.setdefault((model, "(direct)"), [0, 0])
                    e2[0] += 1
                    e2[1] += 1_000_000
    return {k: tuple(v) for k, v in out.items()}


def _run(spark, rows):
    df = spark.createDataFrame(rows, "u int, ts timestamp, et string")
    got = attribution_credit(
        df, "ts", "u", "et",
        is_touch=F.col("et").isin(*TOUCH_TYPES),
        is_conversion=F.col("et") == "purchase",
        lookback="7 days",
        models=("first", "last", "linear", "position", "decay"),
        half_life="1 day",
    ).collect()
    return {
        (r["model"], r["channel"]): (r["conversions"], r["credit_ppm"])
        for r in got
    }


class TestAttribution:
    def test_first_last_linear_fixture(self, spark):
        rows = [
            (1, BASE, "view"),
            (1, BASE + dt.timedelta(hours=1), "click"),
            (1, BASE + dt.timedelta(hours=2), "email"),
            (1, BASE + dt.timedelta(hours=3), "purchase"),
            (2, BASE, "purchase"),  # no touch -> (direct)
        ]
        got = _run(spark, rows)
        assert got[("first", "view")] == (1, 1_000_000)
        assert got[("last", "email")] == (1, 1_000_000)
        assert got[("linear", "view")] == (1, 333_333)
        assert got[("linear", "click")] == (1, 333_333)
        assert got[("linear", "email")] == (1, 333_333)
        for m in ("first", "last", "linear"):
            assert got[(m, "(direct)")] == (1, 1_000_000)
        assert got == _brute(rows)

    def test_lookback_and_strictly_earlier(self, spark):
        rows = [
            (1, BASE - dt.timedelta(days=8), "view"),     # outside lookback
            (1, BASE, "purchase"),                        # -> (direct)
            (2, BASE, "click"),
            (2, BASE, "purchase"),                        # same ts: NOT a touch
            (3, BASE - dt.timedelta(days=7), "email"),    # exactly on boundary
            (3, BASE, "purchase"),                        # -> email (inclusive)
        ]
        got = _run(spark, rows)
        assert got == _brute(rows)
        assert got[("last", "(direct)")][0] == 2  # users 1 and 2
        assert got[("last", "email")] == (1, 1_000_000)

    def test_equal_ts_touch_tie_is_deterministic(self, spark):
        # two touches at the SAME microsecond: struct (ts, channel)
        # min/max resolves by channel string deterministically
        rows = [
            (1, BASE, "view"),
            (1, BASE, "click"),
            (1, BASE + dt.timedelta(hours=1), "purchase"),
        ]
        got = _run(spark, rows)
        assert got[("first", "click")] == (1, 1_000_000)  # 'click' < 'view'
        assert got[("last", "view")] == (1, 1_000_000)

    def test_validation(self, spark):
        df = spark.createDataFrame(
            [(1, BASE, "view")], "u int, ts timestamp, et string"
        )
        with pytest.raises(ValueError):
            attribution_credit(
                df, "ts", "u", "et", F.lit(True), F.lit(False),
                models=("nope",),
            )
        with pytest.raises(ValueError):
            attribution_credit(
                df, "ts", "u", "et", F.lit(True), F.lit(False),
                lookback="soon",
            )
        with pytest.raises(ValueError):
            attribution_credit(
                df, "ts", "u", "et", F.lit(True), F.lit(False),
                models=("linear", "linear"),
            )
        with pytest.raises(ValueError):
            attribution_credit(
                df, "ts", "u", "et", F.lit(True), F.lit(False),
                models=("decay",), half_life="eventually",
            )

    @settings(max_examples=15, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # user
                st.integers(min_value=0, max_value=20000),  # minutes offset
                st.sampled_from(
                    ["view", "click", "email", "purchase", "other"]
                ),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_property_equals_brute_force(self, spark, data):
        rows = [
            (u, BASE + dt.timedelta(minutes=m), e) for u, m, e in data
        ]
        assert _run(spark, rows) == _brute(rows)
