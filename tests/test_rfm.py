"""rfm_segments: equality against a Python brute force (numpy linear
percentile == Spark percentile == SQL quantile_cont), boundary-tie
behavior (strict >, ties score DOWN), exact centi-unit monetary, the
explicit-ref_date mode, and input validation.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
    rfm_segments,
)

QS = (0.2, 0.4, 0.6, 0.8)


def _brute(rows, qs=QS, ref=None):
    per: dict[int, list] = {}
    for cust, d, amt in rows:
        if cust is None:
            continue
        d = d.date() if isinstance(d, dt.datetime) else d
        cents = round(amt * 100)
        e = per.setdefault(cust, [d, 0, 0])
        e[0] = max(e[0], d)
        e[1] += 1
        e[2] += cents
    ref = ref or max(e[0] for e in per.values())
    rec = {c: (ref - e[0]).days for c, e in per.items()}
    freq = {c: e[1] for c, e in per.items()}
    mon = {c: e[2] for c, e in per.items()}

    def bounds(vals):
        return [float(np.percentile(sorted(vals), q * 100)) for q in qs]

    rb, fb, mb = bounds(rec.values()), bounds(freq.values()), bounds(mon.values())
    k = len(qs)
    out = {}
    for c in per:
        r = (k + 1) - sum(rec[c] > b for b in rb)
        f = 1 + sum(freq[c] > b for b in fb)
        m = 1 + sum(mon[c] > b for b in mb)
        out[c] = (rec[c], freq[c], mon[c] / 100.0, r, f, m, f"{r}-{f}-{m}")
    return out


def _run(spark, rows, ref_date=None):
    df = spark.createDataFrame(rows, ["cust", "d", "amt"])
    got = rfm_segments(df, "cust", "d", "amt", QS, ref_date=ref_date).collect()
    return {
        r["customer"]: (
            r["recency_days"], r["frequency"], r["monetary"],
            r["r_score"], r["f_score"], r["m_score"], r["segment"],
        )
        for r in got
    }


def _rows(n_cust=20, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    base = dt.datetime(2024, 1, 1)
    for c in range(n_cust):
        for _ in range(int(rng.randint(1, 6))):
            rows.append(
                (
                    c,
                    base + dt.timedelta(days=int(rng.randint(0, 90))),
                    float(rng.randint(100, 99999)) / 100.0,
                )
            )
    return rows


class TestRfmSegments:
    def test_matches_brute_force(self, spark):
        rows = _rows()
        assert _run(spark, rows) == _brute(rows)

    def test_explicit_ref_date(self, spark):
        rows = _rows(n_cust=8, seed=11)
        ref = dt.date(2024, 6, 1)
        got = _run(spark, rows, ref_date="2024-06-01")
        assert got == _brute(rows, ref=ref)

    def test_boundary_tie_scores_down(self, spark):
        # 5 customers, frequencies 1..5: the 0.2/0.4/0.6/0.8 boundaries
        # land EXACTLY on 1.8,2.6,3.4,4.2 — but with equal frequencies
        # everywhere the comparison is what matters: a customer exactly
        # AT a boundary value must not exceed it (strict >).
        base = dt.datetime(2024, 1, 1)
        rows = []
        for c in range(5):
            for i in range(c + 1):
                rows.append((c, base + dt.timedelta(days=c), 10.0))
        assert _run(spark, rows) == _brute(rows)

    def test_invalid_quantiles_raise(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 1.0)], ["cust", "d", "amt"]
        )
        with pytest.raises(ValueError):
            rfm_segments(df, "cust", "d", "amt", quantiles=(0.4, 0.2))
        with pytest.raises(ValueError):
            rfm_segments(df, "cust", "d", "amt", quantiles=(0.0, 0.5))

    @settings(max_examples=10, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=60),
                st.integers(min_value=1, max_value=99999),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def test_property_equals_brute_force(self, spark, data):
        base = dt.datetime(2024, 1, 1)
        rows = [
            (c, base + dt.timedelta(days=d), cents / 100.0)
            for c, d, cents in data
        ]
        assert _run(spark, rows) == _brute(rows)

    def test_null_rows_dropped(self, spark):
        rows = _rows(n_cust=6, seed=3)
        df_rows = rows + [
            (None, dt.datetime(2024, 1, 5), 10.0),
            (0, None, 10.0),
            (0, dt.datetime(2024, 1, 5), None),
        ]
        df = spark.createDataFrame(
            df_rows, "cust int, d timestamp, amt double"
        )
        from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
            rfm_segments,
        )

        got = {
            r["customer"]: (
                r["recency_days"], r["frequency"], r["monetary"],
                r["r_score"], r["f_score"], r["m_score"], r["segment"],
            )
            for r in rfm_segments(df, "cust", "d", "amt", QS).collect()
        }
        assert got == _brute(rows)  # NULL rows contribute nothing
