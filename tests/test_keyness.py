"""keyness_log_odds (Monroe et al. 2008 log-odds with informative
Dirichlet prior): against a Python reference implementation, sign
symmetry between the two directions, the planted-keyword fixture, and
validation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.corpus import (
    keyness_log_odds,
)


def _brute(rows, group_of, alpha0=10.0, k=10):
    y = {}
    for i, text in rows:
        g = group_of(i)
        for t in text.lower().split():
            if not t:
                continue
            e = y.setdefault(t, [0, 0])
            e[0 if g else 1] += 1
    n_a = sum(e[0] for e in y.values())
    n_b = sum(e[1] for e in y.values())
    n = n_a + n_b
    z = {}
    for t, (ya0, yb0) in y.items():
        aw = alpha0 * (ya0 + yb0) / n
        ya, yb = ya0 + aw, yb0 + aw
        delta = math.log(ya / (n_a + alpha0 - ya)) - math.log(
            yb / (n_b + alpha0 - yb)
        )
        z[t] = round(delta / math.sqrt(1.0 / ya + 1.0 / yb), 6)
    top_a = sorted(z, key=lambda t: (-z[t], t))[:k]
    top_b = sorted(z, key=lambda t: (z[t], t))[:k]
    out = {}
    for r, t in enumerate(top_a, 1):
        out[("a", t)] = (y[t][0], y[t][1], z[t], r)
    for r, t in enumerate(top_b, 1):
        out[("b", t)] = (y[t][1], y[t][0], round(-z[t] + 0.0, 6), r)
    return out


def _run(spark, rows, k=10):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = keyness_log_odds(
        df, "text", F.col("doc_id") % 2 == 0, alpha0=10.0, k=k
    ).collect()
    return {
        (r["group"], r["token"]): (r["cnt_in"], r["cnt_out"], r["z"], r["rank"])
        for r in got
    }


ROWS = [
    (0, "spark shuffle exchange partition broadcast spark spark"),
    (2, "spark catalyst codegen partition exchange spark"),
    (4, "spark broadcast join shuffle partition"),
    (1, "pandas dataframe index pandas loc iloc"),
    (3, "pandas groupby apply index pandas"),
    (5, "pandas series index apply loc"),
]


class TestKeyness:
    def test_planted_keywords_surface(self, spark):
        got = _run(spark, ROWS, k=3)
        a_tokens = {t for (g, t) in got if g == "a"}
        b_tokens = {t for (g, t) in got if g == "b"}
        assert "spark" in a_tokens and "pandas" in b_tokens
        # the #1 keyword of each side is the planted one, positive z
        for g, planted in (("a", "spark"), ("b", "pandas")):
            top = [t for (gg, t) in got if gg == g and got[(gg, t)][3] == 1]
            assert top == [planted]
            assert got[(g, planted)][2] > 0

    def test_matches_python_reference(self, spark):
        got = _run(spark, ROWS, k=5)
        exp = _brute(ROWS, lambda i: i % 2 == 0, k=5)
        assert set(got) == set(exp)
        for key in exp:
            gc_in, gc_out, gz, gr = got[key]
            ec_in, ec_out, ez, er = exp[key]
            assert (gc_in, gc_out, gr) == (ec_in, ec_out, er)
            assert abs(gz - ez) < 1e-9

    def test_sign_symmetry(self, spark):
        # swapping the group predicate mirrors groups and negates z
        df_rows = ROWS
        got = _run(spark, df_rows, k=4)
        df = [(i + 1, t) for i, t in df_rows]  # flips parity
        flipped = {
            (("b" if g == "a" else "a"), t): v for (g, t), v in _run(
                spark, df, k=4
            ).items()
        }
        assert set(got) == set(flipped)
        for key in got:
            assert got[key][:2] == flipped[key][:2]
            assert abs(got[key][2] - flipped[key][2]) < 1e-9

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            keyness_log_odds(df, "text", F.col("doc_id") == 1, k=0)
        with pytest.raises(ValueError):
            keyness_log_odds(df, "text", F.col("doc_id") == 1, alpha0=0.0)
