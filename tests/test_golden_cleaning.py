"""Golden fixtures for the quirky cleaning operators (SURVEY.md §5.2
item 3, FIXTURES.md §1): verified pandas-reference behaviors that the
engine must reproduce bit-for-bit.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.functions.cleaning import (
    clean_numeric_de,
    clean_numeric_ref,
    parse_timestamp_ref,
)

# (input, bug-compatible expected, corrected expected) — from FIXTURES.md §1,
# verified against the reference's pandas semantics
# (reference src/preprocessing.py:99-122).
GOLDEN_NUMERIC = [
    ("12,3", 12.3, 12.3),
    ("1.234,5", 1.2345, 1234.5),
    ("-", None, None),
    ("7.8.9", 7.89, 789.0),  # corrected path strips dots -> 789
    ("-5,1", 5.1, -5.1),
    ("100", 100.0, 100.0),
    ("", None, None),
]


def test_clean_numeric_golden(spark):
    rows = [(i, s) for i, (s, _, _) in enumerate(GOLDEN_NUMERIC)]
    df = spark.createDataFrame(rows, "i int, raw string")
    out = (
        df.select(
            "i",
            clean_numeric_ref("raw").alias("ref"),
            clean_numeric_de("raw").alias("de"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (s, exp_ref, exp_de) in zip(out, GOLDEN_NUMERIC):
        if exp_ref is None:
            assert row["ref"] is None, s
        else:
            assert row["ref"] == pytest.approx(exp_ref), s
        if exp_de is None:
            assert row["de"] is None, s
        else:
            assert row["de"] == pytest.approx(exp_de), s


def test_timestamp_parse_golden(spark):
    rows = [
        (0, "Apr 01, 2016 12:00 AM", "2016-04-01 00:00:00"),
        (1, "Dec 31, 2024 11:59 PM", "2024-12-31 23:59:00"),
        (2, "Jan 05, 2020 01:30 PM", "2020-01-05 13:30:00"),
        (3, "??", None),  # coerce fallback -> null (NaT)
        (4, "2021-07-04 10:00:00", "2021-07-04 10:00:00"),  # fallback infer
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows], "i int, raw string")
    out = (
        df.select("i", F.date_format(parse_timestamp_ref("raw"), "yyyy-MM-dd HH:mm:ss").alias("p"))
        .orderBy("i")
        .collect()
    )
    for row, (_, s, expected) in zip(out, rows):
        assert row["p"] == expected, s
