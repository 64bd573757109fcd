"""Declarative one-pass data-quality validation (operators.validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.validation import (
    validate,
    violation_expr,
)

ROWS = [
    (1, "a@x.com", 10.0, "web"),
    (2, None, 20.0, "web"),
    (3, "bad-email", -5.0, "app"),
    (3, "c@x.com", 999.0, "fax"),
    (4, "d@x.com", None, "app"),
]
SCHEMA = "id bigint, email string, value double, channel string"

RULES = [
    {"name": "email_present", "column": "email", "check": "not_null"},
    {"name": "email_format", "column": "email", "check": "regex",
     "pattern": r"^[^@\s]+@[^@\s]+$"},
    {"name": "value_range", "column": "value", "check": "range",
     "lo": 0, "hi": 100},
    {"name": "id_unique", "column": "id", "check": "unique"},
    {"name": "channel_known", "column": "channel", "check": "accepted_values",
     "values": ["web", "app"]},
]


class TestValidate:
    def test_wide_single_pass(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        out = validate(df, RULES).first()
        assert out["email_present_violations"] == 1  # id 2
        assert out["email_format_violations"] == 1   # bad-email (nulls skip)
        assert out["value_range_violations"] == 2    # -5 and 999 (null skips)
        assert out["id_unique_violations"] == 1      # id 3 twice
        assert out["channel_known_violations"] == 1  # fax
        assert out["n_rows"] == 5
        # the contract: ONE aggregate over ONE scan
        plan = validate(df, RULES)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1

    def test_long_report(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        rep = {r["rule"]: r for r in validate(df, RULES, wide=False).collect()}
        assert len(rep) == 5
        assert rep["value_range"]["violations"] == 2
        assert rep["value_range"]["passed"] == 0
        assert rep["value_range"]["check"] == "range"
        assert all(r["n_rows"] == 5 for r in rep.values())
        assert not any(
            r["passed"] == 1 and r["violations"] > 0 for r in rep.values()
        )

    def test_grouped(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        out = {
            r["channel"]: r
            for r in validate(
                df,
                [{"name": "v_rng", "column": "value", "check": "range",
                  "lo": 0, "hi": 100}],
                group_by=["channel"],
            ).collect()
        }
        assert out["app"]["v_rng_violations"] == 1
        assert out["fax"]["v_rng_violations"] == 1
        assert out["web"]["v_rng_violations"] == 0

    def test_psi_report_detects_shift(self, spark):
        import math

        from amonaly_detection_in_time_series_data_spark.operators.validation import (
            psi_report,
        )

        # identical distributions -> PSI ~ 0; shifted -> PSI large,
        # and a bin present on one side only exercises the eps clamp
        a = spark.createDataFrame(
            [(i % 4,) for i in range(400)], "v bigint"
        )
        same = psi_report(a, a, F.col("v")).agg(F.sum("psi_term")).first()[0]
        assert abs(same) < 1e-12

        b = spark.createDataFrame(
            [(i % 4 + 1,) for i in range(400)], "v bigint"
        )  # bins 1..4 vs a's 0..3: bins 0 and 4 are one-sided
        rows = {r["bin"]: r for r in psi_report(a, b, F.col("v")).collect()}
        assert set(rows) == {0, 1, 2, 3, 4}
        assert rows[0]["n_b"] == 0 and rows[4]["n_a"] == 0
        total = sum(r["psi_term"] for r in rows.values())
        assert total > 0.25  # "major shift" on the standard PSI scale
        assert all(math.isfinite(r["psi_term"]) for r in rows.values())

    def test_bad_inputs(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        with pytest.raises(ValueError, match="no rules"):
            validate(df, [])
        with pytest.raises(ValueError, match="duplicate"):
            validate(df, [RULES[0], RULES[0]])
        with pytest.raises(ValueError, match="unknown check"):
            violation_expr({"name": "x", "column": "id", "check": "nope"})


class TestEcdfDrift:
    def test_ks_w1_hand_case_with_null_bin(self, spark):
        """Hand-checkable two-population ECDF drift: a mass shift of 2
        rows (of 10) from bin 0 to bin 2 gives KS = 0.2 at bins 0 and 1
        and W1 = KS-sum x width; a NULL bin keeps its PSI row but has
        NULL cumulative columns (it is not part of the ordering), and
        its mass still counts in the totals (CDF tops out at 1 - p_null)."""
        from amonaly_detection_in_time_series_data_spark.operators.validation import (
            ecdf_drift,
            psi_report,
        )
        from pyspark.sql import functions as F

        # population A: bins [0]*4 + [1]*4 + [2]*2; B shifts 2 rows 0->2
        rows_a = [(0.0,)] * 4 + [(1.0,)] * 4 + [(2.0,)] * 2
        rows_b = [(0.0,)] * 2 + [(1.0,)] * 4 + [(2.0,)] * 4
        a = spark.createDataFrame(rows_a, "v double")
        b = spark.createDataFrame(rows_b, "v double")
        drift = ecdf_drift(psi_report(a, b, F.col("v")), bin_width=1.0)
        got = {
            r["bin"]: (r["cdf_a"], r["cdf_b"], r["ks_term"], r["w1_term"])
            for r in drift.collect()
        }
        assert got == {
            0.0: (0.4, 0.2, pytest.approx(0.2), pytest.approx(0.2)),
            1.0: (0.8, 0.6, pytest.approx(0.2), pytest.approx(0.2)),
            2.0: (1.0, 1.0, pytest.approx(0.0), pytest.approx(0.0)),
        }
        # KS statistic / W1 distance from the terms
        ks = drift.agg(F.max("ks_term")).first()[0]
        w1 = drift.agg(F.sum("w1_term")).first()[0]
        assert ks == pytest.approx(0.2) and w1 == pytest.approx(0.4)

        # null bin: PSI row retained, cumulative columns masked, totals
        # still include the null mass
        a2 = spark.createDataFrame(rows_a + [(None,)] * 2, "v double")
        drift2 = ecdf_drift(psi_report(a2, b, F.col("v")), bin_width=1.0)
        nulls = [r for r in drift2.collect() if r["bin"] is None]
        assert len(nulls) == 1
        assert nulls[0]["cdf_a"] is None and nulls[0]["ks_term"] is None
        assert nulls[0]["p_a"] == pytest.approx(2 / 12)
        top = max(
            (r for r in drift2.collect() if r["bin"] is not None),
            key=lambda r: r["bin"],
        )
        assert top["cdf_a"] == pytest.approx(10 / 12)  # 1 - p_null


class TestDetectorMetrics:
    """operators.validation.detector_metrics — hand confusion fixture,
    NULL conventions, single-aggregate plan."""

    def _df(self, spark):
        # label, det_a, det_b(null flags), det_c(never alarms)
        rows = [
            (1, 1, 1, 0),
            (1, 1, None, 0),   # null flag on a true anomaly = miss
            (1, 0, 1, 0),
            (0, 1, 0, 0),
            (0, 0, 0, 0),
            (None, 1, 1, 1),   # unlabeled: excluded everywhere
        ]
        return spark.createDataFrame(
            rows, "label int, det_a int, det_b int, det_c int"
        )

    def test_hand_confusion_counts(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.validation import (
            detector_metrics,
        )

        out = {
            r["detector"]: r.asDict()
            for r in detector_metrics(
                self._df(spark), "label", ["det_a", "det_b", "det_c"]
            ).collect()
        }
        a = out["det_a"]
        assert (a["tp"], a["fp"], a["fn"], a["tn"]) == (2, 1, 1, 1)
        assert a["precision"] == pytest.approx(2 / 3)
        assert a["recall"] == pytest.approx(2 / 3)
        assert a["f1"] == pytest.approx(2 / 3)
        b = out["det_b"]
        assert (b["tp"], b["fp"], b["fn"], b["tn"]) == (2, 0, 1, 2)
        assert b["precision"] == pytest.approx(1.0)
        assert b["recall"] == pytest.approx(2 / 3)
        # det_c never alarms on labeled rows: precision undefined (NULL),
        # recall 0 — the distinction the NULL convention preserves
        c = out["det_c"]
        assert c["precision"] is None
        assert c["recall"] == pytest.approx(0.0)
        assert c["f1"] is None

    def test_battery_recovers_injected_anomalies(self, spark):
        """End-to-end: plant spikes in a quiet series, score with the
        battery, and the metrics harness shows recall 1.0 at high
        precision for the z-score detector."""
        import numpy as np

        from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
            rolling_zscore,
        )
        from amonaly_detection_in_time_series_data_spark.operators.validation import (
            detector_metrics,
        )

        rng = np.random.RandomState(5)
        rows = []
        spikes = {100, 250, 400}
        for i in range(500):
            v = float(rng.randn() * 0.5 + 10.0)
            if i in spikes:
                v += 50.0
            rows.append((1, i, f"2024-01-{1 + i // 96:02d} {(i % 96) // 4:02d}:{(i % 4) * 15:02d}:00", v, int(i in spikes)))
        df = spark.createDataFrame(
            rows, "user_id int, event_id int, ts string, value double, label int"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        scored = rolling_zscore(df, "value", 24, ["user_id"], ["ts", "event_id"], 3.0)
        m = {
            r["detector"]: r
            for r in detector_metrics(scored, "label", ["is_anomaly"]).collect()
        }["is_anomaly"]
        assert m["recall"] == pytest.approx(1.0)
        assert m["tp"] == 3
        # FPs are data-dependent (tiny early windows alarm spuriously);
        # bound them rather than pin them
        assert m["fp"] <= 5

    def test_single_aggregate_plan(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.validation import (
            detector_metrics,
        )

        plan = (
            detector_metrics(self._df(spark), "label", ["det_a", "det_b"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one partial+final hash aggregate pair, no joins, no windows
        assert plan.count("HashAggregate") <= 2, plan
        assert "Join" not in plan and "Window" not in plan, plan

    def test_no_flags_raises(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.validation import (
            detector_metrics,
        )

        with pytest.raises(ValueError, match="no flag columns"):
            detector_metrics(self._df(spark), "label", [])
