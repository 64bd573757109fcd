"""Data-quality validation: declarative expectation rules compiled into
ONE aggregate pass (the Great-Expectations pattern, engine-native).

A 100 TB ingest needs its contract checks to ride a single scan — a
rule-per-query validator re-reads the table once per expectation. Here
every rule compiles to a violation-count expression (``sum(CASE ...)``,
``count - count_distinct``), all of them land in one ``agg`` (optionally
grouped), and the scan is shared, map-side partial-aggregated, and
column-pruned to exactly the checked columns.

Rules (each a dict with ``name``, ``check``, ``column``, params):

- ``not_null``                          — violations = null rows
- ``range`` (``lo``/``hi``, inclusive)  — non-null rows outside bounds
- ``accepted_values`` (``values``)      — non-null rows outside the set
- ``regex`` (``pattern``)               — non-null rows NOT matching
- ``unique``                            — ``count(col) - count_distinct(col)``
  (null rows are not counted as duplicates)

Wide output (default): one row per group, one ``<name>_violations``
column per rule — composable into any existing aggregate (the declared
``typed_aggs`` query does exactly that). ``wide=False`` unpivots to the
report shape (rule, column, check, violations, n_rows, passed) via one
``stack`` — still the same single pass underneath.

Every expression is plain ANSI-ish SQL semantics, so reports are
oracle-checkable exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["validate", "violation_expr", "psi_report", "ecdf_drift", "detector_metrics"]


def violation_expr(rule: dict) -> Column:
    """Violation-count aggregate expression for one rule."""
    col = F.col(rule["column"])
    check = rule["check"]
    if check == "not_null":
        cond = col.isNull()
    elif check == "range":
        cond = col.isNotNull() & (
            (col < F.lit(rule["lo"])) | (col > F.lit(rule["hi"]))
        )
    elif check == "accepted_values":
        cond = col.isNotNull() & ~col.isin(*rule["values"])
    elif check == "regex":
        cond = col.isNotNull() & ~col.rlike(rule["pattern"])
    elif check == "unique":
        return (F.count(col) - F.count_distinct(col)).cast("bigint")
    else:
        raise ValueError(f"unknown check {check!r}")
    return F.sum(cond.cast("bigint")).cast("bigint")


def validate(
    df: DataFrame,
    rules: list[dict],
    group_by: list[str] | None = None,
    wide: bool = True,
) -> DataFrame:
    """Run all ``rules`` in one aggregate pass; see module docstring."""
    if not rules:
        raise ValueError("validate: no rules")
    names = [r["name"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("validate: duplicate rule names")
    aggs = [
        violation_expr(r).alias(f"{r['name']}_violations") for r in rules
    ] + [F.count(F.lit(1)).alias("n_rows")]
    out = df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)
    if wide:
        return out
    pairs = ", ".join(
        f"'{r['name']}', '{r['column']}', '{r['check']}', "
        f"{r['name']}_violations"
        for r in rules
    )
    stacked = out.select(
        *(group_by or []),
        F.expr(
            f"stack({len(rules)}, {pairs}) AS (rule, column, check, violations)"
        ),
        "n_rows",
    )
    return stacked.withColumn(
        "passed", (F.col("violations") == 0).cast("int")
    )


def psi_report(
    df_a: DataFrame,
    df_b: DataFrame,
    bin_col: Column,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a
    distribution — the standard drift monitor between a reference
    period and a current period (PSI > 0.25 ≈ major shift).

    Bins come from ``bin_col`` (any expression — ``floor(value/step)``,
    a category column, a quantile id). Per bin:
    ``psi_term = (p_a - p_b) * ln(p_a / p_b)`` with both shares clamped
    to ``eps`` so one-sided bins contribute a large-but-finite term
    instead of infinity; total PSI = sum of terms.

    Scale: one count aggregate per side (map-side combined), totals as
    1-row broadcasts, and a full-outer join on the tiny bin table —
    the raw data is scanned once per side and never joined row-level.
    """
    ca = df_a.groupBy(bin_col.alias("bin")).agg(F.count("*").alias("n_a"))
    cb = df_b.groupBy(bin_col.alias("bin")).agg(F.count("*").alias("n_b"))
    ta = ca.agg(F.sum("n_a").alias("__ta"))
    tb = cb.agg(F.sum("n_b").alias("__tb"))
    # null-safe join: groupBy keeps a NULL bin (null values in the
    # binned column) as its own group, and a plain equi-join would drop
    # it from the drift report on both sides
    j = (
        ca.join(
            cb.withColumnRenamed("bin", "__bin_b"),
            F.col("bin").eqNullSafe(F.col("__bin_b")),
            "full_outer",
        )
        .withColumn("bin", F.coalesce("bin", "__bin_b"))
        .drop("__bin_b")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("n_a", F.coalesce("n_a", F.lit(0)))
        .withColumn("n_b", F.coalesce("n_b", F.lit(0)))
    )
    p_a = F.greatest(F.col("n_a") / F.col("__ta"), F.lit(eps))
    p_b = F.greatest(F.col("n_b") / F.col("__tb"), F.lit(eps))
    return (
        j.withColumn("p_a", F.col("n_a") / F.col("__ta"))
        .withColumn("p_b", F.col("n_b") / F.col("__tb"))
        .withColumn("psi_term", (p_a - p_b) * F.log(p_a / p_b))
        .drop("__ta", "__tb")
    )


def ecdf_drift(psi: DataFrame, bin_width: float | None = None) -> DataFrame:
    """Extend a :func:`psi_report` frame with the ECDF-family drift
    ingredients: per-bin cumulative shares of both populations, the
    two-sample Kolmogorov–Smirnov term ``|ECDF_a − ECDF_b|`` (the KS
    statistic is its max over bins), and — when ``bin_width`` is given —
    the binned Wasserstein-1 term ``|ECDF_a − ECDF_b| · width`` (earth
    mover's distance = its sum; exact for the binned distributions,
    width-resolution approximation of the continuous one). PSI reacts
    to per-bin share shifts but is blind to WHERE mass moved; KS/W1 see
    transport distance — together the standard drift triple.

    The cumulation is ONE window over the bin table (already tiny:
    O(bins), counts pre-aggregated), ordered with explicit
    ``NULLS FIRST`` so any engine replays it identically; a NULL bin is
    not part of the distribution's ordering, so its own cumulative
    columns are NULL (masked, not dropped — the PSI columns still
    cover it). Cumulation runs on INTEGER counts with one division by
    the integer total at the end (shares are exact rationals, so every
    engine computes the identical double — float cumsums would depend
    on the engine's window-sum association); totals include a NULL
    bin's mass, so the CDF tops out at ``1 − p_null`` by construction.
    """
    w = (
        Window.orderBy(F.col("bin").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(F.lit(1))
    nn = F.col("bin").isNotNull()
    cdf_a = F.sum(F.when(nn, F.col("n_a")).otherwise(0)).over(w) / F.sum(
        "n_a"
    ).over(tot)
    cdf_b = F.sum(F.when(nn, F.col("n_b")).otherwise(0)).over(w) / F.sum(
        "n_b"
    ).over(tot)
    out = (
        psi.withColumn("cdf_a", F.when(nn, cdf_a))
        .withColumn("cdf_b", F.when(nn, cdf_b))
        .withColumn("ks_term", F.abs(F.col("cdf_a") - F.col("cdf_b")))
    )
    if bin_width is not None:
        out = out.withColumn("w1_term", F.col("ks_term") * F.lit(bin_width))
    return out


def detector_metrics(
    df: DataFrame,
    label_col: str,
    flag_cols: Sequence[str],
) -> DataFrame:
    """Evaluation harness for the anomaly-detector battery: per flag
    column, the confusion counts and precision/recall/F1 against a
    ground-truth ``label_col`` (0/1; NULL labels are excluded from that
    detector's counts, NULL flags count as "did not alarm" — a detector
    that abstains on a true anomaly has missed it).

    ONE aggregate pass over the scored frame for ALL detectors (each
    metric is a conditional count — partial+final, map-side combined),
    then a driver-side reshape of the single result row into one row
    per detector. Precision/recall/F1 are NULL when undefined (no
    alarms / no positives) rather than 0 — "never alarmed" and "alarmed
    precisely never correctly" must not look alike.
    """
    flags = list(flag_cols)
    if not flags:
        raise ValueError("detector_metrics: no flag columns given")
    lbl = F.col(label_col)
    aggs = []
    for c in flags:
        fc = F.coalesce(F.col(c).cast("int"), F.lit(0))
        labeled = lbl.isNotNull()
        aggs.extend(
            [
                F.count(F.when(labeled & (lbl == 1) & (fc == 1), 1)).alias(f"__tp_{c}"),
                F.count(F.when(labeled & (lbl == 0) & (fc == 1), 1)).alias(f"__fp_{c}"),
                F.count(F.when(labeled & (lbl == 1) & (fc == 0), 1)).alias(f"__fn_{c}"),
                F.count(F.when(labeled & (lbl == 0) & (fc == 0), 1)).alias(f"__tn_{c}"),
            ]
        )
    row = df.agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(c).alias("detector"),
                F.col(f"__tp_{c}").alias("tp"),
                F.col(f"__fp_{c}").alias("fp"),
                F.col(f"__fn_{c}").alias("fn"),
                F.col(f"__tn_{c}").alias("tn"),
            )
            for c in flags
        ]
    )
    out = row.select(F.explode(per).alias("__m")).select("__m.*")
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision = tp / F.nullif(tp + fp, F.lit(0))
    recall = tp / F.nullif(tp + fn, F.lit(0))
    f1 = 2 * precision * recall / F.nullif(precision + recall, F.lit(0.0))
    return out.select(
        "detector", "tp", "fp", "fn", "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )
