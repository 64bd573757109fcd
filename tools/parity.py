"""Driver-mimic differential harness: run each ``queries()[name]`` on
Spark and its ``oracle_sql()[name]`` on DuckDB over the same parquet
tables, normalize, and compare EXACTLY (names, row count, values).

Usage:
    python tools/parity.py [sf_dir] [query ...]

Exact comparison is deliberately stricter than the driver's value-hash:
if this passes at sf0.01, the driver's hash comparison passes too.
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort, dtype normalization, row sort — mirrors the
    driver's order-insensitive comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].astype("Int64")
        else:
            df[c] = df[c].astype("string")
    if len(df.columns):
        df = df.sort_values(list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        da, db = a[c].dtype, b[c].dtype
        if da != db:
            problems.append(f"dtype differs for {c}: spark={da} duck={db}")
    if problems:
        return problems
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa.dtype):
            eq = (sa.values == sb.values) | (np.isnan(sa.values) & np.isnan(sb.values))
        else:
            eq = (sa.values == sb.values) | (sa.isna().values & sb.isna().values)
        bad = int((~eq).sum())
        if bad:
            idx = np.where(~eq)[0][:5]
            examples = [(i, sa.iloc[i], sb.iloc[i]) for i in idx]
            problems.append(f"{bad} value mismatches in {c}; first: {examples}")
    return problems


DRIVER_WINDOW = 50


def check_window_policy(qs: dict, oracles: dict) -> list[str]:
    """The driver verifies only the first ``DRIVER_WINDOW`` entries of
    ``queries()`` against their oracles; later entries get at most a
    rows-only check. Policy: every oracle-backed query MUST sit inside
    the window (else its declared oracle silently never runs), and
    every oracle key must name a real query. Returns violations."""
    names = list(qs)
    problems = []
    for pos, name in enumerate(names):
        if name in oracles and pos >= DRIVER_WINDOW:
            problems.append(
                f"'{name}' has an oracle but sits at queries() position "
                f"{pos} (>= {DRIVER_WINDOW}) — outside the driver's "
                "checked window; move it before the rows-only tier"
            )
    for name in oracles:
        if name not in qs:
            problems.append(f"oracle_sql() has '{name}' with no queries() entry")
    return problems


def run_parity(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Deliberately a VANILLA session (no engine confs like nanosAsLong):
    # the driver harness calls queries() with its own plain session, and
    # r1 proved a conf-dependent reader passes here but fails there.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    violations = check_window_policy(qs, oracles)
    if violations:
        for v in violations:
            print(f"WINDOW-POLICY VIOLATION: {v}")
        return {"__window_policy__": violations}
    n_oracle = sum(1 for n in qs if n in oracles)
    print(
        f"window policy OK: {n_oracle} oracle-backed queries all inside "
        f"the first {DRIVER_WINDOW}; "
        f"{len(qs) - n_oracle} rows-only beyond"
    )
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            results[name] = ["SPARK ERROR:\n" + traceback.format_exc(limit=8)]
            print(f"{name:32s} SPARK-ERROR")
            print(results[name][0][:2000])
            continue
        if name not in oracles:
            results[name] = [] if len(spdf) >= 0 else ["no rows"]
            print(f"{name:32s} rows-only rows={len(spdf)}")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            results[name] = ["DUCKDB ERROR:\n" + traceback.format_exc(limit=4)]
            print(f"{name:32s} DUCKDB-ERROR")
            print(results[name][0][:2000])
            continue
        results[name] = compare(spdf, dpdf)
        status = "OK " if not results[name] else "FAIL"
        print(f"{name:32s} {status} rows={len(spdf)}")
        for p in results[name]:
            print(f"    {p}")
    return results


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    res = run_parity(sf_dir, only or None)
    failed = {k: v for k, v in res.items() if v}
    print(f"\n{len(res) - len(failed)}/{len(res)} queries match")
    sys.exit(1 if failed else 0)
