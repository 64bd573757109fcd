"""All-declared-queries plan audit: for every queries() entry, count
Exchanges / FileScans / Windows / Python nodes, and flag scale-killers
(CartesianProduct without broadcast, single-partition Window,
BatchEvalPython, Python-RDD local tables). Prints one line per query and
writes plans/<outdir>/plan_audit.json (outdir = 2nd arg, default r15).

r15 fixes (closing the r14 verdict/advice items):
- ``existing_rdd`` is split into ``python_rdd`` (``applySchemaToPythonRDD``
  — a per-action Python-worker round trip, the red flag) and
  ``jvm_rdd`` (localCheckpoint-pinned JVM rows — benign by design), so
  the red-flag column is trustworthy.
- the single-partition-window check now walks the plan tree: a
  ``Window [`` node is flagged only when the nearest Exchange BELOW it
  in its own subtree is ``Exchange SinglePartition`` (the old whole-plan
  substring co-occurrence flagged any plan with both an unrelated
  global-sort exchange and any window).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_INDENT = re.compile(r"^[\s:+\-*(]*(\(\d+\)\s*)?")


def _depth(line: str) -> int:
    """Tree depth of a plan line = width of its indent/connector prefix."""
    m = _INDENT.match(line)
    return len(m.group(0)) if m else 0


def single_partition_windows(plan: str) -> int:
    """Count Window nodes whose OWN subtree's nearest Exchange is
    SinglePartition (i.e. the window's data really is funneled to one
    task), ignoring unrelated single-partition exchanges elsewhere."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Window [" not in line and "WindowGroupLimit" not in line:
            continue
        d = _depth(line)
        for nxt in lines[i + 1 :]:
            nd = _depth(nxt)
            if nd <= d and nxt.strip():
                break  # left the Window's subtree
            if "Exchange" in nxt:
                if "Exchange SinglePartition" in nxt:
                    hits += 1
                break  # nearest exchange below decides
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "r15"
    import __spark_entry__ as entrymod
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            s = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name:28s} ERROR {str(e)[:80]}")
            continue
        python_rdd = s.count("applySchemaToPythonRDD")
        existing_rdd = s.count("Scan ExistingRDD")
        sp_windows = single_partition_windows(s)
        flags = []
        if "BatchEvalPython" in s:
            flags.append("BatchEvalPython")
        if "CartesianProduct" in s:
            flags.append("CartesianProduct")
        if python_rdd:
            flags.append("python-rdd-scan")
        if sp_windows:
            flags.append(f"single-partition-window:{sp_windows}")
        counts = {
            "exchanges": s.count("Exchange hashpartitioning")
            + s.count("Exchange rangepartitioning")
            + s.count("Exchange SinglePartition")
            + s.count("Exchange RoundRobinPartitioning"),
            "single_part_exchanges": s.count("Exchange SinglePartition"),
            "filescans": s.count("FileScan") or s.count("Scan parquet"),
            "windows": s.count("Window ["),
            "single_partition_windows": sp_windows,
            "joins": s.count("Join"),
            "python": s.count("ArrowEvalPython")
            + s.count("MapInPandas")
            + s.count("MapInArrow")
            + s.count("FlatMapGroupsInPandas")
            + s.count("FlatMapGroupsInArrow")
            + s.count("BatchEvalPython"),
            "python_rdd": python_rdd,
            "jvm_rdd": existing_rdd - python_rdd,
        }
        out[name] = {"flags": flags, **counts}
        flagstr = ",".join(flags) if flags else "-"
        print(
            f"{name:28s} ex={counts['exchanges']:2d}"
            f" (1p={counts['single_part_exchanges']})"
            f" scan={counts['filescans']:2d} win={counts['windows']:2d}"
            f" join={counts['joins']:2d} py={counts['python']}"
            f" pyrdd={counts['python_rdd']} jvmrdd={counts['jvm_rdd']} {flagstr}"
        )
    path = os.path.join(REPO, "plans", outdir, "plan_audit.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
