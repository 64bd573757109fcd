"""r14 all-declared-queries plan audit: for every queries() entry,
count Exchanges / FileScans / Windows / Python nodes, and flag
scale-killers (CartesianProduct without broadcast, single-partition
Window, BatchEvalPython, row-at-a-time UDF). Prints one line per query
and writes plans/r14/plan_audit.json."""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    spark = get_spark(app_name="r14-audit")
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            s = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name:28s} ERROR {str(e)[:80]}")
            continue
        flags = []
        if "BatchEvalPython" in s:
            flags.append("BatchEvalPython")
        if "CartesianProduct" in s:
            flags.append("CartesianProduct")
        if re.search(r"Window \[", s) and "PartitionBy" not in s:
            # single-partition window: a Window whose spec has no
            # partition keys shows as 'windowspecdefinition(<order>...'
            # with no leading partition expr list — detect via Sort with
            # a global ordering feeding Window after an Exchange
            # SinglePartition
            if "Exchange SinglePartition" in s and "Window" in s:
                flags.append("global-window-singlepartition")
        counts = {
            "exchanges": s.count("Exchange hashpartitioning")
            + s.count("Exchange rangepartitioning")
            + s.count("Exchange SinglePartition")
            + s.count("Exchange RoundRobinPartitioning"),
            "single_part_exchanges": s.count("Exchange SinglePartition"),
            "filescans": s.count("FileScan") or s.count("Scan parquet"),
            "windows": s.count("Window ["),
            "joins": s.count("Join"),
            "python": s.count("ArrowEvalPython")
            + s.count("MapInPandas")
            + s.count("MapInArrow")
            + s.count("BatchEvalPython"),
            "existing_rdd": s.count("Scan ExistingRDD"),
        }
        out[name] = {"flags": flags, **counts}
        flagstr = ",".join(flags) if flags else "-"
        print(
            f"{name:28s} ex={counts['exchanges']:2d}"
            f" (1p={counts['single_part_exchanges']})"
            f" scan={counts['filescans']:2d} win={counts['windows']:2d}"
            f" join={counts['joins']:2d} py={counts['python']}"
            f" pyrdd={counts['existing_rdd']} {flagstr}"
        )
    path = os.path.join(REPO, "plans", "r14", "plan_audit.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
