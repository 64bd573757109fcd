"""r15 verdict item 8: decade-ladder the r14 winners where parallelism
is measurable again. The sf0.1 headline went overhead-flat after r14
(every 8v32 ratio ~1), so the AQE-floor + fused-battery claims need a
core-count-sensitive scale: sf1 (1M events).

Runs the window-family headline queries against $1 (default /tmp/sf1)
in THIS process's core count (master = local[$SPARK_GRAFT_CPUS]) and
prints per-query medians of (wall - JVM GC) over 5 in-session reps,
noop sink, plan-cache warmed. Invoke twice:

    SPARK_GRAFT_CPUS=32 python tools/r15_decade_window.py /tmp/sf1 32
    SPARK_GRAFT_CPUS=8  python tools/r15_decade_window.py /tmp/sf1 8

and compare — appends {"cpus": N, queries: {...}} to
plans/r15/decade_window_sf1.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ("anomaly_zscore", "rolling_features", "sequences", "bucketed_rolling")


def main() -> None:
    import __spark_entry__ as entry
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    tag = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "?"
    )
    spark = get_spark(app_name=f"r15-decade-{tag}")
    sc = spark.sparkContext

    def jvm_gc_ms() -> int:
        beans = (
            sc._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    out = {}
    for name in QUERIES:
        fn = getattr(entry, f"q_{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        vals = []
        for _ in range(5):
            df = fn(spark, sf_dir)
            gc0 = jvm_gc_ms()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            vals.append(wall - (jvm_gc_ms() - gc0) / 1000.0)
        vals.sort()
        out[name] = round(vals[len(vals) // 2], 3)
        print(f"{name:20s} cpus={tag} med={out[name]:.3f}")
    rec = {"cpus": tag, "sf_dir": sf_dir, "queries": out}
    with open(
        os.path.join(REPO, "plans", "r15", "decade_window_sf1.jsonl"), "a"
    ) as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
