"""r15 verdict item 4: skew-flood the FUSED battery window (r13 §16
pattern) at sf1 and the default driver heap.

The r14 fusion moved the per-key stats (percentile quartiles, MAD, OLS
sums) from partial-aggregating hash aggregates onto the battery's
(key, order) exchange as `... OVER (PARTITION BY key)` window
aggregates. AQE skew-split does not apply to windows, so a hot key
funnels all six detectors AND the stats into ONE task's window buffer —
this measures whether that shape degrades or dies where the old
aggregate+broadcast-join shape would have survived.

Plants one user with FLOOD rows (10^2-10^3 x the ~100-row median key)
into the sf1 events table and runs BOTH shapes (the distinct-stats
frame `df.where(lit(True))` carries identical rows, so values match by
the fused-equality pin) through the noop sink, recording wall and JVM
GC per arm, interleaved, plus a clean-data baseline.

Usage: SPARK_GRAFT_DRIVER_MEM=1g python tools/r15_battery_skew.py [sf_dir]
(default /tmp/sf1; see tools/make_sf1.py). Writes
plans/r15/battery_skew_sf1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLOODS = (10_000, 100_000)
KEY = ["user_id"]
ORDER = ["ts", "event_id"]


def main() -> None:
    from pyspark.sql import functions as F

    from amonaly_detection_in_time_series_data_spark.operators.anomaly import (
        anomaly_battery,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="r15-battery-skew")
    sc = spark.sparkContext
    ev = load_table(spark, sf_dir, "events")

    def jvm_gc_ms() -> int:
        beans = (
            sc._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    def flooded(n: int):
        flood = (
            spark.range(n)
            .select(
                (F.lit(900_000_000) + F.col("id")).alias("event_id"),
                (
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=F.col("id").cast("double"))
                ).alias("ts"),
                F.lit(424_242_424).cast(dict(ev.dtypes)["user_id"]).alias(
                    "user_id"
                ),
                F.lit("flood").alias("event_type"),
                (F.col("id") % 997).cast("double").alias("value"),
                F.lit("{}").alias("props"),
            )
        )
        return ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).unionByName(flood)

    def fused(df):
        return anomaly_battery(df, "value", KEY, ORDER)

    def agg_shape(df):
        # same rows through the aggregate+broadcast-join stats shape:
        # a distinct stats_source object keeps the pre-r14 plan
        return anomaly_battery(
            df, "value", KEY, ORDER, stats_source=df.where(F.lit(True))
        )

    def run(label, df):
        sc.setJobDescription(label)
        gc0 = jvm_gc_ms()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        gc = (jvm_gc_ms() - gc0) / 1000.0
        print(f"{label:34s} wall={wall:7.2f}s gc={gc:6.2f}s")
        return {"wall": round(wall, 2), "gc": round(gc, 2)}

    out = {
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "(default 8g)"),
        "sf_dir": sf_dir,
        "median_key_rows": 100,
    }
    # warm both shapes once on clean data (codegen/committer warmup)
    run("warmup fused clean", fused(ev))
    run("warmup agg clean", agg_shape(ev))
    out["clean_fused"] = run("clean fused", fused(ev))
    out["clean_agg"] = run("clean agg+join", agg_shape(ev))
    for n in FLOODS:
        df = flooded(n)
        out[f"flood{n}_fused"] = run(f"flood {n:>6d} fused", fused(df))
        out[f"flood{n}_agg"] = run(f"flood {n:>6d} agg+join", agg_shape(df))
    path = os.path.join(REPO, "plans", "r15", "battery_skew_sf1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
