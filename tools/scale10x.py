"""Measure the full headline at sf0.01 vs sf0.1 (the 10x scale-up
table in SCALING.md §10a0), bench protocol: 5 in-session reps,
median of (wall - GC) per query, one clean session for both scales."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    import __spark_entry__ as e
    from bench import HEADLINE

    # optional argv: two sf dirs (small, large) — defaults preserve the
    # original sf0.01 -> sf0.1 decade; r11 runs it again for
    # sf0.1 -> /tmp/sf1 (tools/make_sf1.py) as the second decade.
    dirs = (
        (sys.argv[1], sys.argv[2])
        if len(sys.argv) > 2
        else ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    )
    spark = get_spark(app_name="scale10x")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    results: dict[str, dict[str, float]] = {}
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir)
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        spark.range(1).write.format("noop").mode("overwrite").save()
        for name in HEADLINE:
            fn = getattr(e, f"q_{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            vals = []
            for _ in range(5):
                g0 = jvm_gc_ms()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                vals.append(
                    time.perf_counter() - t0 - (jvm_gc_ms() - g0) / 1000
                )
            results.setdefault(name, {})[tag] = sorted(vals)[2]
            print(f"{tag} {name}: {sorted(vals)[2]:.3f}", flush=True)
    small, large = (os.path.basename(d.rstrip("/")) for d in dirs)
    tot01 = sum(v[small] for v in results.values())
    tot10 = sum(v[large] for v in results.values())
    print(f"\nTOTAL {small}={tot01:.2f} {large}={tot10:.2f} ratio={tot10/tot01:.2f}")
    for name, v in sorted(
        results.items(), key=lambda kv: -kv[1][large] / max(kv[1][small], 1e-9)
    ):
        print(
            f"{name}: {v[small]:.3f} -> {v[large]:.3f} "
            f"({v[large]/max(v[small],1e-9):.2f}x)"
        )


if __name__ == "__main__":
    main()
