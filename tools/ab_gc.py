"""Alternating A/B of JVM configs on a few headline queries.

Host wall-clock drifts across minutes; comparing two 6-minute bench
runs confounds config with drift. This interleaves configs A,B,A,B...
in fresh JVMs (one subprocess per sample) so drift cancels.

Usage: python tools/ab_gc.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from amonaly_detection_in_time_series_data_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark(extra_conf=%(conf)r)
sf = "/root/testdata/sf0.1"
for t in ("events", "orders", "customer", "lineitem", "documents"):
    spark.read.parquet(os.path.join(sf, t + ".parquet")).count()
spark.range(1).write.format("noop").mode("overwrite").save()
out = {}
for name in %(queries)r:
    fn = getattr(e, "q_" + name)
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        reps.append(time.perf_counter() - t0)
    out[name] = sorted(reps)[1]
print("RESULT " + json.dumps(out))
"""

QUERIES = ["anomaly_zscore", "minhash_pairs", "top_customers"]

CONFIGS = {
    "g1_8g": {"spark.driver.memory": "8g"},
    "par_8g": {
        "spark.driver.memory": "8g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    },
}


def run_one(conf: dict) -> dict:
    code = CHILD % {"repo": REPO, "conf": conf, "queries": QUERIES}
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=400,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(p.stderr[-2000:])


def main() -> None:
    samples: dict[str, list[dict]] = {k: [] for k in CONFIGS}
    for round_i in range(3):
        for name, conf in CONFIGS.items():
            r = run_one(conf)
            samples[name].append(r)
            print(f"round {round_i} {name}: {r}", flush=True)
    for name, rs in samples.items():
        agg = {
            q: round(sorted(x[q] for x in rs)[len(rs) // 2], 3)
            for q in QUERIES
        }
        print(f"MEDIAN {name}: {agg} total={round(sum(agg.values()), 3)}")


if __name__ == "__main__":
    main()
