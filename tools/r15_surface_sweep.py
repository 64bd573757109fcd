"""Whole-surface timing sweep: run EVERY queries() entry through the
noop sink (guide §1.4 — time the computation, not the sink) and record
wall seconds, so no correctness-tier query silently grows a 10 s action
cost while attention sits on the 15 headline queries. Writes
plans/<outdir>/surface_sweep.json.

Usage: python tools/r15_surface_sweep.py [sf_dir] [outdir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "r15"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import __spark_entry__ as entrymod
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    spark = get_spark(app_name="surface-sweep")
    out: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        walls = []
        try:
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(round(time.time() - t0, 3))
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name:28s} ERROR {str(e)[:80]}")
            continue
        out[name] = {"walls": walls, "best": min(walls)}
        print(f"{name:28s} best={min(walls):6.2f}  walls={walls}")
    path = os.path.join(REPO, "plans", outdir, "surface_sweep.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    top = sorted(out.items(), key=lambda kv: -kv[1].get("best", 0))[:10]
    print("\nslowest:")
    for n, v in top:
        print(f"  {n:28s} {v.get('best', 'ERR')}")


if __name__ == "__main__":
    main()
