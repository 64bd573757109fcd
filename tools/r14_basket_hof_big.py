"""r14 follow-up to the basket hof A/B: locate the REGIME BOUNDARY.

The 60M-row lineitem A/B (tools/r14_basket_hof_ab.py) showed
pair_strategy='hof' losing 0/3 on SMALL baskets (~4 items): per-basket
array assembly + interpreted HOF lambdas cost more than the second
basket-keyed exchange. The claimed win regime is FEW LARGE baskets —
pair volume dominated by k² per group, group count small. This control
plants that regime synthetically: B baskets x k distinct items drawn
from a vocab (so the pair groupBy genuinely aggregates), interleaved
rep-pairs, identical rule counts asserted.

Usage: python tools/r14_basket_hof_big.py [baskets items vocab reps]
    (defaults 20000 64 50000 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
        basket_rules,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark(app_name="r14_basket_hof_big")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    # deterministic planted corpus: basket b holds K items spread over
    # the vocab with a multiplicative mix so pairs repeat across
    # baskets (the groupBy aggregates, min_pair_count binds sometimes)
    base = spark.range(B * K).select(
        (F.col("id") % B).alias("bk"),
        (
            ((F.col("id") % B) * 37 + (F.col("id") / B).cast("bigint") * 2654435761)
            % V
        ).alias("it"),
    )
    path = f"/tmp/r14_bigbasket_{B}_{K}_{V}"
    if not os.path.isdir(path):
        base.repartition(32).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    print(f"fixture: {B} baskets x {K} items, vocab {V}, rows {df.count()}",
          flush=True)

    def arm(strategy: str):
        return basket_rules(df, "bk", "it", 2, pair_strategy=strategy)

    n_s, n_h = arm("selfjoin").count(), arm("hof").count()
    assert n_s == n_h, (n_s, n_h)
    print(f"rules: selfjoin {n_s} == hof {n_h}", flush=True)

    walls: dict[str, list[float]] = {"selfjoin": [], "hof": []}
    for r in range(reps):
        for name in ("selfjoin", "hof"):
            g0, t0 = jvm_gc_ms(), time.monotonic()
            n = arm(name).count()
            w = time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
            walls[name].append(w)
            print(f"rep {r} {name}: {w:.2f} s (rows {n})", flush=True)
    for name, ws in walls.items():
        print(f"{name}: median {statistics.median(ws):.2f} s  all "
              f"{[round(w, 2) for w in ws]}", flush=True)
    wins = sum(1 for s, h in zip(walls["selfjoin"], walls["hof"]) if h < s)
    print(f"hof wins {wins}/{reps} interleaved rep-pairs", flush=True)


if __name__ == "__main__":
    main()
