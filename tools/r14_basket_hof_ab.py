"""r14 A/B (the r13 verdict's #3): basket pair generation WITHOUT the
self-join — groupBy basket → sorted array → HOF pair expansion (ONE
basket-keyed exchange) vs the r12 self-join shape (the presence frame
shuffled twice as lhs/rhs of the equi-join).

The 3.26x/decade term named in r12/r13 is the pair shuffle on
tail-free data; this measures whether halving the basket-keyed
exchanges moves it. Protocol: SCALING §10a0c/§10a0e — one session,
warm both arms, INTERLEAVED rep-pairs of (wall − JVM-GC) via
df.count(); identical rule counts asserted.

Usage: python tools/r14_basket_hof_ab.py [sf_dir reps mpc]
    (defaults /tmp/sf10 3 2)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
        basket_rules,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mpc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name="r14_basket_hof_ab")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    li = load_table(spark, sf_dir, "lineitem")

    def arm(strategy: str):
        return basket_rules(
            li, "l_orderkey", "l_partkey", mpc, pair_strategy=strategy
        )

    n_s = arm("selfjoin").count()
    n_h = arm("hof").count()
    assert n_s == n_h, (n_s, n_h)
    print(f"rules: selfjoin {n_s} == hof {n_h} (mpc={mpc})", flush=True)

    walls: dict[str, list[float]] = {"selfjoin": [], "hof": []}
    for r in range(reps):
        for name in ("selfjoin", "hof"):
            g0, t0 = jvm_gc_ms(), time.monotonic()
            n = arm(name).count()
            w = time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
            walls[name].append(w)
            print(f"rep {r} {name}: {w:.2f} s (rows {n})", flush=True)
    for name, ws in walls.items():
        print(
            f"{name}: median {statistics.median(ws):.2f} s  all "
            f"{[round(w, 2) for w in ws]}",
            flush=True,
        )
    wins = sum(
        1 for s, h in zip(walls["selfjoin"], walls["hof"]) if h < s
    )
    print(f"hof wins {wins}/{reps} interleaved rep-pairs", flush=True)


if __name__ == "__main__":
    main()
