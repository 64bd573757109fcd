"""Interleaved A/B of basket_rules' Apriori item prune (SCALING
§10a0e) — the r12 lesson applied: alternate the two plans rep-by-rep
in ONE session, so host weather hits both arms equally.

Two item universes over the same 60M-row lineitem at /tmp/sf10:

- uniform: (l_orderkey, l_partkey) — TPC-H-shaped keys, every item far
  above any small min_pair_count, the prune removes NOTHING. This arm
  prices the prune's no-op cost (the extra item-keyed exchange).
- tailed: (l_orderkey, xxhash64(orderkey, linenumber) pmod M) with
  M = rows/1.5 — a Poisson(1.5) item universe where ~40% of occupied
  items are one-off (the sparse-SKU tail every real catalog has; the
  testdata has no organic tail — TPC-H uniformity and a 336-word
  synthetic doc vocabulary both clear any threshold). This arm
  measures the prune where the tail binds at SMALL baskets (~6
  items), where the pair explode is only ~1x the presence rows.
- tailed_big: (l_orderkey div 8, same hashed items) — merged ~48-item
  carts, explode factor ~23x. This is the regime the prune exists
  for: a big quadratic intermediate AND an item tail.

Usage: python tools/r13_basket_ab.py [sf_dir [reps]]
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
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="r13_basket_ab")

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
    n_rows = li.count()
    m = int(n_rows / 1.5)
    frames = {
        "uniform": li.select(
            F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
        ),
        "tailed": li.select(
            F.col("l_orderkey").alias("bk"),
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber"), F.lit(m)
            ).alias("it"),
        ),
        "tailed_big": li.select(
            (F.col("l_orderkey") / 8).cast("bigint").alias("bk"),
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber"), F.lit(m)
            ).alias("it"),
        ),
    }

    def pair_rows(frame, pruned: bool) -> int:
        b = frame.filter(
            F.col("bk").isNotNull() & F.col("it").isNotNull()
        ).distinct()
        if pruned:
            items = b.groupBy("it").agg(F.count(F.lit(1)).alias("n"))
            b = b.join(items.filter(F.col("n") < 2).select("it"), "it", "anti")
        sizes = b.groupBy("bk").agg(F.count(F.lit(1)).alias("k"))
        row = sizes.agg(
            F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("p")
        ).collect()[0]
        return int(row["p"] or 0)

    for name, frame in frames.items():
        plans = {
            "pruned": basket_rules(frame, "bk", "it", 2, apriori_prune=True),
            "unpruned": basket_rules(
                frame, "bk", "it", 2, apriori_prune=False
            ),
        }
        walls: dict[str, list[float]] = {a: [] for a in plans}
        out_rows: dict[str, int] = {}
        for arm, df in plans.items():  # warm both arms first
            out_rows[arm] = df.count()
        for _ in range(reps):
            for arm, df in plans.items():  # interleave
                g0, t0 = jvm_gc_ms(), time.monotonic()
                df.count()
                walls[arm].append(
                    time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
                )
        assert out_rows["pruned"] == out_rows["unpruned"]
        pre = pair_rows(frame, pruned=False)
        post = pair_rows(frame, pruned=True)
        print(
            f"{name}: pruned {statistics.median(walls['pruned']):.2f}s / "
            f"unpruned {statistics.median(walls['unpruned']):.2f}s "
            f"(rows={out_rows['pruned']:,}); pair-explode "
            f"{pre:,} -> {post:,} ({(1 - post / max(pre, 1)) * 100:.1f}% cut)",
            flush=True,
        )


if __name__ == "__main__":
    main()
