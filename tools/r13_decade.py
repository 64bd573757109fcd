"""r13 re-measurement of the two third-decade ceilings the r12 verdict
prescribed fixes for (SCALING.md §10a0e):

- sequence_scores after the stats='collect' fix (the lazy broadcast-
  stats branch re-executed the full scoring pass per action; now the
  mu/sigma job runs ONCE at build as a bounded 1-row collect). The
  warm action is now ONE global pass. The one-time build — fit collect
  + stats job — is timed separately and reported, so the protocol
  change is visible, not hidden.
- basket_rules uncapped, with the r13 Apriori item-frequency prune ON
  (new default) vs OFF (the r12 plan), plus the pair-explode input
  row count both ways (sum over baskets of C(k,2)) — the intermediate
  the prune exists to shrink.

Protocol: tools/r12_third_decade.py's — one clean session for both
scales, warm first, median of reps x (wall - JVM-GC) via df.count().

Usage: python tools/r13_decade.py [small_dir large_dir [reps]]
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

    import __spark_entry__ as entry
    from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
        basket_rules,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    small, large = (
        (sys.argv[1], sys.argv[2])
        if len(sys.argv) > 2
        else ("/tmp/sf1", "/tmp/sf10")
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="r13_decade")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    def build(name: str, sf_dir: str):
        if name == "sequence_scores":
            return entry.q_sequence_scores(spark, sf_dir)
        li = load_table(spark, sf_dir, "lineitem")
        if name == "basket_pruned":
            return basket_rules(li, "l_orderkey", "l_partkey", 2)
        if name == "basket_unpruned":
            return basket_rules(
                li, "l_orderkey", "l_partkey", 2, apriori_prune=False
            )
        # mpc=8: lineitem HAS a basket-count<8 item tail, so this pair
        # measures the prune where it binds (mpc=2 is the no-op price)
        if name == "basket8_pruned":
            return basket_rules(li, "l_orderkey", "l_partkey", 8)
        if name == "basket8_unpruned":
            return basket_rules(
                li, "l_orderkey", "l_partkey", 8, apriori_prune=False
            )
        raise ValueError(name)

    def pair_explode_rows(sf_dir: str, pruned: bool, mpc: int = 2) -> int:
        """Rows entering the pair groupBy = sum over baskets of
        C(k,2), k = per-basket surviving DISTINCT items."""
        li = load_table(spark, sf_dir, "lineitem")
        b = (
            li.select(
                F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
            )
            .filter(F.col("b").isNotNull() & F.col("i").isNotNull())
            .distinct()
        )
        if pruned:
            items = b.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
            b = b.join(
                items.filter(F.col("n") < mpc).select("i"), "i", "anti"
            )
        sizes = b.groupBy("b").agg(F.count(F.lit(1)).alias("k"))
        row = sizes.agg(
            F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("p")
        ).collect()[0]
        return int(row["p"] or 0)

    OPS = [
        "sequence_scores", "basket_pruned", "basket_unpruned",
        "basket8_pruned", "basket8_unpruned",
    ]
    results: dict[str, dict[str, float]] = {o: {} for o in OPS}
    rows: dict[str, dict[str, int]] = {o: {} for o in OPS}
    builds: dict[str, dict[str, float]] = {o: {} for o in OPS}
    for sf_dir in (small, large):
        for op in OPS:
            t0 = time.monotonic()
            df = build(op, sf_dir)
            builds[op][sf_dir] = time.monotonic() - t0
            df.count()  # warm (plan + shuffle files + code cache)
            walls = []
            for _ in range(reps):
                g0, t0 = jvm_gc_ms(), time.monotonic()
                n = df.count()
                walls.append(
                    time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
                )
            results[op][sf_dir] = statistics.median(walls)
            rows[op][sf_dir] = n
            print(
                f"{op:16s} {os.path.basename(sf_dir):6s} "
                f"median-GC {results[op][sf_dir]:.3f}s rows={n} "
                f"(build {builds[op][sf_dir]:.2f}s)",
                flush=True,
            )
    print("\n| op | sf1 | sf10 (10x) | ratio | result rows |")
    print("|---|---|---|---|---|")
    for op in OPS:
        s, l = results[op][small], results[op][large]
        print(
            f"| {op} | {s:.2f} | {l:.2f} | {l / max(s, 1e-9):.2f}x "
            f"| {rows[op][small]:,} -> {rows[op][large]:,} |"
        )
    for sf_dir in (small, large):
        for mpc in (2, 8):
            pre = pair_explode_rows(sf_dir, pruned=False, mpc=mpc)
            post = pair_explode_rows(sf_dir, pruned=True, mpc=mpc)
            print(
                f"pair-explode rows @{os.path.basename(sf_dir)} mpc={mpc}: "
                f"unpruned {pre:,} -> pruned {post:,} "
                f"({(1 - post / max(pre, 1)) * 100:.1f}% cut)",
                flush=True,
            )


if __name__ == "__main__":
    main()
