"""r14: can the exact-id tail complete sf40 (2M docs) at the headline
J >= 1/2 threshold on ONE box — where both the string-keyed (§10a0f
finding 1) and hash-keyed (finding 2) tails exhausted the disk?

The id tail changes two terms at once: the aggregated PPJoin bound
cuts the survivor set BEFORE the payload-attach stage (the wall was
the attach spill, O(survivors × arrays)), and the attached arrays are
4-byte ints instead of 8-byte longs. This probe is the honest
experiment: build the ids-native store for /tmp/sf40 once, run ONE
J >= 1/2 call with per-call shuffle GC, report wall + pairs or the
abort. Also runs 7/10 (the threshold the hash tail's decade curve
used) for the direct slope comparison vs §10a0f's 113.27 s.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r14_idtail_sf40.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        gram_df_index_build,
        gram_ids_build,
        ordered_tokens_build,
        prefix_jaccard_join_indexed,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    store = "/tmp/r14_ppjoin40_ids"
    spark = get_spark(app_name="r14_idtail_sf40")

    if not os.path.isdir(f"{store}/tokens"):
        docs = load_table(spark, "/tmp/sf40", "documents").select(
            "doc_id", "text"
        )
        t0 = time.monotonic()
        gram_df_index_build(docs, f"{store}/gram_df")
        t1 = time.monotonic()
        gram_ids_build(docs, f"{store}/gram_ids")
        t2 = time.monotonic()
        ordered_tokens_build(
            docs, f"{store}/tokens", f"{store}/gram_df",
            gram_ids_path=f"{store}/gram_ids",
        )
        t3 = time.monotonic()
        print(
            f"sf40 ids store build: gram_df {t1 - t0:.1f} s, gram_ids "
            f"{t2 - t1:.1f} s, tokens {t3 - t2:.1f} s", flush=True,
        )

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    # sf10's ids store (tools/r14_idtail_ab.py builds it) joins the
    # probe when present, so one run prints the within-shape decade
    # slope at both thresholds
    stores = {"sf40": store}
    if os.path.isdir("/tmp/r14_ppjoin_ids/tokens"):
        stores["sf10"] = "/tmp/r14_ppjoin_ids"
    for p, q in ((7, 10), (1, 2)):
        for tag in sorted(stores):
            g0, t0 = jvm_gc_ms(), time.monotonic()
            n = prefix_jaccard_join_indexed(
                spark, f"{stores[tag]}/tokens", p, q
            ).count()
            w = time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
            print(
                f"id tail {tag} J>={p}/{q}: {w:.2f} s (pairs {n})",
                flush=True,
            )
            spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
