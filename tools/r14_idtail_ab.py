"""r14 A/B: the exact-id tail vs the hash tail over WARM sf10
ordered-tokens artifacts.

The id tail (`_ppjoin_tail_ids`) is what the gram-id dictionary
unlocks: candidate equi-join on exact 4-byte ints, the aggregated
PPJoin bound (cnt + suffix-min — collision-free only with exact ids)
replacing the per-row positional filter, and ONE exact
`array_intersect` attach stage instead of hash-screen + string-verify
(3 artifact scans vs ~6, int-array payload = half the long arrays).

Each arm scans ITS production artifact (the id arm's store carries
toks_id; both scans are column-pruned), same corpus, same thresholds.

Protocol: SCALING §10a0c/§10a0e — one session, artifacts warm, arms
warmed, INTERLEAVED rep-pairs of (wall − JVM-GC) via df.count(),
identical pair counts asserted, per-call shuffle GC (the §10a0f
ENOSPC lesson), nothing else on the box.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r14_idtail_ab.py \
    [hash_store ids_store p q reps]
    (defaults /tmp/r14_ppjoin /tmp/r14_ppjoin_ids 1 2 3)
"""

from __future__ import annotations

import os
import statistics
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

    hash_store = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r14_ppjoin"
    ids_store = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r14_ppjoin_ids"
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    q = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    spark = get_spark(app_name="r14_idtail_ab")

    if not os.path.isdir(f"{ids_store}/tokens"):
        docs = load_table(spark, "/tmp/sf10", "documents").select(
            "doc_id", "text"
        )
        t0 = time.monotonic()
        gram_df_index_build(docs, f"{ids_store}/gram_df")
        t1 = time.monotonic()
        gram_ids_build(docs, f"{ids_store}/gram_ids")
        t2 = time.monotonic()
        ordered_tokens_build(
            docs, f"{ids_store}/tokens", f"{ids_store}/gram_df",
            gram_ids_path=f"{ids_store}/gram_ids",
        )
        t3 = time.monotonic()
        print(
            f"ids store build: gram_df {t1 - t0:.1f} s, gram_ids "
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

    def timed(df):
        g0, t0 = jvm_gc_ms(), time.monotonic()
        n = df.count()
        w = time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
        spark.sparkContext._jvm.System.gc()  # reclaim shuffle files
        return w, n

    arms = {
        "ids": lambda: prefix_jaccard_join_indexed(
            spark, f"{ids_store}/tokens", p, q
        ),
        "hash": lambda: prefix_jaccard_join_indexed(
            spark, f"{hash_store}/tokens", p, q, use_ids=False
        ),
    }
    counts: dict[str, int] = {}
    for name, mk in arms.items():
        w, n = timed(mk())
        counts[name] = n
        print(f"warm {name}: {w:.2f} s (pairs {n})", flush=True)
    assert counts["ids"] == counts["hash"], counts

    walls: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(reps):
        for name, mk in arms.items():
            w, n = timed(mk())
            assert n == counts[name], (name, n, counts[name])
            walls[name].append(w)
            print(f"rep {r} {name}: {w:.2f} s", flush=True)
    for name in arms:
        print(
            f"{name}: median {statistics.median(walls[name]):.2f} s  all "
            f"{[round(w, 2) for w in walls[name]]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
