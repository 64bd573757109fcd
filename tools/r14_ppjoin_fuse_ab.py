"""r14 A/B (the r13 verdict's #2): fused vs two-stage ppjoin back half
over a WARM sf10 ordered-tokens artifact.

The fused tail joins the artifact once per verify side carrying both
the hash array and the gram strings (4 logical scans), the r12 shape
joins twice per side (6 scans) with the hash screen between. The r13
stage ladder attributed ~13 s of the 20.7 s artifact call to the
candidate term; this measures what the scan-count cut buys and what
the heavier candidate rows cost.

Protocol: SCALING §10a0c/§10a0e — one session, artifact built once
(timed separately), both arms warmed, then INTERLEAVED rep-pairs of
(wall − JVM-GC) via df.count(); identical pair counts asserted.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r14_ppjoin_fuse_ab.py \
    [docs_dir work_dir reps]   (defaults /tmp/sf10 /tmp/r14_ppjoin 3)
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
        ordered_tokens_build,
        prefix_jaccard_join_indexed,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r14_ppjoin"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    gpath, tpath = f"{work}/gram_df", f"{work}/tokens"
    spark = get_spark(app_name="r14_ppjoin_fuse_ab")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    docs = load_table(spark, docs_dir, "documents").select("doc_id", "text")
    if not os.path.isdir(tpath):
        t0 = time.monotonic()
        gram_df_index_build(docs, gpath)
        t1 = time.monotonic()
        ordered_tokens_build(docs, tpath, gpath)
        t2 = time.monotonic()
        print(f"build: index {t1 - t0:.1f} s, tokens {t2 - t1:.1f} s",
              flush=True)
    else:
        print("artifacts already built, reusing", flush=True)

    def arm(fused: bool):
        return prefix_jaccard_join_indexed(spark, tpath, 1, 2, fused=fused)

    # warm both arms (plan + shuffle files + code cache) and assert
    # identical results
    n_f = arm(True).count()
    n_u = arm(False).count()
    assert n_f == n_u, (n_f, n_u)
    print(f"pairs: fused {n_f} == unfused {n_u}", flush=True)

    walls: dict[str, list[float]] = {"fused": [], "unfused": []}
    for r in range(reps):
        for name, fused in (("fused", True), ("unfused", False)):
            g0, t0 = jvm_gc_ms(), time.monotonic()
            n = arm(fused).count()
            w = time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
            walls[name].append(w)
            print(f"rep {r} {name}: {w:.2f} s (rows {n})", flush=True)
    for name, ws in walls.items():
        print(
            f"{name}: median {statistics.median(ws):.2f} s  all "
            f"{[round(w, 2) for w in ws]}",
            flush=True,
        )
    pair_wins = sum(
        1 for f, u in zip(walls["fused"], walls["unfused"]) if f < u
    )
    print(f"fused wins {pair_wins}/{reps} interleaved rep-pairs", flush=True)


if __name__ == "__main__":
    main()
