"""r14 fourth-decade probe (the r13 verdict's #4): re-measure the two
r13-bought-back curves one decade past the decade they were built on —
out-of-sample evidence for "the residual is per-query work".

- sequence_scores(stats='collect'): /tmp/sf10 events (10M) vs /tmp/sf30
  (30M, 3x). One-time build (fit + stats collects) timed separately;
  the warm action is the curve.
- ppjoin over the persisted gram-df index + ordered-tokens artifact:
  /tmp/sf10 documents (500k, artifacts under /tmp/r14_ppjoin) vs
  /tmp/sf40 (2M docs, 4x, artifacts under /tmp/r14_ppjoin40). Builds
  timed separately; the warm artifact join is the curve.

Slopes are named per 10x by log-scaling the measured step
(ratio^(1/log10(step))), the §10a0c convention for non-10x steps.

Protocol: one clean session, warm first, INTERLEAVED rep-pairs of
(wall − JVM-GC) via df.count(); no pinned corpus tables anywhere
(artifact path scans parquet; sequence_scores' collects are bounded) —
SCALING §11's two-pinned-tables rule is satisfied vacuously.

r14 protocol amendment (found the hard way, twice): the ppjoin_sf40
arm spills ~30 GB of shuffle per call, and EVERY rep that follows it
in the same session — including the 1.7-s seq_sf10 — reads 3-4x its
warm-pass wall (dirty-page writeback + accumulated session shuffle
files). An arm that floods the disk contaminates an interleaved
session the same way a second pinned corpus table does (§11's
two-pinned-tables rule, IO edition). So the probe takes a mode: run
`seq` and `ppjoin` in SEPARATE sessions; each curve stays internally
interleaved (the ratio is within-curve), and the seq curve never
shares a session with the flooder. `all` retains the old behavior
for the record.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r14_decade.py \
    [reps] [all|seq|ppjoin]
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        gram_df_index_build,
        ordered_tokens_build,
        prefix_jaccard_join_indexed,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    assert mode in ("all", "seq", "ppjoin"), mode
    spark = get_spark(app_name="r14_decade")

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
        # r14: force the ContextCleaner to reclaim the call's shuffle
        # files NOW — Spark's periodic cleaner GC defaults to 30 min,
        # and the sf40 arm spills ~25 GB per call, so a 3-rep session
        # fills the box's disk before the cleaner ever fires (measured:
        # rep 2 died ENOSPC with 75 GB of lingering blockmgr dirs).
        # Outside the timed window, so it costs the probe nothing.
        spark.sparkContext._jvm.System.gc()
        return w, n

    # ---- ppjoin artifacts (build once, reuse across runs) ----
    stores = {}
    for tag, docs_dir, store in (
        ("sf10", "/tmp/sf10", "/tmp/r14_ppjoin"),
        ("sf40", "/tmp/sf40", "/tmp/r14_ppjoin40"),
    ) if mode in ("all", "ppjoin") else ():
        tok = f"{store}/tokens"
        if not os.path.isdir(tok):
            docs = load_table(spark, docs_dir, "documents").select(
                "doc_id", "text"
            )
            t0 = time.monotonic()
            gram_df_index_build(docs, f"{store}/gram_df")
            t1 = time.monotonic()
            ordered_tokens_build(docs, tok, f"{store}/gram_df")
            t2 = time.monotonic()
            print(
                f"{tag} build: index {t1 - t0:.1f} s, tokens "
                f"{t2 - t1:.1f} s", flush=True,
            )
        else:
            print(f"{tag} artifacts exist, reusing", flush=True)
        stores[tag] = tok

    # ---- builds + warm ----
    # threshold 7/10, not the headline 1/2: the screen join attaches
    # both docs' toks_h arrays to EVERY candidate pair, so its spill
    # volume is O(candidates x doc_size) — at sf40 @ J>=1/2 that
    # exhausted this box's free disk (~75 GB) with SPILL_OUT_OF_MEMORY
    # aborts (a real cluster has aggregate disk across executors; on
    # one box the probe runs at the threshold that fits — SCALING
    # §10a0f records both findings).
    arms: dict[str, object] = {}
    if mode in ("all", "ppjoin"):
        for tag in ("sf10", "sf40"):
            arms[f"ppjoin_{tag}"] = lambda t=tag: prefix_jaccard_join_indexed(
                spark, stores[t], 7, 10
            )
    if mode in ("all", "seq"):
        for tag, d in (("sf10", "/tmp/sf10"), ("sf30", "/tmp/sf30")):
            t0 = time.monotonic()
            df = entry.q_sequence_scores(spark, d)
            print(f"seq_{tag} build (fit+stats): {time.monotonic() - t0:.1f} s",
                  flush=True)
            arms[f"seq_{tag}"] = lambda df=df: df

    order = [
        k for k in ("seq_sf10", "seq_sf30", "ppjoin_sf10", "ppjoin_sf40")
        if k in arms
    ]
    for name in order:
        w, n = timed(arms[name]())
        print(f"warm {name}: {w:.2f} s (rows {n})", flush=True)

    walls: dict[str, list[float]] = {k: [] for k in order}
    for r in range(reps):
        for name in order:
            w, n = timed(arms[name]())
            walls[name].append(w)
            print(f"rep {r} {name}: {w:.2f} s (rows {n})", flush=True)

    med = {k: statistics.median(v) for k, v in walls.items()}
    for k in order:
        print(f"{k}: median {med[k]:.2f} s  all "
              f"{[round(w, 2) for w in walls[k]]}", flush=True)

    def slope(lo, hi, step):
        return (med[hi] / med[lo]) ** (1.0 / math.log10(step))

    if mode in ("all", "seq"):
        print(
            f"sequence_scores sf10->sf30 (3x): x{med['seq_sf30'] / med['seq_sf10']:.2f}"
            f" => {slope('seq_sf10', 'seq_sf30', 3):.2f}x/decade", flush=True,
        )
    if mode in ("all", "ppjoin"):
        print(
            f"ppjoin artifact sf10->sf40 (4x): x{med['ppjoin_sf40'] / med['ppjoin_sf10']:.2f}"
            f" => {slope('ppjoin_sf10', 'ppjoin_sf40', 4):.2f}x/decade", flush=True,
        )


if __name__ == "__main__":
    main()
