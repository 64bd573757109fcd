"""Third-decade scale probe (SCALING.md §10a0d): the five steepest
operators from the r11 decade, measured at /tmp/sf1 (tools/make_sf1.py)
vs /tmp/sf10 (tools/make_sf10.py — 60M lineitem / 10M events / 500k
docs). Same protocol as tools/r11_new_ops_scale.py: warm, median of
(wall - GC) over reps, one clean session for both scales.

Operators (the r11 verdict's scoped set):
- sequence_scores (declared query; the two-global-pass ceiling)
- salted_agg (declared query; fixed-cost emergence)
- basket_rules, uncapped AND with the r12 max_basket_size knob set
  (non-binding on this data) so the cap's sizing pass is priced
- minhash LSH pairs + connected components (the one family that
  tracked its shuffle payload) — timed as BUILD + action per rep,
  because connected_components iterates EAGERLY at build time
  (driver-side rounds); plan-only timing would measure the final
  scan, not the operator
- prefix_jaccard_join at J>=1/2, pin=False (the declared config)

Fixture note: the two DOCUMENT operators read /tmp/sf1b (an
artifact-free 10-tile documents build from tools/make_sf10.py) on the
small side, NOT /tmp/sf1 — make_sf1's 5-class vowel rotation plants
exact cross-tile duplicate cliques at 10 tiles which dominate
similarity pair counts (30,120 of ppjoin's sf1 pairs vs 25,600
organic at 100 clean tiles); comparing a clique-inflated small side
to a clean large side would understate the decade ratio. Row
operators keep /tmp/sf1 (keys-only tiling, no text artifacts).

Usage: python tools/r12_third_decade.py [small_dir large_dir [reps]]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry
    from amonaly_detection_in_time_series_data_spark.operators.graph import (
        connected_components,
    )
    from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
        basket_rules,
    )
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        minhash_lsh_pairs,
        minhash_signatures,
        prefix_jaccard_join,
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
    small_docs = "/tmp/sf1b" if small == "/tmp/sf1" else small
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="r12_third_decade")

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
        if name == "salted_agg":
            return entry.q_salted_agg(spark, sf_dir)
        if name == "basket":
            li = load_table(spark, sf_dir, "lineitem")
            return basket_rules(li, "l_orderkey", "l_partkey", 2)
        if name == "basket_capped":
            li = load_table(spark, sf_dir, "lineitem")
            return basket_rules(
                li, "l_orderkey", "l_partkey", 2, max_basket_size=1000
            )
        if name == "minhash_cc":
            docs = load_table(
                spark, small_docs if sf_dir == small else sf_dir, "documents"
            )
            sigs = minhash_signatures(
                docs, "text", "doc_id", n_hashes=16, shingle_n=3
            )
            pairs = minhash_lsh_pairs(sigs, n_bands=4, id_col="doc_id")
            return connected_components(
                pairs.select("id_a", "id_b"), nodes=docs, node_col="doc_id"
            )
        if name == "ppjoin":
            docs = load_table(
                spark, small_docs if sf_dir == small else sf_dir, "documents"
            )
            return prefix_jaccard_join(
                docs, "text", "doc_id", 1, 2, pin=False
            )
        raise ValueError(name)

    OPS = [
        "sequence_scores", "salted_agg", "basket", "basket_capped",
        "minhash_cc", "ppjoin",
    ]
    results: dict[str, dict[str, float]] = {o: {} for o in OPS}
    rows: dict[str, dict[str, int]] = {o: {} for o in OPS}
    EAGER = {"minhash_cc"}  # iterative: the work happens in build()
    for sf_dir in (small, large):
        for op in OPS:
            if op in EAGER:
                build(op, sf_dir).count()  # warm
                walls = []
                for _ in range(reps):
                    g0, t0 = jvm_gc_ms(), time.monotonic()
                    n = build(op, sf_dir).count()
                    walls.append(
                        time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0
                    )
                results[op][sf_dir] = statistics.median(walls)
                rows[op][sf_dir] = n
                print(
                    f"{op:16s} {os.path.basename(sf_dir):6s} "
                    f"median-GC {results[op][sf_dir]:.3f}s rows={n}",
                    flush=True,
                )
                continue
            df = build(op, sf_dir)
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
                f"median-GC {results[op][sf_dir]:.3f}s rows={n}",
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


if __name__ == "__main__":
    main()
