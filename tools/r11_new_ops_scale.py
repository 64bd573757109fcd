"""Second-decade scale probe for the r11 operator additions
(prefix_jaccard_join, triangle_counts, basket_rules, rfm_segments,
keyness_log_odds): sf0.1 vs the /tmp/sf1 tiling (tools/make_sf1.py),
same protocol as tools/scale10x.py — warm, median of (wall - GC) over
reps, one clean session for both scales.

Usage: python tools/r11_new_ops_scale.py [small_dir large_dir [reps]]
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

    from amonaly_detection_in_time_series_data_spark.operators.corpus import (
        keyness_log_odds,
    )
    from amonaly_detection_in_time_series_data_spark.operators.graph import (
        triangle_counts,
    )
    from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
        basket_rules,
        rfm_segments,
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
        else ("/root/testdata/sf0.1", "/tmp/sf1")
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="r11_new_ops_scale")

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
        docs = load_table(spark, sf_dir, "documents")
        if name == "ppjoin":
            return prefix_jaccard_join(docs, "text", "doc_id", 1, 2)
        if name == "triangles":
            sigs = minhash_signatures(docs, "text", "doc_id", n_hashes=8)
            pairs = minhash_lsh_pairs(
                sigs, n_bands=4, id_col="doc_id", max_bucket_size=8
            ).select("id_a", "id_b")
            ids = docs.select("doc_id")
            tgt = ids.select(F.col("doc_id").alias("id_b"))
            syn = (
                ids.select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"),
                )
                .unionByName(
                    ids.select(
                        F.col("doc_id").alias("id_a"),
                        (F.col("doc_id") + 2).alias("id_b"),
                    )
                )
                .join(tgt, "id_b", "semi")
            )
            return triangle_counts(
                pairs.unionByName(syn), nodes=docs, node_col="doc_id"
            )
        if name == "basket":
            li = load_table(spark, sf_dir, "lineitem")
            return basket_rules(li, "l_orderkey", "l_partkey", 2)
        if name == "rfm":
            orders = load_table(spark, sf_dir, "orders")
            return rfm_segments(
                orders, "o_custkey", "o_orderdate", "o_totalprice"
            )
        if name == "keyness":
            return keyness_log_odds(
                docs, "text", F.col("doc_id") % 2 == 0, k=10
            )
        raise ValueError(name)

    OPS = ["ppjoin", "triangles", "basket", "rfm", "keyness"]
    results: dict[str, dict[str, float]] = {o: {} for o in OPS}
    for sf_dir in (small, large):
        for op in OPS:
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
            print(
                f"{op:10s} {os.path.basename(sf_dir):6s} "
                f"median-GC {results[op][sf_dir]:.3f}s rows={n}",
                flush=True,
            )
    print("\n| op | sf0.1 | sf1 (10x) | ratio |")
    print("|---|---|---|---|")
    for op in OPS:
        s, l = results[op][small], results[op][large]
        print(f"| {op} | {s:.3f} | {l:.3f} | {l / max(s, 1e-9):.2f}x |")


if __name__ == "__main__":
    main()
