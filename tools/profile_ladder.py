"""Per-operator GC attribution for the longdoc ladder's 200k rung.

bench.py times quality_rules + minhash_signatures + span_dedup_stats as
one block; this splits them so the GC growth (r9: 2.47 s at 200k, 45% of
wall) can be attributed to ONE operator before optimizing. Run:

    python tools/profile_ladder.py [tokens ...]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rungs = [int(a) for a in sys.argv[1:]] or [100_000, 200_000]

    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.operators.corpus import (
        make_longdoc_corpus,
        quality_rules,
    )
    from amonaly_detection_in_time_series_data_spark.operators.dedup import (
        span_dedup_stats,
    )
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        minhash_signatures,
    )
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    spark = get_spark(app_name="profile_ladder")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    docs = load_table(spark, sf_dir, "documents")
    ops = {
        "quality_rules": lambda ld: quality_rules(ld, "text"),
        "minhash_sigs": lambda ld: minhash_signatures(
            ld, "text", "doc_id", n_hashes=8, shingle_n=3
        ),
        "span_stats": lambda ld: span_dedup_stats(
            ld, "text", "doc_id", span_len=8
        ),
    }
    for tokens in rungs:
        ld = (
            make_longdoc_corpus(docs, 16, tokens)
            .select("doc_id", "text")
            .localCheckpoint()
        )
        for name, fn in ops.items():
            # warm once (plan + JIT), then measure
            fn(ld).write.format("noop").mode("overwrite").save()
            spark.sparkContext._jvm.System.gc()
            gc0 = jvm_gc_ms()
            t0 = time.perf_counter()
            fn(ld).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            gc = (jvm_gc_ms() - gc0) / 1000.0
            print(
                f"{tokens//1000}k {name}: wall={wall:.3f} gc={gc:.3f} "
                f"minus_gc={wall - gc:.3f}",
                flush=True,
            )
        ld.unpersist(blocking=True)


if __name__ == "__main__":
    main()
