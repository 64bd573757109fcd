"""r14: per-batch ingest cost of the composed (ids-native) similarity
store as the corpus grows — 50k sf1b docs in 10 batches of 5k into a
fresh store, wall per `similarity_index_update` call.

What the curve shows: the tokens-partition write is O(batch), but the
dictionary fold's anti-join and the df fold's union-groupBy each scan
corpus-vocabulary-sized state, so the per-batch wall has an O(vocab)
component that grows with the store — the honestly-documented cost
class of every fold in this repo's ingest-store family. A final
`prefix_jaccard_join_indexed` over the finished store pins the result
against the one-shot clean-store count (2,560 pairs at J >= 1/2, the
§16 fixture's known answer).

Usage: python tools/r14_ingest_curve.py [docs_dir batches]
    (defaults /tmp/sf1b 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from amonaly_detection_in_time_series_data_spark.operators.ingest import (
        similarity_index_update,
    )
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        prefix_jaccard_join_indexed,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1b"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = "/tmp/r14_ingest_curve_store"
    if os.path.isdir(base):
        shutil.rmtree(base)
    spark = get_spark(app_name="r14_ingest_curve")

    docs = load_table(spark, docs_dir, "documents").select("doc_id", "text")
    # deterministic batch split by doc_id hash (stable across runs)
    with_b = docs.withColumn(
        "__b", F.pmod(F.xxhash64("doc_id"), F.lit(n_batches))
    )
    for b in range(n_batches):
        batch = with_b.filter(F.col("__b") == b).drop("__b")
        t0 = time.monotonic()
        similarity_index_update(batch, base, b)
        print(
            f"batch {b}: {time.monotonic() - t0:.2f} s "
            f"({batch.count()} docs)", flush=True,
        )
    t0 = time.monotonic()
    n = prefix_jaccard_join_indexed(spark, f"{base}/ordered_tokens").count()
    print(
        f"store join after {n_batches} batches: "
        f"{time.monotonic() - t0:.2f} s pairs={n}", flush=True,
    )


if __name__ == "__main__":
    main()
