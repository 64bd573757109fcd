"""§16 skew sweep extension (r14): the INDEXED ppjoin cap at sf1
scale — the flagship artifact path under a planted 10^4-doc flood,
DEFAULT driver heap, same protocol as tools/r13_skew_sf1.py.

Plants 10^4 tiny docs sharing ONE vocab-disjoint gram inside the 50k
real sf1b documents, builds the ids-native store over the union
corpus (exactly what a composed store would hold after ingesting the
flood), and runs `prefix_jaccard_join_indexed(max_gram_df=...)` with
the store's own df index as the hot source. Asserts: (a) the flood
gram is excluded and reported, (b) real-doc pairs equal the
clean-store run (vocab-disjoint ⇒ separable by construction), (c) no
OOM at the default heap — C(10^4, 2) = 5*10^7 candidate pairs from
the one flood gram is the blowup the cap deletes.

Usage: python tools/r14_skew_indexed.py [docs_dir]  (default /tmp/sf1b)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLOOD = 10_000
CAP = 1_000


def main() -> None:
    from pyspark.sql import functions as F

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

    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1b"
    spark = get_spark(app_name="r14_skew_indexed")

    docs = load_table(spark, docs_dir, "documents").select("doc_id", "text")
    flood = spark.range(FLOOD).select(
        (F.col("id") + 10**9).alias("doc_id"),
        F.lit("zqx wvk jpf").alias("text"),
    )

    def build_store(frame, base):
        if os.path.isdir(base):
            shutil.rmtree(base)
        t0 = time.monotonic()
        gram_df_index_build(frame, f"{base}/gram_df")
        gram_ids_build(frame, f"{base}/gram_ids")
        ordered_tokens_build(
            frame, f"{base}/tokens", f"{base}/gram_df",
            gram_ids_path=f"{base}/gram_ids",
        )
        print(f"store {base}: built in {time.monotonic() - t0:.1f} s",
              flush=True)
        return base

    flooded = build_store(
        docs.unionByName(flood), "/tmp/r14_skew_store"
    )
    clean = build_store(docs, "/tmp/r14_skew_store_clean")

    t0 = time.monotonic()
    pairs, excluded = prefix_jaccard_join_indexed(
        spark, f"{flooded}/tokens", 1, 2,
        max_gram_df=CAP,
        gram_df_path=f"{flooded}/gram_df",
        gram_ids_path=f"{flooded}/gram_ids",
        return_excluded=True,
    )
    n_real = pairs.filter(
        (F.col("id_a") < 10**9) & (F.col("id_b") < 10**9)
    ).count()
    n_all = pairs.count()
    ex = excluded.collect()
    wall = time.monotonic() - t0
    print(
        f"capped indexed join: {wall:.2f} s real_pairs={n_real} "
        f"all_pairs={n_all} excluded={[(r['gram'], r['df']) for r in ex]}",
        flush=True,
    )

    t0 = time.monotonic()
    n_clean = prefix_jaccard_join_indexed(
        spark, f"{clean}/tokens", 1, 2
    ).count()
    print(
        f"clean store uncapped: {time.monotonic() - t0:.2f} s "
        f"pairs={n_clean}", flush=True,
    )
    assert len(ex) == 1 and ex[0]["df"] == FLOOD, ex
    assert n_real == n_clean, (n_real, n_clean)
    print("OK: flood excluded+reported, real pairs == clean store",
          flush=True)


if __name__ == "__main__":
    main()
