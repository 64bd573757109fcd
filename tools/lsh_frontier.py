"""Measure the LSH kNN recall/wall/candidate frontier at sf0.01/sf0.1.

Compares the shipped 6x6-bit multiprobe(r=1) config against
single-table probe-radius-2 candidates before changing the declared
query. Recall is against exact brute-force cosine top-5.
"""
from __future__ import annotations

import itertools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        _random_hyperplanes,
        cosine_similarity,
        lsh_bucket,
    )
    from amonaly_detection_in_time_series_data_spark.operators.retrieval import (
        retrieval_metrics,
    )
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )
    import __spark_entry__ as e
    from pyspark.sql import Window

    spark = get_spark(app_name="lsh_frontier")

    def probe_knn(sf_dir, n_planes, radius, n_tables=1, k=5):
        from amonaly_detection_in_time_series_data_spark.operators.similarity import (
            lsh_buckets_multi,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        tables = [
            _random_hyperplanes(64, n_planes, 42 + 7919 * t)
            for t in range(n_tables)
        ]
        masks = [0]
        for r in range(1, radius + 1):
            for bits in itertools.combinations(range(n_planes), r):
                masks.append(sum(1 << b for b in bits))
        if n_tables == 1:
            c = emb.withColumn(
                "__bucket", lsh_bucket(F.col("embedding"), tables[0])
            )
            qb = F.array(lsh_bucket(F.col("embedding"), tables[0]))
        else:
            bm = lsh_buckets_multi(F.col("embedding"), tables)
            c = emb.withColumn("__bucket", F.explode(bm))
            qb = bm
        probes = F.flatten(
            F.transform(
                qb,
                lambda b: F.array(
                    *[b.bitwiseXOR(F.lit(m)) for m in masks]
                ),
            )
        )
        qd = q.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qvec"),
            F.explode(probes).alias("__bucket"),
        )
        sim = F.round(cosine_similarity(F.col("embedding"), F.col("__qvec")), 4)
        scored = (
            c.join(F.broadcast(qd), "__bucket")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id", F.col("vec_id").alias("neighbor_id"),
                sim.alias("cosine"),
            )
        )
        if n_tables > 1:
            scored = scored.groupBy("query_id", "neighbor_id").agg(
                F.first("cosine").alias("cosine")
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        brute = e.q_embedding_knn(spark, sf_dir).select(
            "query_id", "neighbor_id"
        ).localCheckpoint()
        configs = {
            "shipped_6x6_r1": lambda: e._build_embedding_knn_lsh(spark, sf_dir),
            "t2_b6_r2": lambda: probe_knn(sf_dir, 6, 2, n_tables=2),
            "t3_b6_r2": lambda: probe_knn(sf_dir, 6, 2, n_tables=3),
            "t2_b5_r2": lambda: probe_knn(sf_dir, 5, 2, n_tables=2),
            "t3_b7_r2": lambda: probe_knn(sf_dir, 7, 2, n_tables=3),
        }
        for name, fn in configs.items():
            fn().write.format("noop").mode("overwrite").save()  # warm
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            m = retrieval_metrics(fn(), brute, k=5)
            rec = m.agg(F.avg("recall_at_k")).collect()[0][0]
            print(
                f"{os.path.basename(sf_dir)} {name}: recall@5={rec:.3f} "
                f"wall={sorted(walls)[1]:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
