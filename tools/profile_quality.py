"""Per-metric GC attribution inside quality_rules at the 200k rung."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.operators.corpus import (
        make_longdoc_corpus,
    )
    from amonaly_detection_in_time_series_data_spark.functions.text import tokenize
    from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

    spark = get_spark(app_name="profile_quality")

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
    ld = (
        make_longdoc_corpus(docs, 16, tokens)
        .select("doc_id", "text")
        .localCheckpoint()
    )

    def with_toks(d):
        d = d.withColumn("__toks", tokenize("text"))
        return d.withColumn(
            "__tok_h", F.transform("__toks", lambda t: F.xxhash64(t))
        )

    toks = F.col("__toks")
    th = F.col("__tok_h")
    n_tok = F.size(toks)

    sorted_toks = F.array_sort(th)
    run_acc = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit(None).cast("bigint").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    bigrams = F.when(
        n_tok >= 2,
        F.zip_with(
            F.slice(th, 1, n_tok - 1),
            F.slice(th, 2, n_tok - 1),
            lambda a, b: F.xxhash64(a, b),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    metrics = {
        "tokenize_only": lambda d: d.select("doc_id", F.size(tokenize("text")).alias("m")),
        "tok_hash": lambda d: with_toks(d).select("doc_id", F.size(th).alias("m")),
        "mean_wl_regex": lambda d: d.select(
            "doc_id",
            F.length(F.regexp_replace("text", r"\s", "")).alias("m"),
        ),
        "top_token_run": lambda d: with_toks(d).select(
            "doc_id", run_acc.alias("m")
        ),
        "bigram_dup": lambda d: with_toks(d)
        .withColumn("__bigrams", bigrams)
        .select(
            "doc_id",
            (F.size(F.array_distinct("__bigrams"))).alias("m"),
        ),
        "alpha_filter": lambda d: with_toks(d).select(
            "doc_id",
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).alias("m"),
        ),
        "bullet_lines": lambda d: d.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split("text", "\n"),
                    lambda l: F.ltrim(l).rlike("^[-*]"),
                )
            ).alias("m"),
        ),
    }
    for name, fn in metrics.items():
        fn(ld).write.format("noop").mode("overwrite").save()  # warm
        spark.sparkContext._jvm.System.gc()
        gc0 = jvm_gc_ms()
        t0 = time.perf_counter()
        fn(ld).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        gc = (jvm_gc_ms() - gc0) / 1000.0
        print(
            f"{name}: wall={wall:.3f} gc={gc:.3f} minus_gc={wall-gc:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
