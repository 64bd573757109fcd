"""Write .explain('formatted') for each headline query to
plans/r14/<query>_<tag>.txt (tag = argv[1], default 'before')."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "anomaly_zscore", "rolling_features", "sequences", "pricing_summary",
    "revenue_by_nation", "top_customers", "events_hourly_join",
    "doc_dedup_exact", "token_counts", "embedding_knn", "embedding_knn_lsh",
    "minhash_pairs", "bucketed_rolling", "salted_agg", "sequence_scores",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or HEADLINE

    import __spark_entry__ as entrymod
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    spark = get_spark(app_name="r14-plans")
    outdir = os.path.join(REPO, "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = getattr(entrymod, f"q_{name}")
        df = fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(name, "->", f"{name}_{tag}.txt", len(txt), "bytes")


if __name__ == "__main__":
    main()
