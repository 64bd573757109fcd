"""SparkSession factory with engine defaults.

Defaults are chosen for correctness-parity with the pandas reference and
for scale-out behavior:

- ``spark.sql.session.timeZone=UTC`` — the reference's pandas timestamps
  are tz-naive (src/preprocessing.py:34 in the reference); pinning UTC
  makes Spark's timestamp arithmetic reproduce them exactly and makes
  results independent of cluster-node locale.
- AQE on — runtime coalescing of shuffle partitions, skew-join splitting.
  The events table keys windows by ``user_id``; AQE handles residual skew.
- Arrow on — all pandas interchange (tests, pandas UDFs) is vectorized.
- ``spark.sql.shuffle.partitions`` defaults to 32 for local[32] testing;
  on a real cluster this should be ~2-3x total cores (or left to AQE with
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` high).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # pandas-written parquet carries TIMESTAMP(NANOS) which Spark cannot
    # read natively; read as int64 ns and convert in sources.readers.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Window group-limit pushes top-k rank filters into partial aggregation.
    "spark.sql.window.group.limit.threshold": "1000",
    # Keep planning quiet and deterministic in tests.
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "amonaly-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` falls back to ``$SPARK_GRAFT_CPUS`` (local[N]) then local[*].
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
