"""Sinks. The reference only logs results; we expose a parquet sink
(partitioned, snappy) as the engine's canonical output format."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table BUCKETED by join/aggregation key — the layout
    that removes the shuffle from every later join/groupBy on that key.

    ``bucketBy`` hash-partitions rows into ``n_buckets`` files per
    partition and records the layout in the catalog; a join of two
    tables bucketed identically (same cols, same bucket count) compiles
    to a SortMergeJoin with ZERO Exchange on either side (asserted in
    tests/test_operators.py::TestBucketedJoin), and ``sort_cols``
    pre-sorts within buckets so even the Sort can be elided.

    This is the 100 TB fact-fact answer: shuffle the fact table ONCE at
    write time, then every recurring join/agg on the bucket key reads
    co-located data. Requires a catalog table (Spark's bucketing
    metadata lives there — plain ``.parquet(path)`` cannot carry it).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
