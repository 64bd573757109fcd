"""Table maintenance: small-file compaction and clustered re-layout.

The operational reality of a 100 TB lake that none of the query
operators address: streaming sinks, incremental ingest, and
over-parallel writes leave tables as thousands of KB-sized files.
Every downstream scan then pays one task + one open/footer-read per
file, listing dominates planning, and min/max row-group pruning is
useless because every file spans the whole key range.

:func:`compact_files` rewrites a table into ``ceil(bytes /
target_file_mb)`` right-sized files, optionally RANGE-CLUSTERED on a
sort key:

- ``sort_by`` → ``repartitionByRange(n, *sort_by)`` +
  ``sortWithinPartitions`` — every output file covers a DISJOINT key
  range (asserted from parquet footer min/max in tests), so a later
  filter on the sort key prunes whole files via footer stats before a
  single data page is read. This is the portable 80% of Delta/Iceberg
  ``OPTIMIZE ... ZORDER BY`` for the 1-key case, with none of the
  table-format dependency.
- no ``sort_by`` → round-robin ``repartition(n)`` for equal-sized
  output files (``coalesce`` would be shuffle-free but inherits input
  skew and caps write parallelism at n — wrong trade for a maintenance
  job that runs off the critical path).

Sizing reads the source's TOTAL BYTES from the filesystem (Hadoop
``ContentSummary`` — works on HDFS/S3A/local alike), not a row-count
guess: parquet-in ≈ parquet-out for the same codec, so output files
land near ``target_file_mb``. The whole operator is one job: scan →
one exchange → write; at 100 TB you run it per partition/day, not over
the full table (pass the partition directory as ``in_path``).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

__all__ = ["compact_files", "data_file_stats"]


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def data_file_stats(spark: SparkSession, path: str) -> dict:
    """(n_files, total_bytes) of the DATA files under ``path`` via the
    Hadoop FileSystem API (portable: local/HDFS/S3A). Metadata files
    (``_SUCCESS``, ``.crc``, ``_committed*``) are excluded."""
    fs, jpath = _fs_and_path(spark, path)
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return {"n_files": n, "total_bytes": total}


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: float = 256,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
) -> dict:
    """Rewrite ``in_path`` into right-sized (optionally range-clustered)
    files at ``out_path``; returns before/after file stats.

    ``out_path`` must differ from ``in_path`` (write-then-swap is the
    caller's atomic-replace strategy; an in-place overwrite would
    delete the input under its own scan).
    """
    if in_path.rstrip("/") == out_path.rstrip("/"):
        raise ValueError("compact_files: out_path must differ from in_path")
    before = data_file_stats(spark, in_path)
    if before["n_files"] == 0:
        raise ValueError(f"compact_files: no data files under {in_path}")
    n_out = max(1, math.ceil(before["total_bytes"] / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(in_path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").format(fmt).save(out_path)
    after = data_file_stats(spark, out_path)
    return {
        "in_files": before["n_files"],
        "in_bytes": before["total_bytes"],
        "out_files": after["n_files"],
        "out_bytes": after["total_bytes"],
        "target_files": n_out,
    }
