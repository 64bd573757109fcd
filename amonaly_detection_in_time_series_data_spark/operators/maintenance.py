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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "compact_files",
    "data_file_stats",
    "file_stats_index",
    "file_stats_index_update",
    "skipping_scan",
    "zorder_key",
]


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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-order (Morton) key over numeric/timestamp columns — the
    multi-dimensional clustering key behind Delta/Iceberg ``OPTIMIZE …
    ZORDER BY``, as a pure Catalyst integer expression.

    Each column is bucketed into ``2^bits`` uniform cells between its
    min and max (one tiny aggregate job collects the bounds — the only
    eager step), then the cell indices' bits are interleaved:
    bit ``b`` of column ``c`` lands at position ``b*n_cols + c``. Rows
    close in EVERY dimension get close keys, so range-partitioning on
    the key gives files whose footer min/max are tight in ALL the
    z-columns at once — single-column sort gives perfect pruning on one
    column and none on the rest. Uniform cells (not quantiles) keep the
    expression constant-foldable; heavy skew in a z-column degrades
    toward fewer effective cells — documented trade, same as Delta's
    default.
    """
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("zorder_key: bits * len(cols) must fit in 63 bits")
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    ).first()
    n = 2**bits
    key = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        if lo is None or hi is None:
            raise ValueError(f"zorder_key: column {c} is all-null")
        v = F.col(c).cast("double")
        lo_f, hi_f = float(lo), float(hi)
        span = hi_f - lo_f
        if span <= 0:
            cell = F.lit(0).cast("bigint")
        else:
            cell = F.least(
                F.lit(n - 1),
                F.floor((v - F.lit(lo_f)) / F.lit(span) * n).cast("bigint"),
            )
        for b in range(bits):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + ci).cast("bigint")
            )
    return key


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: float = 256,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    n_files: int | None = None,
    fmt: str = "parquet",
) -> dict:
    """Rewrite ``in_path`` into right-sized (optionally clustered)
    files at ``out_path``; returns before/after file stats.

    ``sort_by``: 1-D range clustering (disjoint key ranges per file).
    ``zorder_by``: multi-column clustering via :func:`zorder_key` —
    tight footer min/max on every listed column simultaneously.
    Mutually exclusive. ``n_files`` overrides the byte-based sizing
    with an explicit output file count.

    ``out_path`` must differ from ``in_path`` (write-then-swap is the
    caller's atomic-replace strategy; an in-place overwrite would
    delete the input under its own scan).
    """
    if in_path.rstrip("/") == out_path.rstrip("/"):
        raise ValueError("compact_files: out_path must differ from in_path")
    if sort_by and zorder_by:
        raise ValueError("compact_files: sort_by and zorder_by are exclusive")
    before = data_file_stats(spark, in_path)
    if before["n_files"] == 0:
        raise ValueError(f"compact_files: no data files under {in_path}")
    n_out = n_files or max(
        1, math.ceil(before["total_bytes"] / (target_file_mb * 1024 * 1024))
    )
    df = spark.read.format(fmt).load(in_path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    elif zorder_by:
        zk = zorder_key(df, zorder_by)
        out = (
            df.withColumn("__zk", zk)
            .repartitionByRange(n_out, "__zk")
            .sortWithinPartitions("__zk")
            .drop("__zk")
        )
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


def file_stats_index(
    spark: SparkSession, path: str, cols: list[str], fmt: str = "parquet"
) -> DataFrame:
    """Per-file min/max/null-count index over ``cols`` — the planner-side
    half of data skipping, the piece parquet footers alone cannot give
    you.

    Spark's parquet reader already prunes row groups from footer stats,
    but only AFTER scheduling one task per file and reading every
    footer: at 400k files (100 TB / 256 MB) that is 400k task launches
    and 400k footer round-trips just to discover that 399k files cannot
    match. Delta/Iceberg solve this by keeping per-file stats in table
    metadata and pruning the FILE LIST at plan time; this index is that
    metadata, format-agnostic. Build it once per table (one scan,
    ``input_file_name()`` group — map-side combine, output is one row
    per file), persist it next to the table, refresh per new file;
    :func:`skipping_scan` consumes it.

    Pairs with :func:`compact_files`: ``sort_by`` / ``zorder_by``
    layouts make each file's [min,max] interval tight, which is what
    turns the index from "keeps everything" into "skips almost
    everything".
    """
    if not cols:
        raise ValueError("file_stats_index: need at least one column")
    return _stats_over(spark.read.format(fmt).load(path), cols)


def _stats_over(df: DataFrame, cols: list[str]) -> DataFrame:
    """One index row per physical input file of ``df``'s scan."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .withColumn("file", F.regexp_replace("file", "^file:/+", "/"))
    )


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Absolute paths of the data files under ``path`` (recursive,
    metadata excluded) — normalized to match the index's ``file``
    column."""
    fs, jpath = _fs_and_path(spark, path)
    out: list[str] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append(st.getPath().toUri().getPath())
    return out


def file_stats_index_update(
    spark: SparkSession,
    path: str,
    cols: list[str],
    index_path: str,
    files: list[str] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Incremental maintenance of a PERSISTED file-stats index — the
    100 TB requirement :func:`file_stats_index` alone doesn't meet: a
    full rebuild is one scan of the whole table, but a table fed by
    per-batch ingest adds a handful of files per commit, so the index
    must follow at O(touched files) cost.

    Recomputes stats ONLY for ``files`` (default: files now under
    ``path`` that the persisted index doesn't know — exactly the
    batch's writes, since our sinks never rewrite a file in place),
    drops index rows whose files no longer exist (dynamic partition
    overwrite / compaction removed them), and rewrites the index at
    ``index_path``. Bootstraps with a full :func:`file_stats_index`
    build when no index exists yet. The driver-side set work is
    O(file count) — the same order the planner pays for listing.

    Invariant (pytest-pinned): after any sequence of incremental
    updates the index equals a from-scratch rebuild, row for row.
    Returns the refreshed index DataFrame (read back from
    ``index_path``).
    """
    if not cols:
        raise ValueError("file_stats_index_update: need at least one column")
    try:
        old = spark.read.parquet(index_path)
        _ = old.columns
    except Exception:
        old = None
    if old is None:
        full = file_stats_index(spark, path, cols, fmt=fmt)
        full.write.mode("overwrite").parquet(index_path)
        return spark.read.parquet(index_path)
    current = _list_data_files(spark, path)
    cur_df = spark.createDataFrame([(f,) for f in current], "file string")
    if files is None:
        known = {r[0] for r in old.select("file").collect()}
        files = [f for f in current if f not in known]
    keep = old.join(cur_df, "file", "left_semi")
    if files:
        new_stats = _stats_over(spark.read.format(fmt).load(files), cols)
        fdf = spark.createDataFrame([(f,) for f in files], "file string")
        keep = keep.join(fdf, "file", "left_anti")
        merged = keep.unionByName(new_stats)
    else:
        merged = keep
    # materialize before overwriting the index the lineage reads from
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(index_path)
    return spark.read.parquet(index_path)


def skipping_scan(
    spark: SparkSession,
    index: DataFrame,
    ranges: dict[str, tuple] | None = None,
    not_null: list[str] | None = None,
    is_null: list[str] | None = None,
    fmt: str = "parquet",
) -> tuple[DataFrame, dict]:
    """Scan only the files whose stats can satisfy the conjunctive
    predicate, then re-apply the exact predicate.

    ``ranges`` maps column → ``(lo, hi)`` (inclusive; ``None`` leaves
    that side open). A file survives range pruning iff for EVERY column
    its stats interval overlaps the requested range; an all-null file
    (``min``/``max`` null) cannot satisfy a range predicate — range
    comparisons are null-rejecting — so it is skipped outright.
    ``not_null`` / ``is_null`` prune on the index's null counts: an
    all-null file cannot satisfy ``IS NOT NULL``, a null-free file
    cannot satisfy ``IS NULL`` — the null-partition lookup ("find the
    rows still missing enrichment") that range stats cannot express.
    The exact filter is applied on top of the pruned scan, so the
    result is identical to filtering the full table (pruning is a pure
    superset guarantee); tests pin that equality on both clustered and
    random layouts.

    The index collapse is driver-side but bounded by FILE COUNT, never
    rows — the same O(files) the planner already pays for listing.
    Returns ``(df, {"files_total": n, "files_kept": k})``.
    """
    if not ranges and not not_null and not is_null:
        raise ValueError("skipping_scan: need at least one predicate")
    keep = F.lit(True)
    exact = F.lit(True)
    for c, (lo, hi) in (ranges or {}).items():
        if lo is None and hi is None:
            raise ValueError(f"skipping_scan: ({c}) both bounds open")
        if lo is not None:
            keep = keep & (F.col(f"max_{c}") >= F.lit(lo))
            exact = exact & (F.col(c) >= F.lit(lo))
        if hi is not None:
            keep = keep & (F.col(f"min_{c}") <= F.lit(hi))
            exact = exact & (F.col(c) <= F.lit(hi))
    for c in not_null or []:
        keep = keep & (F.col(f"nulls_{c}") < F.col("n_rows"))
        exact = exact & F.col(c).isNotNull()
    for c in is_null or []:
        keep = keep & (F.col(f"nulls_{c}") > 0)
        exact = exact & F.col(c).isNull()
    files_total = index.count()
    if files_total == 0:
        raise ValueError("skipping_scan: empty index")
    kept = [r[0] for r in index.filter(keep).select("file").collect()]
    stats = {"files_total": files_total, "files_kept": len(kept)}
    if not kept:
        # preserve schema: empty frame from the (pruned-to-nothing) table
        sample = [r[0] for r in index.select("file").limit(1).collect()]
        empty = spark.read.format(fmt).load(sample).filter(F.lit(False))
        return empty.filter(exact), stats
    return spark.read.format(fmt).load(kept).filter(exact), stats
