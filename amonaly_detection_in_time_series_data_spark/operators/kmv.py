"""KMV (k-minimum-values) theta sketches — persistable distinct-count
sketches that support UNION **and INTERSECTION** estimates.

The sketch of a value set is simply the ``k`` smallest distinct 64-bit
hash values, kept sorted (Bar-Yossef et al. 2002; Beyer et al., SIGMOD
2007, "On Synopses for Distinct-Value Estimation" — the unbiased
(k-1)/u_k estimator and the set-operation estimators used here; the
same construction DataSketches ships as the Theta sketch). What it adds
over the HLL tier (:mod:`~.hll`):

- **Set EXPRESSIONS.** HLL merges only by union; a KMV sketch of
  ``A ∪ B`` is literally the k smallest of the two sketches' hashes,
  and because every sketch samples the SAME hash permutation, the
  fraction of the union sketch present in both inputs is an unbiased
  Jaccard estimate — intersection and difference sizes follow. "How
  many users did both of these days/sources see?" needs no rescans.
- **Engine portability.** The sketch is a sorted ``array<bigint>`` and
  every estimate is plain arithmetic on it — with the ``md5`` hash
  family the whole tier replays bit-for-bit in DuckDB (the same
  convention as the CMS/MinHash md5 paths), which HLL's opaque
  register blobs cannot do.
- **Exactness below k.** A group with fewer than ``k`` distinct values
  stores all of them: the estimate is the exact count.

Scale shape: the build is one ``distinct`` on (key, hash) — map-side
partial aggregation shrinks the shuffle to distinct hashes — then a
rank-``k`` filter that Spark pushes into partial aggregation as
WindowGroupLimit (``spark.sql.window.group.limit.threshold``, plan-
asserted in tests), so no task ever buffers more than ~k rows per key.
Rollup re-selects the k smallest across constituent sketches, which by
the min-wise property is EXACTLY the sketch of the merged base — the
same loss-free summary-table contract as ``hll_rollup``, pinned by
array equality in tests. Set-operation estimates are O(k^2) per pair
of tiny arrays — never touch the base table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_build",
    "kmv_rollup",
    "kmv_estimate",
    "kmv_union",
    "kmv_jaccard_estimate",
    "kmv_intersect_estimate",
    "kmv_difference_estimate",
]

# (k-1)/u_k needs u uniform in (0,1]; the divisor depends on the hash
# family's range: xxhash64 is a full signed 64-bit value, the md5 path
# keeps 15 hex digits = 60 bits (the repo's engine-portable family —
# DuckDB replays CAST('0x' || substr(md5(..), 1, 15) AS BIGINT)).
_U_DIV = {"xxhash64": 2.0**64, "md5": 2.0**60}
_U_OFF = {"xxhash64": 2.0**63 + 1.0, "md5": 1.0}


def _kmv_hash(col: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("bigint")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def kmv_build(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    k: int = 256,
    hash_fn: str = "xxhash64",
    sketch_col: str = "kmv",
) -> DataFrame:
    """One sketch per key group: ``(key_cols..., sketch_col
    array<bigint>)`` — the sorted ``k`` smallest distinct hashes of
    ``value_col``. NULL values are ignored (a NULL is not a value)."""
    if k < 2:
        raise ValueError(f"kmv_build: k must be >= 2, got {k}")
    keys = list(key_cols)
    h = _kmv_hash(F.col(value_col), hash_fn)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__h").asc())
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__h")).alias(sketch_col))
    )


def kmv_rollup(
    sketches: DataFrame,
    key_cols: Sequence[str],
    k: int,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Merge persisted sketches up to a coarser key. By the min-wise
    property this equals :func:`kmv_build` over the merged base EXACTLY
    (the k smallest of unions of per-part k-smallest sets are the k
    smallest of the union), so daily → monthly → overall rollups
    compose losslessly — the base is never rescanned."""
    keys = list(key_cols)
    ex = (
        sketches.select(*keys, F.explode(sketch_col).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__h").asc())
    return (
        ex.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__h")).alias(sketch_col))
    )


def _u(kth: Column, hash_fn: str) -> Column:
    return (kth.cast("double") + _U_OFF[hash_fn]) / _U_DIV[hash_fn]


def kmv_estimate(
    sketch: Column | str, k: int, hash_fn: str = "xxhash64"
) -> Column:
    """Distinct-count estimate: exact ``size`` when the group had fewer
    than ``k`` distinct values (the sketch holds all of them), else the
    unbiased ``(k-1)/u_k`` with ``u_k`` the k-th smallest hash mapped
    to (0,1]. Relative standard error ~ 1/sqrt(k-2)."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.when(
        F.size(s) < int(k), F.size(s).cast("double")
    ).otherwise((int(k) - 1) / _u(F.element_at(s, int(k)), hash_fn))


def kmv_union(a: Column | str, b: Column | str, k: int) -> Column:
    """The sketch of ``A ∪ B``: k smallest distinct hashes across both
    sketches — exactly what building over the concatenated bases would
    produce (min-wise property). Pure Catalyst array expression."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(ca, cb))), 1, int(k)
    )


def kmv_jaccard_estimate(
    a: Column | str, b: Column | str, k: int
) -> Column:
    """Unbiased Jaccard estimate (Beyer et al. 2007): the fraction of
    the union sketch's values present in BOTH input sketches. All
    sketches sample the same hash permutation, so membership tests are
    exact array lookups — no probabilistic containment."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    u = kmv_union(ca, cb, k)
    both = F.size(
        F.filter(
            u,
            lambda x: F.array_contains(ca, x) & F.array_contains(cb, x),
        )
    )
    # two EMPTY sketches (both groups had zero non-null values) have an
    # empty union: J(∅, ∅) = 0 by convention, not NULL from 0/0. A NULL
    # sketch (missing group) still propagates NULL — absence of a
    # sketch is not an empty set.
    return F.when(F.size(u) == 0, F.lit(0.0)).otherwise(
        both / F.size(u).cast("double")
    )


def kmv_intersect_estimate(
    a: Column | str, b: Column | str, k: int, hash_fn: str = "xxhash64"
) -> Column:
    """|A ∩ B| estimate = Jaccard_est(A,B) x |A ∪ B|_est — the standard
    KMV set-expression composition HLL cannot answer."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    u = kmv_union(ca, cb, k)
    return kmv_jaccard_estimate(ca, cb, k) * kmv_estimate(u, k, hash_fn)


def kmv_difference_estimate(
    a: Column | str, b: Column | str, k: int, hash_fn: str = "xxhash64"
) -> Column:
    """|A \\ B| estimate: the fraction of the union sketch present in
    ``a`` but NOT ``b``, times the union estimate — same sampled-
    permutation argument as the intersection estimator (subtracting two
    independent estimates instead would compound their errors; scoring
    every set expression against the ONE union sample keeps them
    consistent: inter + diff(a,b) + diff(b,a) = union by construction).
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    u = kmv_union(ca, cb, k)
    only_a = F.size(
        F.filter(
            u,
            lambda x: F.array_contains(ca, x) & ~F.array_contains(cb, x),
        )
    )
    # empty-union guard: |∅ \ ∅| = 0.0, not NULL (see kmv_jaccard_estimate)
    return F.when(F.size(u) == 0, F.lit(0.0)).otherwise(
        (only_a / F.size(u).cast("double")) * kmv_estimate(u, k, hash_fn)
    )
