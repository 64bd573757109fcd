"""Count-Min sketch (Cormode & Muthukrishnan 2005) as pure Catalyst
aggregates — the mergeable frequency sketch that answers "how often did
item x occur" in fixed space.

Why it earns a slot next to HLL/t-digest/GK in the sketch tier: exact
token/URL/entity counts over a 100 TB corpus shuffle one row per
DISTINCT item (the vocabulary can be billions of rows); the CM sketch's
build is ONE ``groupBy(seed, bucket)`` aggregate with map-side partials
whose output is capped at ``depth * width`` rows NO MATTER the input —
and two sketches merge by cell-wise addition (union + re-aggregate), so
per-day sketches roll up to per-month for free.

Everything is expression-level: the seeded bucket hash reuses the
engine-portable md5 family (:func:`..operators.similarity._seeded_hash64`
md5 mode — 60-bit positive, so ``%`` and ``pmod`` agree), which makes
both the SKETCH CELLS and the point estimates bit-reproducible in any
engine with a standard md5 — the sketch is oracle-checkable, unlike the
engine-specific HLL/t-digest internals. ``hash_fn="xxhash64"`` is the
fast engine-native path.

Estimate contract (the textbook guarantee): ``cm_est >= true_count``
always (counters only over-count via collisions), and
``cm_est <= true_count + eps * N`` with probability ``1 - delta`` for
``width = ceil(e / eps)``, ``depth = ceil(ln(1 / delta))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _seeded_hash64

__all__ = ["cm_bucket", "cm_sketch", "cm_estimate", "cm_merge"]


def cm_bucket(col: Column | str, seed: int, width: int, hash_fn: str = "md5") -> Column:
    """Bucket index of one hash row: ``hash_seed(value) mod width``.
    The md5 family is non-negative by construction (60-bit), so plain
    ``%`` is portable; pmod guards the xxhash64 path's negatives."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(_seeded_hash64(c, seed, hash_fn), F.lit(width)).cast("int")


def cm_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    hash_fn: str = "md5",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one row per non-empty cell —
    ``(seed, bucket, cnt)``. One aggregate, output <= depth * width
    rows; empty cells are implicit zeros (estimate coalesces them).

    ``weight_col``: build from pre-aggregated ``(value, weight)`` rows
    (each row contributes ``weight`` to its cells) — identical cells to
    the raw stream, but the (depth x) hash work runs once per DISTINCT
    value instead of once per occurrence. Use it whenever a count
    table already exists on the lineage (measured 3x on the
    token_counts query, where md5 of every token occurrence x 4 seeds
    dominated); the raw mode stays the one-pass streaming shape.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"cm_sketch: bad dims depth={depth} width={width}")
    w = F.lit(1).cast("bigint") if weight_col is None else F.col(weight_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seed"),
                        cm_bucket(col, i, width, hash_fn).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("__w"),
    )
    return cells.groupBy("c.seed", "c.bucket").agg(
        F.sum("__w").cast("bigint").alias("cnt")
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width, hash_fn):
    cell-wise addition — union + one aggregate."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cm_estimate(
    items: DataFrame,
    sketch: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    hash_fn: str = "md5",
    est_col: str = "cm_est",
) -> DataFrame:
    """Point-query each row of ``items``: ``est_col`` = min over the
    ``depth`` hash rows of that item's cell count (0 for empty cells).

    The sketch is depth*width rows — BROADCAST side of ONE join: each
    item explodes into its ``depth`` (seed, bucket) probe rows, joins
    the sketch once, and min-aggregates back to the item grain (the
    r9 first cut chained depth sequential broadcast joins, which
    re-planned the sketch lineage per seed — measured ~3x slower).
    Items frames keep their own partitioning (at 100 TB you estimate a
    candidate list, never the raw stream); duplicate item ROWS collapse
    in the re-aggregation — pass distinct candidates.
    """
    probes = items.select(
        *items.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seed"),
                        cm_bucket(col, i, width, hash_fn).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__p"),
    )
    joined = probes.join(
        F.broadcast(sketch),
        (probes["__p.seed"] == sketch["seed"])
        & (probes["__p.bucket"] == sketch["bucket"]),
        "left",
    )
    return joined.groupBy(*[items[c] for c in items.columns]).agg(
        F.min(F.coalesce(sketch["cnt"], F.lit(0))).cast("bigint").alias(est_col)
    )
