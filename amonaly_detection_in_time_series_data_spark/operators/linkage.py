"""Entity resolution: blocked fuzzy string matching (record linkage).

The classic pipeline need the exact/near-dup tiers don't cover: the SAME
entity spelled differently across sources ("goldenrod lavendr spring"
vs "goldenrod lavender spring"). An unblocked fuzzy join is a cartesian
product — O(|A|·|B|) edit-distance evaluations kills at any scale. The
standard answer is BLOCKING: a cheap deterministic key (here a
lowercased prefix) that any plausible match must share, so candidates
come from one equi-join shuffle on the block key and the expensive
``levenshtein`` only runs inside blocks.

Design for 100 TB:
- candidate generation is ONE hash-partitioned equi-join (never a cross
  join — plan-asserted in tests); block-key cardinality bounds the
  triangle exactly like the LSH bucket tiers, and a degenerate block
  (everything named "unknown") is the same mega-bucket hazard —
  ``max_block_size`` drops oversized blocks, mirroring
  ``minhash_lsh_pairs``'s cap;
- scoring is the built-in JVM ``levenshtein`` (codegen, no Python);
- best-match selection is the usual per-left-row ranking window.

Prefix blocking trades recall for portability (an edit inside the
prefix escapes the block — exactly the single-table LSH trade; run R
block functions and union for recall, e.g. prefix + reversed-suffix).
``levenshtein`` and ``substr`` are ANSI-portable, so the whole operator
is oracle-checkable bit-for-bit — no other fuzzy metric in Spark
(soundex) has a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_join"]


def default_block(col: Column, prefix_len: int = 3) -> Column:
    return F.lower(F.substring(col, 1, prefix_len))


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_edit: int = 2,
    block: Column | None = None,
    prefix_len: int = 3,
    best_per_left: bool = True,
    left_keep: list[str] | None = None,
    right_keep: list[str] | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Fuzzy-match ``left[left_col]`` against ``right[right_col]``
    within shared blocks; keep pairs with ``levenshtein <= max_edit``.

    Returns the kept columns of both sides plus ``edit_dist`` (and
    ``match_rank`` when ``best_per_left`` — rank 1 = lowest distance,
    ties broken by the right value then its first kept column, so the
    result is deterministic).
    """
    lkeep = left_keep if left_keep is not None else left.columns
    rkeep = right_keep if right_keep is not None else right.columns

    def blk(c: str) -> Column:
        return block if block is not None else default_block(F.col(c), prefix_len)

    l = left.select(
        *[F.col(c).alias(f"l_{c}") for c in lkeep],
        F.col(left_col).alias("__lv"),
        blk(left_col).alias("__block"),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in rkeep],
        F.col(right_col).alias("__rv"),
        blk(right_col).alias("__block"),
    )
    if max_block_size is not None:
        ok = (
            r.groupBy("__block")
            .count()
            .filter(F.col("count") <= max_block_size)
            .select("__block")
        )
        r = r.join(F.broadcast(ok), "__block", "left_semi")
    # two cheap prunes before the expensive distance: a length gap
    # > max_edit can't match (integer compare), and the THRESHOLDED
    # levenshtein (Spark 3.5+) early-exits at max_edit+1 — O(k*len)
    # per pair instead of O(len^2); both matter enormously inside
    # populous blocks (measured 46 s -> ~4 s on a low-cardinality-name
    # catalog at 20k rows)
    cand = (
        l.join(r, "__block")
        .filter(
            F.abs(F.length("__lv") - F.length("__rv")) <= F.lit(max_edit)
        )
        .withColumn(
            "edit_dist", F.levenshtein("__lv", "__rv", threshold=max_edit)
        )
    )
    kept = cand.filter(
        (F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_edit)
    )
    if not best_per_left:
        return kept.drop("__block")
    order = [F.col("edit_dist").asc(), F.col("__rv").asc()] + (
        [F.col(f"r_{rkeep[0]}").asc()] if rkeep else []
    )
    w = Window.partitionBy("__lv", *[f"l_{c}" for c in lkeep]).orderBy(*order)
    return (
        kept.withColumn("match_rank", F.row_number().over(w))
        .drop("__block")
    )
