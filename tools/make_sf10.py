"""Generate the THIRD-decade scale fixture (~sf10: 60M lineitem / 10M
events / 500k documents) for SCALING.md §10a0d by tiling
/root/testdata/sf0.1 one hundred times into $OUT (default /tmp/sf10).

Only the tables the §10a0d operator set reads are produced (events,
lineitem, documents, orders) — the full headline at sf10 is out of
scope by design (the r11 verdict scoped the third decade to the five
steepest operators).

Distribution hygiene, continuing tools/make_sf1.py's argument: tiles
must not be exact/near duplicates of each other or cross-tile
dup-pair cliques (a pure tiling artifact) would blow the similarity
operators' pair counts quadratically. make_sf1's vowel rotation has
only 5 classes — at 100 tiles every rotation class would hold 20
EXACT copies of each document. Here each tile rotates vowels (t mod 5)
AND consonants (t mod 21) independently: 105 distinct classes, so all
100 tiles are pairwise distinct and within-tile dup/near-dup structure
is preserved exactly (length-, case-, word-boundary- and
char-class-preserving). Keys offset per tile exactly like make_sf1
(10x-more-entities scaling model; referential integrity holds per
tile for orders->lineitem).

This is a PERFORMANCE fixture only — correctness stays pinned to the
driver's sf0.01 oracle data.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TILES = 100
VOWELS = "aeiou"
CONS = "bcdfghjklmnpqrstvwxyz"


def main() -> None:
    """argv: [out_dir] [tiles] [tables_csv]. tiles=10 + tables=documents
    regenerates an ARTIFACT-FREE sf1-scale documents table (/tmp/sf1b):
    make_sf1's vowel-only rotation has 5 classes over 10 tiles, so tile
    pairs {0,5},{1,6},... hold EXACT cross-tile duplicates — fine for
    row-count scaling, but it dominates similarity-operator pair counts
    (measured: ppjoin emits 30,120 pairs on /tmp/sf1 docs vs 25,600
    organic pairs on 100 artifact-free tiles). The 105-class rotation
    here keeps ANY tile count <= 100 pairwise distinct."""
    global TILES
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    if len(sys.argv) > 2:
        TILES = int(sys.argv[2])
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    src = "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

    spark = get_spark(app_name="make_sf10")
    os.makedirs(out_dir, exist_ok=True)

    def tiled(name, build_tile, partitions):
        if only is not None and name not in only:
            return
        parts = [build_tile(load_table(spark, src, name), t) for t in range(TILES)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(partitions).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: wrote {TILES} tiles", flush=True)

    def off(col, t, step):
        return (F.col(col) + F.lit(t * step)).alias(col)

    CUST, SUPP, PART, ORD, EV, DOC = (
        1_000_000, 100_000, 1_000_000, 10_000_000, 10_000_000, 1_000_000,
    )

    tiled(
        "orders",
        lambda d, t: d.select(
            off("o_orderkey", t, ORD), off("o_custkey", t, CUST),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        32,
    )
    tiled(
        "lineitem",
        lambda d, t: d.select(
            off("l_orderkey", t, ORD), off("l_partkey", t, PART),
            off("l_suppkey", t, SUPP), "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        64,
    )
    tiled(
        "events",
        lambda d, t: d.select(
            off("event_id", t, EV), "ts", off("user_id", t, EV),
            "event_type", "value", "props",
        ),
        64,
    )

    def doc_tile(d, t):
        rot_v = VOWELS[t % 5:] + VOWELS[: t % 5]
        rot_c = CONS[t % 21:] + CONS[: t % 21]
        frm = VOWELS + CONS
        to = rot_v + rot_c
        text = F.translate("text", frm + frm.upper(), to + to.upper())
        return d.select(
            off("doc_id", t, DOC), text.alias("text"), "lang", "source",
            "n_chars",
        )

    tiled("documents", doc_tile, 32)
    print("done ->", out_dir, flush=True)


if __name__ == "__main__":
    main()
