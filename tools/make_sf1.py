"""Generate a 10x scale-up of /root/testdata/sf0.1 (-> ~sf1.0: 6M
lineitem rows) for the second measured scaling decade (SCALING.md
§10a0c). The driver only ships sf0.001/0.01/0.1; testdata is read-only,
so this TILES sf0.1 ten times into $OUT (default /tmp/sf1) with
consistent key offsets — referential integrity holds per tile
(customer/orders/lineitem/part/supplier key spaces offset together),
dimension tables (region, nation) stay fixed, and the scaling model is
"10x more entities, same per-entity history" (more users/orders/docs,
same time range and series lengths — how a production corpus grows).

Distribution hygiene, so scaling reads measure OPERATORS, not tiling
artifacts:
- document text per tile rotates vowels (length-, class- and
  word-boundary-preserving), so tiles are not exact/near duplicates of
  each other — within-tile dup/near-dup structure is preserved exactly,
  cross-tile MinHash/SimHash cliques (a pure tiling artifact that would
  blow pair counts quadratically) are not created;
- embeddings per tile are cyclically rotated (norm-preserving), so the
  ANN corpus grows 10x without 10 exact copies of every vector landing
  in the same LSH bucket;
- events offset user_id (10x users) and event_id; timestamps unchanged.

This is a PERFORMANCE fixture only — correctness stays pinned to the
driver's sf0.01 oracle data.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TILES = 10
VOWELS = "aeiou"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

    spark = get_spark(app_name="make_sf1")
    os.makedirs(out_dir, exist_ok=True)

    def tiled(name, build_tile, partitions):
        parts = [build_tile(load_table(spark, src, name), t) for t in range(TILES)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(partitions).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: wrote {TILES} tiles", flush=True)

    # dimensions: fixed size at any scale
    for name in ("region", "nation"):
        load_table(spark, src, name).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: copied", flush=True)

    def off(col, t, step):
        return (F.col(col) + F.lit(t * step)).alias(col)

    CUST, SUPP, PART, ORD, EV, DOC, VEC = (
        1_000_000, 100_000, 1_000_000, 10_000_000, 10_000_000, 1_000_000,
        1_000_000,
    )

    tiled(
        "customer",
        lambda d, t: d.select(
            off("c_custkey", t, CUST), "c_name", "c_nationkey",
            "c_acctbal", "c_mktsegment",
        ),
        8,
    )
    tiled(
        "supplier",
        lambda d, t: d.select(
            off("s_suppkey", t, SUPP), "s_name", "s_nationkey", "s_acctbal"
        ),
        4,
    )
    tiled(
        "part",
        lambda d, t: d.select(
            off("p_partkey", t, PART), "p_name", "p_brand", "p_type",
            "p_size", "p_retailprice",
        ),
        8,
    )
    tiled(
        "orders",
        lambda d, t: d.select(
            off("o_orderkey", t, ORD), off("o_custkey", t, CUST),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        16,
    )
    tiled(
        "lineitem",
        lambda d, t: d.select(
            off("l_orderkey", t, ORD), off("l_partkey", t, PART),
            off("l_suppkey", t, SUPP), "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        32,
    )
    tiled(
        "events",
        lambda d, t: d.select(
            off("event_id", t, EV), "ts", off("user_id", t, EV),
            "event_type", "value", "props",
        ),
        32,
    )

    def doc_tile(d, t):
        rot = VOWELS[t % 5 :] + VOWELS[: t % 5]
        text = F.translate("text", VOWELS + VOWELS.upper(), rot + rot.upper())
        return d.select(
            off("doc_id", t, DOC), text.alias("text"), "lang", "source",
            "n_chars",
        )

    tiled("documents", doc_tile, 16)

    def emb_tile(d, t):
        e = F.col("embedding")
        n = F.size(e)
        rolled = F.when(F.lit(t == 0), e).otherwise(
            F.concat(
                F.slice(e, F.lit(t + 1), n - F.lit(t)), F.slice(e, 1, t)
            )
        )
        return d.select(
            off("vec_id", t, VEC), rolled.alias("embedding"), "label"
        )

    tiled("embeddings", emb_tile, 8)
    print("done:", out_dir, flush=True)


if __name__ == "__main__":
    main()
