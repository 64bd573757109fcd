"""r14 A/B: hash-keyed vs string-keyed ppjoin candidate equi-join over
a WARM sf10 ordered-tokens artifact.

The r14 change keys the inverted-index candidate join on the
PRE-COMPUTED 64-bit gram hashes (posexplode over sliced ``toks_h``)
instead of gram strings: the candidate shuffle ships fixed 8-byte
longs, sort-merges on long keys, and the prefix scan prunes the
string column entirely. Found at the fourth decade, where the
string-keyed candidate shuffle at 2M docs out-spilled the box's disk
(SCALING §10a0f). This measures what it buys at the third decade
(500k docs) where both arms fit.

The string-keyed arm replicates the pre-r14 tail INSIDE this tool
(production code carries only the hash-keyed shape — the old shape is
a measurement control, not a knob worth carrying): same prefix
length, same size band, same positional bound, same two-stage
hash-screen + string-verify back half; the ONLY difference is the
candidate join key.

Protocol: SCALING §10a0c/§10a0e — one session, artifact warm, both
arms warmed, then INTERLEAVED rep-pairs of (wall − JVM-GC) via
df.count(); identical pair counts asserted; nothing else running on
the box (§11 + the r14 concurrent-pytest lesson).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r14_hashkey_ab.py \
    [work_dir p q reps]   (defaults /tmp/r14_ppjoin 1 2 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def string_keyed_pairs(ordered, p: int, q: int):
    """The pre-r14 `_ppjoin_tail` shape: candidate equi-join keyed on
    gram STRINGS (positional=True, no cap, two-stage screen+verify).
    Kept here verbatim as the A/B control."""
    from pyspark.sql import functions as F

    plen = (
        F.col("sz")
        - F.floor((F.lit(p) * F.col("sz") + F.lit(q - 1)) / F.lit(q))
        + F.lit(1)
    ).cast("int")
    prefix = ordered.select(
        "id",
        "sz",
        F.posexplode(F.slice("toks", F.lit(1), plen)).alias("pos0", "gram"),
    ).select("id", "sz", (F.col("pos0") + 1).alias("pos"), "gram")
    a = prefix.select(
        F.col("id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
        "gram",
    )
    b = prefix.select(
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
        "gram",
    )
    cand = a.join(b, "gram").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("sz_a") * q >= F.col("sz_b") * p)
        & (F.col("sz_b") * q >= F.col("sz_a") * p)
    )
    alpha = F.floor(
        (F.lit(p) * (F.col("sz_a") + F.col("sz_b")) + F.lit(p + q - 1))
        / F.lit(p + q)
    )
    ubound = (
        F.least(F.col("pos_a"), F.col("pos_b"))
        - 1
        + 1
        + F.least(
            F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")
        )
    )
    cand_ids = cand.filter(ubound >= alpha).select("id_a", "id_b").distinct()
    h_a = ordered.select(
        F.col("id").alias("id_a"),
        F.col("toks_h").alias("h_a"),
        F.col("sz").alias("hsz_a"),
    )
    h_b = ordered.select(
        F.col("id").alias("id_b"),
        F.col("toks_h").alias("h_b"),
        F.col("sz").alias("hsz_b"),
    )
    screened = (
        cand_ids.join(h_a, "id_a")
        .join(h_b, "id_b")
        .filter(
            F.size(F.array_intersect("h_a", "h_b")) * (p + q)
            >= F.lit(p) * (F.col("hsz_a") + F.col("hsz_b"))
        )
        .select("id_a", "id_b")
    )
    g_a = ordered.select(
        F.col("id").alias("id_a"),
        F.col("toks").alias("g_a"),
        F.col("sz").alias("size_a"),
    )
    g_b = ordered.select(
        F.col("id").alias("id_b"),
        F.col("toks").alias("g_b"),
        F.col("sz").alias("size_b"),
    )
    return (
        screened.join(g_a, "id_a")
        .join(g_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("g_a", "g_b")))
        .filter(
            F.col("inter") * (p + q)
            >= F.lit(p) * (F.col("size_a") + F.col("size_b"))
        )
        .select("id_a", "id_b")
    )


def main() -> None:
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        prefix_jaccard_join_indexed,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r14_ppjoin"
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    tpath = f"{work}/tokens"
    spark = get_spark(app_name="r14_hashkey_ab")

    def jvm_gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total, it = 0, beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    def timed(df):
        g0, t0 = jvm_gc_ms(), time.monotonic()
        n = df.count()
        return time.monotonic() - t0 - (jvm_gc_ms() - g0) / 1000.0, n

    ordered = (
        spark.read.parquet(tpath).select("id", "sz", "toks", "toks_h")
    )
    arms = {
        "hash": lambda: prefix_jaccard_join_indexed(spark, tpath, p, q),
        "string": lambda: string_keyed_pairs(ordered, p, q),
    }
    counts: dict[str, int] = {}
    for name, mk in arms.items():
        w, n = timed(mk())
        counts[name] = n
        print(f"warm {name}: {w:.2f} s (pairs {n})", flush=True)
    assert counts["hash"] == counts["string"], counts

    walls: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(reps):
        for name, mk in arms.items():
            w, n = timed(mk())
            assert n == counts[name], (name, n, counts[name])
            walls[name].append(w)
            print(f"rep {r} {name}: {w:.2f} s", flush=True)
    for name in arms:
        print(
            f"{name}: median {statistics.median(walls[name]):.2f} s  all "
            f"{[round(w, 2) for w in walls[name]]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
