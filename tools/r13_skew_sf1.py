"""The §16 adversarial skew sweep at SCALE (r13): the same planted
mega-groups as tests/test_skew_caps.py, but embedded in the sf1
fixtures (6M lineitem rows / 50k clean docs) with 10^4-member floods,
run at the DEFAULT driver heap — "bounded under skew" proven where the
blowup would actually hurt, not on 120-row toys.

Per operator: plant the flood, run the CAPPED plan, and record
(a) wall, (b) the excluded-table contents (the loud channel),
(c) the worst SURVIVING group population (must be <= cap — the bound
    on any pair/verify task's per-group input), and
(d) an exactness check vs the clean-data run where the flood is
    separable by construction (vocab-disjoint floods).

Uncapped floods are NOT run at this scale on purpose — C(10^4, 2) =
5*10^7 pairs from ONE key per operator is the blowup the caps exist
to delete; §16's toy tier already pins capped == brute force.

Usage: python tools/r13_skew_sf1.py [sf_dir [docs_dir]]
(defaults /tmp/sf1 and /tmp/sf1b; see tools/make_sf1.py / make_sf10.py)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLOOD = 10_000
CAP = 1_000


def main() -> None:
    from pyspark.sql import functions as F

    from amonaly_detection_in_time_series_data_spark.operators.product_analytics import (
        basket_rules,
    )
    from amonaly_detection_in_time_series_data_spark.operators.relational import (
        band_join,
        salted_agg,
    )
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        embedding_neardup_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
        prefix_jaccard_join,
    )
    from amonaly_detection_in_time_series_data_spark.session import get_spark
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    docs_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1b"
    spark = get_spark(app_name="r13_skew_sf1")

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        print(f"{label}: {time.monotonic() - t0:.2f}s {out}", flush=True)
        return out

    # --- basket_rules: one 10^4-item bot basket in 6M lineitem rows ---
    def basket():
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
        )
        flood = spark.range(FLOOD).select(
            F.lit(-1).alias("bk"), (F.col("id") + 10**9).alias("it")
        )
        rules, excluded = basket_rules(
            li.unionByName(flood), "bk", "it", 2,
            max_basket_size=CAP, return_excluded=True,
        )
        n = rules.count()
        ex = excluded.collect()
        clean = basket_rules(li, "bk", "it", 2).count()
        # worst surviving basket size
        worst = (
            li.unionByName(flood).distinct()
            .groupBy("bk").count()
            .filter(F.col("count") <= CAP)
            .agg(F.max("count")).collect()[0][0]
        )
        return (
            f"rules={n} ==clean={clean == n} "
            f"excluded={[(r['basket'], r['basket_size']) for r in ex]} "
            f"worst_surviving_basket={worst}"
        )

    # --- band_join: 10^4 right rows in one eps-bucket ---
    def band():
        li = load_table(spark, sf_dir, "lineitem")
        l = li.select(F.col("l_orderkey").alias("lid"),
                      F.col("l_extendedprice").alias("lv")).limit(200_000)
        r_real = li.select(F.col("l_partkey").alias("rid"),
                           F.col("l_extendedprice").alias("rv"))
        flood = spark.range(FLOOD).select(
            (F.col("id") + 2 * 10**9).alias("rid"),
            F.lit(-77777.77).alias("rv"),  # negative: disjoint from data
        )
        pairs, excluded = band_join(
            l, r_real.unionByName(flood), "lv", "rv", 0.05, scale=100,
            left_keep=["lid"], right_keep=["rid"],
            max_band_size=CAP, return_excluded=True,
        )
        n = pairs.count()
        ex = excluded.collect()
        clean = band_join(
            l, r_real, "lv", "rv", 0.05, scale=100,
            left_keep=["lid"], right_keep=["rid"], max_band_size=CAP,
        ).count()
        return (
            f"pairs={n} ==clean={clean == n} "
            f"excluded={[(r['band_bucket'], r['band_size']) for r in ex]}"
        )

    # --- minhash LSH: 10^4 identical vocab-disjoint docs in 50k real ---
    def minhash():
        docs = load_table(spark, docs_dir, "documents").select(
            "doc_id", "text"
        )
        flood = spark.range(FLOOD).select(
            (F.col("id") + 10**9).alias("doc_id"),
            F.lit("zqx wvk jpf zqx wvk jpf zqx wvk jpf").alias("text"),
        )
        sigs = minhash_signatures(
            docs.unionByName(flood), "text", "doc_id",
            n_hashes=16, shingle_n=3,
        )
        capped = minhash_lsh_pairs(sigs, n_bands=4, max_bucket_size=CAP)
        n = capped.count()
        n_flood = capped.filter(
            (F.col("id_a") >= 10**9) | (F.col("id_b") >= 10**9)
        ).count()
        clean_sigs = minhash_signatures(
            docs, "text", "doc_id", n_hashes=16, shingle_n=3
        )
        clean = minhash_lsh_pairs(
            clean_sigs, n_bands=4, max_bucket_size=CAP
        ).count()
        return f"pairs={n} flood_pairs={n_flood} ==clean={clean == n}"

    # --- embedding LSH: 10^4 identical-direction vectors ---
    def embedding():
        emb = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id"), F.col("embedding")
        )
        dim = len(emb.select("embedding").first()["embedding"])
        flood = spark.range(FLOOD).select(
            (F.col("id") + 10**9).alias("vec_id"),
            F.array(*[F.lit(0.0)] * dim).alias("embedding"),
        )
        capped = embedding_neardup_pairs(
            emb.unionByName(flood), dim=dim, n_planes=8,
            threshold=0.95, max_bucket_size=CAP,
        )
        n = capped.count()
        n_flood = capped.filter(
            (F.col("id_a") >= 10**9) | (F.col("id_b") >= 10**9)
        ).count()
        return f"pairs={n} flood_pairs={n_flood}"

    # --- ppjoin: 10^4 tiny docs sharing ONE vocab-disjoint gram ---
    def ppjoin():
        docs = load_table(spark, docs_dir, "documents").select(
            "doc_id", "text"
        )
        flood = spark.range(FLOOD).select(
            (F.col("id") + 10**9).alias("doc_id"),
            F.lit("zqx wvk jpf").alias("text"),
        )
        pairs, excluded = prefix_jaccard_join(
            docs.unionByName(flood), "text", "doc_id", 1, 2, pin=False,
            max_gram_df=CAP, return_excluded=True,
        )
        n = pairs.filter(
            (F.col("id_a") < 10**9) & (F.col("id_b") < 10**9)
        ).count()
        ex = excluded.collect()
        clean = prefix_jaccard_join(
            docs, "text", "doc_id", 1, 2, pin=False
        ).count()
        return (
            f"real_pairs={n} ==clean={clean == n} "
            f"excluded={[(r['gram'], r['df']) for r in ex]}"
        )

    # --- salted_agg: one user owning 10^5 of 1M event rows ---
    def salted():
        ev = load_table(spark, sf_dir, "events").select(
            F.col("user_id").alias("k"), F.col("event_id").alias("rid"),
            F.col("value").alias("v"),
        )
        flood = spark.range(FLOOD * 10).select(
            F.lit(-1).alias("k"), (F.col("id") + 10**9).alias("rid"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        out = salted_agg(ev.unionByName(flood), ["k"], "v", "rid", 16)
        n = out.count()
        hot = out.filter(F.col("k") == -1).collect()[0]
        exp_sum = float(sum(i % 7 for i in range(FLOOD * 10)))
        return (
            f"groups={n} hot_exact={hot['v_sum'] == exp_sum and hot['v_count'] == FLOOD * 10}"
        )

    for label, fn in [
        ("basket_rules  (mega-basket 10^4, cap 10^3)", basket),
        ("band_join     (mega-band 10^4, cap 10^3)", band),
        ("minhash_lsh   (mega-bucket 10^4, cap 10^3)", minhash),
        ("embedding_lsh (mega-bucket 10^4, cap 10^3)", embedding),
        ("ppjoin        (gram df 10^4, cap 10^3)", ppjoin),
        ("salted_agg    (hot key 10^5 rows, 16 salts)", salted),
    ]:
        timed(label, fn)


if __name__ == "__main__":
    main()
