"""Incremental near-dup ingest (operators.ingest) — dedup arriving
batches against a persisted MinHash signature store.

The contract under test:

1. ORACLE: the kept set equals the sequential keep-first-arrival rule
   computed from the full-corpus candidate pairs (a doc is dropped iff
   it pairs at >= threshold with ANY earlier doc_id);
2. BATCHING INVARIANCE: 1 batch, 2 batches, or 5 batches over the same
   arrival order give the identical kept set (the property the
   all-seen store policy is chosen for);
3. retry idempotence: re-running a batch_id (the foreachBatch
   redelivery case) does not poison the store or change the output;
4. streaming: the same function behind ``foreachBatch`` over a file
   stream (one input file per micro-batch) lands the same kept set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.ingest import (
    incremental_ingest_sink,
    incremental_neardup_batch,
)
from amonaly_detection_in_time_series_data_spark.operators.similarity import (
    minhash_lsh_pairs,
    minhash_signatures,
)
from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

THRESHOLD = 0.7


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _oracle_kept(spark, docs) -> set:
    """Sequential keep-first oracle from the full-corpus pair list:
    dropped = every doc that pairs (>= threshold) with a smaller id."""
    sigs = minhash_signatures(docs)
    pairs = minhash_lsh_pairs(sigs).filter(
        F.col("jaccard_est") >= THRESHOLD
    )
    dropped = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    return all_ids - dropped


def _run_incremental(docs, splits, tmp_path, tag) -> set:
    """Feed ``docs`` in ``len(splits)`` consecutive doc_id ranges."""
    store = str(tmp_path / f"store_{tag}")
    kept: set = set()
    for i, (lo, hi) in enumerate(splits):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        novel = incremental_neardup_batch(
            batch, store, batch_id=i, threshold=THRESHOLD
        )
        kept |= {r["doc_id"] for r in novel.select("doc_id").collect()}
    return kept


class TestIncrementalIngest:
    def test_oracle_and_batching_invariance(self, spark, sf_dir, tmp_path):
        docs = _docs(spark, sf_dir)
        expect = _oracle_kept(spark, docs)
        n = docs.count()
        assert 0 < len(expect) < n  # the corpus actually has near-dups

        one = _run_incremental(docs, [(0, n)], tmp_path, "b1")
        two = _run_incremental(docs, [(0, n // 2), (n // 2, n)], tmp_path, "b2")
        five = _run_incremental(
            docs,
            [(i * n // 5, (i + 1) * n // 5) for i in range(5)],
            tmp_path,
            "b5",
        )
        assert one == expect
        assert two == expect
        assert five == expect

    def test_retry_idempotent(self, spark, sf_dir, tmp_path):
        docs = _docs(spark, sf_dir)
        store = str(tmp_path / "store_retry")
        b1 = docs.filter(F.col("doc_id") < 250)
        b2 = docs.filter(F.col("doc_id") >= 250)
        incremental_neardup_batch(b1, store, 0, threshold=THRESHOLD).count()
        first = {
            r["doc_id"]
            for r in incremental_neardup_batch(
                b2, store, 1, threshold=THRESHOLD
            ).collect()
        }
        # redelivery: same batch_id, store already holds its partition
        retry = {
            r["doc_id"]
            for r in incremental_neardup_batch(
                b2, store, 1, threshold=THRESHOLD
            ).collect()
        }
        assert retry == first

    def test_unshingleable_docs_pass_through(self, spark, tmp_path):
        store = str(tmp_path / "store_short")
        batch = spark.createDataFrame(
            [(1, "tiny"), (2, "tiny"), (3, "one two")],
            "doc_id bigint, text string",
        )
        novel = incremental_neardup_batch(
            batch, store, 0, threshold=THRESHOLD
        )
        # no 3-shingles -> no signature -> all bypass dedup
        assert novel.count() == 3

    def test_kept_only_store_keeps_chain_tail(self, spark, tmp_path):
        # Chain A~B, B~C, A!~C with exact shingle-set Jaccards built
        # from distinct numbered tokens: A=w1..w22, B=w1..w32,
        # C=w11..w32 gives J(A,B)=J(B,C)=20/30≈0.67, J(A,C)=10/30≈0.33.
        # At threshold 0.5 the policies diverge exactly as documented:
        # all-seen stores dropped B, so C (similar only to B) is
        # dropped too; kept-only never stored B, so C survives.
        w = lambda lo, hi: " ".join(f"w{i}" for i in range(lo, hi))
        batches = [(1, w(1, 23)), (2, w(1, 33)), (3, w(11, 33))]
        got = {}
        for policy in ("all-seen", "kept-only"):
            store = str(tmp_path / f"store_{policy}")
            kept = set()
            for i, row in enumerate(batches):
                novel = incremental_neardup_batch(
                    spark.createDataFrame(
                        [row], "doc_id bigint, text string"
                    ),
                    store,
                    i,
                    threshold=0.5,
                    n_hashes=128,
                    n_bands=32,
                    store_policy=policy,
                )
                kept |= {r["doc_id"] for r in novel.collect()}
            got[policy] = kept
        assert got["all-seen"] == {1}
        assert got["kept-only"] == {1, 3}

    def test_store_compaction_preserves_dedup(self, spark, sf_dir, tmp_path):
        """The documented maintenance loop: after N batches the
        batch_id-partitioned store fragments; compact_files rewrites it
        and ingest keeps working with identical results (signatures are
        content, not layout)."""
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            compact_files,
            data_file_stats,
        )

        docs = _docs(spark, sf_dir)
        n = docs.count()
        splits = [(i * n // 4, (i + 1) * n // 4) for i in range(4)]

        # reference: uncompacted store all the way
        plain = _run_incremental(docs, splits, tmp_path, "nc")

        store = str(tmp_path / "store_c")
        kept: set = set()
        for i, (lo, hi) in enumerate(splits):
            if i == 2:
                # compact ONE partition directory (the per-partition
                # usage the module documents) and swap it in place —
                # the store's batch_id layout is preserved
                import shutil

                part = f"{store}/batch_id=0"
                before = data_file_stats(spark, part)
                assert before["n_files"] >= 1
                swap = str(tmp_path / "part_swap")
                st = compact_files(
                    spark, part, swap, target_file_mb=64, sort_by=["doc_id"]
                )
                assert st["out_files"] <= st["in_files"]
                shutil.rmtree(part)
                shutil.move(swap, part)
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            novel = incremental_neardup_batch(
                batch, store, batch_id=i, threshold=THRESHOLD
            )
            kept |= {r["doc_id"] for r in novel.select("doc_id").collect()}
        assert kept == plain

    def test_store_scheme_mismatch_raises(self, spark, tmp_path):
        # r10 (ADVICE): r9 changed the xxhash64 signature VALUES; a
        # store written under another scheme must refuse loudly, not
        # silently match nothing.
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
        )
        store = str(tmp_path / "vstore")
        incremental_neardup_batch(docs, store, 0, n_hashes=8)
        # same scheme: fine
        incremental_neardup_batch(docs, store, 1, n_hashes=8)
        # different n_hashes -> different signature values -> refuse
        with pytest.raises(ValueError, match="scheme"):
            incremental_neardup_batch(docs, store, 2, n_hashes=16)
        # different hash family -> refuse
        with pytest.raises(ValueError, match="scheme"):
            incremental_neardup_batch(docs, store, 2, n_hashes=8,
                                      hash_fn="md5")

    def test_legacy_unversioned_store_rejected(self, spark, tmp_path):
        # a store written by pre-r10 code has no sig_scheme column; its
        # signatures are not comparable with the current family
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
        )
        store = str(tmp_path / "legacy")
        (
            minhash_signatures(docs, n_hashes=8)
            .withColumn("batch_id", F.lit(0))
            .write.partitionBy("batch_id")
            .parquet(store)
        )
        with pytest.raises(ValueError, match="rebuild"):
            incremental_neardup_batch(docs, store, 1, n_hashes=8)

    def test_streaming_foreach_batch(self, spark, sf_dir, tmp_path):
        docs = _docs(spark, sf_dir)
        expect = _oracle_kept(spark, docs)
        n = docs.count()

        src = tmp_path / "stream_src"
        for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
            (
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(str(src / f"part{i}"))
            )
        store = str(tmp_path / "stream_store")
        out = str(tmp_path / "stream_out")
        ckpt = str(tmp_path / "stream_ckpt")

        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "part*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                incremental_ingest_sink(store, out, threshold=THRESHOLD)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            r["doc_id"]
            for r in spark.read.parquet(out).select("doc_id").collect()
        }
        assert got == expect


class TestEndToEndCorpusStream:
    def test_stream_composition_matches_batch_pipeline(
        self, spark, sf_dir, tmp_path
    ):
        """The deployment shape, composed: file-stream replay ->
        quality_rules filter -> incremental near-dup ingest (persisted
        signature store) -> CDC merge into a partitioned live table —
        all inside ONE foreachBatch sink. The final table must equal
        the same pipeline run as a single batch (batching invariance of
        the store + idempotent last-writer-wins merge), row-for-row
        over every column."""
        from amonaly_detection_in_time_series_data_spark.operators.cdc import (
            merge_changes,
        )
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            quality_rules,
        )

        docs = _docs(spark, sf_dir)
        n = docs.count()
        src = tmp_path / "e2e_src"
        cuts = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
        for i, (lo, hi) in enumerate(cuts):
            (
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(str(src / f"part{i}"))
            )

        def pipeline_sink(store_path: str, table_path: str):
            def apply(df, batch_id):
                good = (
                    quality_rules(df, "text")
                    .filter(F.col("keep") == 1)
                    .select("doc_id", "text")
                )
                novel = incremental_neardup_batch(
                    good, store_path, batch_id, threshold=THRESHOLD
                )
                # seq = doc_id (each doc upserts once, so the merge's
                # last-writer-wins key is stable across batchings)
                changes = novel.select(
                    "doc_id",
                    "text",
                    F.col("doc_id").alias("seq"),
                    (F.col("doc_id") % 4).alias("part"),
                )
                if changes.isEmpty():
                    return
                merge_changes(
                    spark, table_path, changes, ["doc_id"], "seq",
                    partition_col="part",
                )

            return apply

        # streaming run: one file per micro-batch
        s_store = str(tmp_path / "e2e_store_s")
        s_table = str(tmp_path / "e2e_table_s")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "part*"))
        )
        q = (
            stream.writeStream.foreachBatch(pipeline_sink(s_store, s_table))
            .option("checkpointLocation", str(tmp_path / "e2e_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # batch run: the identical composition, one batch
        b_store = str(tmp_path / "e2e_store_b")
        b_table = str(tmp_path / "e2e_table_b")
        pipeline_sink(b_store, b_table)(docs, 0)

        # merge_changes strips the seq column (merge metadata, not data)
        cols = ["doc_id", "text", "part"]
        got = [
            tuple(r)
            for r in spark.read.parquet(s_table)
            .select(cols).orderBy("doc_id").collect()
        ]
        want = [
            tuple(r)
            for r in spark.read.parquet(b_table)
            .select(cols).orderBy("doc_id").collect()
        ]
        assert len(got) > 0
        assert got == want
