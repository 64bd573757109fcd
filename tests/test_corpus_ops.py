"""Unit tests for the training-data pipeline (corpus) operators:
deterministic splits, stratified quotas, quality rules, decontamination,
packing, and TF-IDF. Small in-memory fixtures assert exact semantics;
oracle value parity runs separately via tools/parity.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.corpus import (
    decontaminate,
    hash_split,
    pack_chunks,
    quality_rules,
    stratified_sample,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "a completely different sentence with many unique words here", "en"),
        (3, "spam spam spam spam spam spam spam spam spam spam", "en"),
        (4, "der schnelle braune fuchs springt gern", "de"),
        (5, "ein ganz anderer satz mit anderen worten", "de"),
        (6, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


class TestHashSplit:
    def test_deterministic_and_partition_invariant(self, docs):
        a = hash_split(docs, "doc_id").select("doc_id", "bucket", "split")
        b = hash_split(docs.repartition(5), "doc_id").select(
            "doc_id", "bucket", "split"
        )
        assert sorted(a.collect()) == sorted(b.collect())

    def test_thresholds(self, docs):
        out = hash_split(docs, "doc_id").collect()
        for r in out:
            expected = (
                "train" if r.bucket < 80 else "val" if r.bucket < 90 else "test"
            )
            assert r.split == expected

    def test_bad_weights_rejected(self, docs):
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(docs, "doc_id", weights={"train": 0.5, "test": 0.4})


class TestStratifiedSample:
    def test_quota_exact_per_stratum(self, docs):
        out = stratified_sample(docs, ["lang"], "doc_id", 0.5)
        kept = out.groupBy("lang").agg(
            F.sum("strat_keep").alias("k"), F.count("*").alias("n")
        )
        for r in kept.collect():
            assert r.k == math.ceil(0.5 * r.n)

    def test_per_stratum_fraction_dict(self, docs):
        out = stratified_sample(
            docs, ["lang"], "doc_id", {"en": 0.25, "de": 1.0}
        )
        kept = {r.lang: r.k for r in out.groupBy("lang").agg(
            F.sum("strat_keep").alias("k")).collect()}
        assert kept["de"] == 2  # 100% of the 2 de docs
        assert kept["en"] == 1  # ceil(0.25 * 4)

    def test_deterministic_selection(self, docs):
        a = stratified_sample(docs, ["lang"], "doc_id", 0.5).collect()
        b = stratified_sample(docs.repartition(7), ["lang"], "doc_id", 0.5).collect()
        assert {(r.doc_id, r.strat_keep) for r in a} == {
            (r.doc_id, r.strat_keep) for r in b
        }


class TestQualityRules:
    def test_repetition_flagged(self, docs):
        out = {r.doc_id: r for r in quality_rules(docs, min_tokens=5).collect()}
        # doc 3 is one token repeated 10x: top_token_frac = 1.0,
        # dup_bigram_frac = 1 - 1/9
        assert out[3].top_token_frac == 1.0
        assert out[3].dup_bigram_frac == round(1 - 1 / 9, 4)
        assert out[3].keep == 0
        # doc 2 is all-unique words: no repetition, keeps
        assert out[2].top_token_frac == round(1 / 9, 4)
        assert out[2].dup_bigram_frac == 0.0
        assert out[2].keep == 1

    def test_symbol_ratio_flagged(self, docs):
        out = {r.doc_id: r for r in quality_rules(docs, min_tokens=5).collect()}
        assert out[6].symbol_ratio > 0.5
        assert out[6].keep == 0

    def test_alpha_and_bullet_rules(self, spark):
        rows = [
            (1, "normal prose with plenty of ordinary words here today"),
            (2, "1 2 3 4 5 6 7 8 9 10 11 12"),  # zero alpha words
            (3, "- one\n- two\n- three\n- four\n- five\n* six\nprose line"),
            (4, "first row here\nsecond group now\n- single bullet"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r for r in quality_rules(df, min_tokens=5).collect()}
        assert out[1].alpha_word_frac == 1.0
        assert out[1].bullet_line_frac == 0.0
        assert out[1].keep == 1
        assert out[2].alpha_word_frac == 0.0
        assert out[2].keep == 0  # Gopher 80%-alpha rule trips
        assert out[3].bullet_line_frac == round(6 / 7, 4)
        assert out[4].bullet_line_frac == round(1 / 3, 4)
        assert out[4].keep == 1

    def test_token_bounds(self, docs):
        out = {r.doc_id: r for r in quality_rules(docs, min_tokens=8).collect()}
        assert out[4].n_tokens == 6
        assert out[4].keep == 0  # below min_tokens

    def test_pathological_repeated_tokens_fast(self, spark):
        # 50k tokens, 40k of one word: the sort+longest-run form is
        # O(n log n); the old distinct x count-filter form was
        # O(distinct x tokens) (~4e8 comparisons here) and stalled.
        import time

        text = " ".join(["boiler"] * 40_000 + [f"w{i}" for i in range(10_000)])
        big = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        t0 = time.monotonic()
        row = quality_rules(big).collect()[0]
        elapsed = time.monotonic() - t0
        assert row.n_tokens == 50_000
        assert row.top_token_frac == round(40_000 / 50_000, 4)
        assert row.keep == 0  # repetition rule trips
        assert elapsed < 30, f"quality_rules took {elapsed:.1f}s on 50k tokens"

    def test_alpha_frac_regex_matches_per_token_form(self, spark, sf_dir):
        # r10 replaced size(filter(toks, rlike('[a-z]'))) with one
        # regexp_count('\S*[a-z]\S*') pass over the lowercased document
        # (one Matcher per doc instead of per token). The two must agree
        # on every real document and on the whitespace/casing edges.
        from amonaly_detection_in_time_series_data_spark.functions.text import (
            tokenize,
        )
        from amonaly_detection_in_time_series_data_spark.sources.readers import (
            load_table,
        )

        edge = spark.createDataFrame(
            [
                (9001, "MIXED Case AND 123 42a a42 --- ..."),
                (9002, "  \t tabs\tand\nnewlines  x1  11  "),
                (9003, "éé çç 日本語 naïve"),  # non-ascii letters
                (9004, ""),
                (9005, "!!! ??? ### 12.5 1e9"),
            ],
            ["doc_id", "text"],
        )
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .unionByName(edge)
        )
        both = docs.select(
            "doc_id",
            F.size(
                F.filter(tokenize("text"), lambda t: t.rlike("[a-z]"))
            ).alias("per_token"),
            F.regexp_count(
                F.lower(F.col("text")), F.lit(r"\S*[a-z]\S*")
            ).alias("one_pass"),
        )
        bad = both.filter(F.col("per_token") != F.col("one_pass")).collect()
        assert bad == [], f"alpha-word count diverged: {bad[:5]}"

    def test_top_token_frac_matches_naive(self, spark):
        # longest-equal-run-after-sort == max multiplicity, incl. ties
        # and the single/empty-token edges
        rows = [
            (1, "a b a c a b"),      # a:3 of 6
            (2, "x"),                # 1 of 1
            (3, ""),                 # empty -> null frac
            (4, "t t s s"),          # tie 2 of 4
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r for r in quality_rules(df).collect()}
        assert out[1].top_token_frac == 0.5
        assert out[2].top_token_frac == 1.0
        assert out[3].top_token_frac is None
        assert out[4].top_token_frac == 0.5


class TestDecontaminate:
    def test_overlap_detected_and_counted(self, spark):
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
        )
        corpus = spark.createDataFrame(
            [
                (1, "prefix alpha beta gamma delta suffix"),  # shares 4-gram
                (2, "totally clean document with other words"),
                (3, "alpha beta gamma delta epsilon zeta"),  # shares two 4-grams
            ],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: r
            for r in decontaminate(corpus, bench, shingle_n=4).collect()
        }
        assert out[1].contaminated == 1 and out[1].n_hit_grams == 1
        assert out[2].contaminated == 0 and out[2].n_hit_grams == 0
        assert out[3].contaminated == 1 and out[3].n_hit_grams == 2

    def test_short_benchmark_docs_yield_no_grams(self, spark):
        bench = spark.createDataFrame([(100, "too short")], ["doc_id", "text"])
        corpus = spark.createDataFrame([(1, "too short as well ok")], ["doc_id", "text"])
        out = decontaminate(corpus, bench, shingle_n=4).collect()
        assert out[0].contaminated == 0

    def test_bloom_no_false_negatives_and_fpp_envelope(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            bloom_build,
            bloom_might_contain,
        )

        members = spark.createDataFrame(
            [(f"member_{i}",) for i in range(500)], "v string"
        )
        bloom = bloom_build(members, "v", fpp=0.01)
        # every inserted value MUST pass (no false negatives, ever)
        hits = members.filter(bloom_might_contain(bloom, F.col("v"))).count()
        assert hits == 500
        # non-members pass at ~fpp (generous envelope: 5x the target)
        others = spark.createDataFrame(
            [(f"other_{i}",) for i in range(5000)], "v string"
        )
        fp = others.filter(bloom_might_contain(bloom, F.col("v"))).count()
        assert fp <= 5000 * 0.05, f"{fp} false positives of 5000"

    def test_bloom_prefilter_exact_and_plan(self, spark):
        """bloom_fpp pre-prunes map-side but composed results stay
        EXACT (the confirm join removes false positives); the bloom
        predicate must sit in a Filter below the gram join."""
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
        )
        corpus = spark.createDataFrame(
            [
                (1, "prefix alpha beta gamma delta suffix"),
                (2, "totally clean document with other words"),
                (3, "alpha beta gamma delta epsilon zeta"),
            ],
            ["doc_id", "text"],
        )
        plain = {
            (r.doc_id, r.n_hit_grams, r.contaminated)
            for r in decontaminate(corpus, bench, shingle_n=4).collect()
        }
        bloomed_df = decontaminate(
            corpus, bench, shingle_n=4, bloom_fpp=0.01
        )
        bloomed = {
            (r.doc_id, r.n_hit_grams, r.contaminated)
            for r in bloomed_df.collect()
        }
        assert bloomed == plain
        plan = bloomed_df._jdf.queryExecution().executedPlan().toString()
        assert "getbit" in plan, plan[:3000]
        # the probe is a Filter on the corpus-gram side, not post-join:
        # getbit must appear BELOW (after, in toString order) the join
        assert plan.index("getbit") > plan.index("BroadcastHashJoin"), (
            plan[:3000]
        )


class TestPackChunks:
    def test_running_offsets_and_chunks(self, spark):
        rows = [(i, "w " * 10, "en") for i in range(1, 7)]  # 10 tokens each
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        out = {
            r.doc_id: r
            for r in pack_chunks(df, ["lang"], ["doc_id"], budget=25).collect()
        }
        assert [out[i].tokens_before for i in range(1, 7)] == [0, 10, 20, 30, 40, 50]
        assert [out[i].chunk_id for i in range(1, 7)] == [0, 0, 0, 1, 1, 2]

    def test_partitioned_by_key(self, docs):
        out = pack_chunks(docs, ["lang"], ["doc_id"], budget=10)
        firsts = (
            out.groupBy("lang").agg(F.min("tokens_before").alias("m")).collect()
        )
        assert all(r.m == 0 for r in firsts)  # each key restarts the stream


class TestChunkTextOverlap:
    def test_window_geometry_overlap_and_edges(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            chunk_text_overlap,
        )

        tokens = [f"t{i}" for i in range(25)]
        rows = [
            (1, " ".join(tokens)),   # 25 tokens: windows at 0,8,16
            # (a start at 24 would add no token beyond window 2 -> none)
            (2, "a b c"),            # shorter than one window
            (3, ""),                 # empty -> no chunks
            (4, " ".join(tokens[:8])),  # exactly one stride -> 1 chunk
            (5, "x y"),              # n_tokens == overlap -> still 1 chunk
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = chunk_text_overlap(df, "text", "doc_id", size=10, overlap=2)
        got = {
            (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_n_tokens)
            for r in out.collect()
        }
        assert got == {
            (1, 0): (0, 10), (1, 1): (8, 10), (1, 2): (16, 9),
            (2, 0): (0, 3),
            (4, 0): (0, 8),
            (5, 0): (0, 2),
        }
        # consecutive full windows share exactly `overlap` tokens:
        # window 0 = t0..t9, window 1 = t8..t17 -> overlap {t8, t9}
        import hashlib

        h = {r.chunk_idx: r.chunk_hash for r in out.filter("doc_id = 1").collect()}
        exp0 = hashlib.md5(" ".join(tokens[0:10]).encode()).hexdigest()
        exp1 = hashlib.md5(" ".join(tokens[8:18]).encode()).hexdigest()
        exp2 = hashlib.md5(" ".join(tokens[16:25]).encode()).hexdigest()
        assert h == {0: exp0, 1: exp1, 2: exp2}

        with pytest.raises(ValueError, match="overlap"):
            chunk_text_overlap(df, size=10, overlap=10)

    def test_map_only_plan(self, spark):
        """The chunker must ride the scan: no Exchange anywhere."""
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            chunk_text_overlap,
        )

        df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        plan = (
            chunk_text_overlap(df, "text", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestTfIdf:
    def test_scores_match_formula(self, spark):
        df = spark.createDataFrame(
            [
                (1, "apple banana apple"),
                (2, "banana cherry"),
                (3, "cherry durian cherry durian"),
            ],
            ["doc_id", "text"],
        )
        out = tfidf_top_terms(df, k=10).collect()
        n_docs = 3
        by_key = {(r.doc_id, r.term): r for r in out}
        # apple: tf=2 in doc 1, df=1
        r = by_key[(1, "apple")]
        assert r.tf == 2 and r.df == 1
        assert r.score == round(2 * (math.log((1 + n_docs) / (1 + 1)) + 1), 6)
        # banana appears in 2 docs
        assert by_key[(1, "banana")].df == 2
        # rank 1 in doc 1 is apple (highest score)
        assert min((r.rank, r.term) for r in out if r.doc_id == 1)[1] == "apple"

    def test_k_limits_rows(self, docs):
        out = tfidf_top_terms(docs, k=2)
        counts = out.groupBy("doc_id").count().collect()
        assert all(r["count"] <= 2 for r in counts)


class TestLongDocLadder:
    def test_longdoc_growth_is_linear_not_quadratic(self, spark, sf_dir):
        """Scale ladder pin: quality_rules + minhash_signatures over
        200k-token boilerplate docs must cost at most ~2x the linear
        prediction from the 50k rung (ratio < 8 for a 4x token
        increase). The r4 per-doc quadratic measured ~59x per doubling
        at this size — any reintroduction fails immediately. Absolute
        floor also pinned: the 200k rung under 60 s."""
        import time

        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            make_longdoc_corpus,
        )
        from amonaly_detection_in_time_series_data_spark.operators.similarity import (
            minhash_signatures,
        )
        from amonaly_detection_in_time_series_data_spark.sources.readers import (
            load_table,
        )

        docs = load_table(spark, sf_dir, "documents")

        def rung(tokens: int) -> float:
            ld = make_longdoc_corpus(docs, 8, tokens).select(
                "doc_id", "text"
            ).localCheckpoint()
            t0 = time.monotonic()
            assert quality_rules(ld, "text").count() == 8
            assert minhash_signatures(
                ld, "text", "doc_id", n_hashes=8, shingle_n=3
            ).count() == 8
            return time.monotonic() - t0

        t50 = rung(50_000)
        t200 = rung(200_000)
        assert t200 < 60, f"200k-token rung took {t200:.1f}s"
        assert t200 / t50 < 8, (
            f"superlinear growth: 50k={t50:.1f}s 200k={t200:.1f}s "
            f"(ratio {t200 / t50:.1f}, linear would be ~4)"
        )


class TestUnigramLogprob:
    def test_matches_hand_computed_model(self, spark):
        """4-token corpus 'a a a b': p(a)=3/4, p(b)=1/4; doc scores are
        plain averages of ln(p). Zero-token doc -> NULL score."""
        import math

        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            unigram_logprob,
        )

        rows = [(1, "a a a"), (2, "b"), (3, "a b"), (4, "")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r.unigram_logprob for r in unigram_logprob(df).collect()}
        # corpus tokens: a x4, b x2, total 6 -> p(a)=2/3, p(b)=1/3
        la, lb = math.log(4 / 6), math.log(2 / 6)
        assert out[1] == pytest.approx(round(la, 6), abs=1e-9)
        assert out[2] == pytest.approx(round(lb, 6), abs=1e-9)
        assert out[3] == pytest.approx(round((la + lb) / 2, 6), abs=1e-9)
        assert out[4] is None

    def test_external_vocab_reference_distribution(self, spark):
        """A provided (token, cnt) vocab is the 100 TB path — scores use
        the reference distribution, not the scored corpus's own; tokens
        absent from the vocab drop out of the average (inner join)."""
        import math

        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            unigram_logprob,
        )

        docs = spark.createDataFrame([(1, "x y zzz")], ["doc_id", "text"])
        vocab = spark.createDataFrame(
            [("x", 9), ("y", 1)], ["tok", "cnt"]
        )
        out = unigram_logprob(docs, vocab_df=vocab).collect()[0]
        want = (math.log(9 / 10) + math.log(1 / 10)) / 2  # zzz OOV, dropped
        assert out.unigram_logprob == pytest.approx(round(want, 6), abs=1e-9)


class TestPplBucket:
    def _scored(self, spark, n=30):
        # distinct scores 0..-29 so terciles are unambiguous
        rows = [(i, float(-i)) for i in range(n)] + [(n, None)]
        return spark.createDataFrame(rows, "doc_id bigint, unigram_logprob double")

    def test_exact_terciles(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            ppl_bucket,
        )

        out = {r.doc_id: r.ppl_bucket for r in ppl_bucket(self._scored(spark)).collect()}
        # highest scores (least negative) -> head
        assert all(out[i] == "head" for i in range(10))
        assert all(out[i] == "middle" for i in range(10, 20))
        assert all(out[i] == "tail" for i in range(20, 30))
        assert out[30] is None  # NULL score -> NULL bucket

    def test_approx_agrees_on_separable_scores(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            ppl_bucket,
        )

        df = self._scored(spark, n=300)
        exact = {r.doc_id: r.ppl_bucket for r in ppl_bucket(df, exact=True).collect()}
        approx = {r.doc_id: r.ppl_bucket for r in ppl_bucket(df, exact=False).collect()}
        # sketch cutoffs may shift the boundary by a few ranks; on 300
        # well-separated scores, the disagreement set must be tiny
        diff = sum(1 for k in exact if exact[k] != approx[k])
        assert diff <= 6
        assert approx[300] is None

    def test_n_buckets_labels_and_validation(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            ppl_bucket,
        )

        out = {
            r.doc_id: r.ppl_bucket
            for r in ppl_bucket(self._scored(spark, 4), n_buckets=2).collect()
        }
        assert out[0] == "b1" and out[3] == "b2"
        with pytest.raises(ValueError):
            ppl_bucket(self._scored(spark, 4), n_buckets=1)


class TestWinnowing:
    def test_selection_matches_python_and_match_guarantee(self, spark):
        """winnow_select == a from-scratch Python winnowing on the same
        rolling hashes, and the SWA guarantee holds: two documents
        sharing a substring of length >= w+k-1 (= 11 chars at k=8, w=4)
        share at least one selected fingerprint."""
        from amonaly_detection_in_time_series_data_spark.functions.text import (
            rolling_hash_grams,
            winnow_select,
        )

        shared = "the quick brown fox jumps"
        rows = [
            (1, "AAAA " + shared + " BBBB"),
            (2, "xyzzy 123 " + shared + " qqqq"),
            (3, "completely different content here"),
            (4, "tiny"),  # < k chars -> no grams -> empty selection
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        d = df.withColumn("__rh", rolling_hash_grams(F.col("text"), k=8))
        out = {
            r["doc_id"]: (list(r["__rh"]), list(r["sel"]))
            for r in d.withColumn("sel", winnow_select(F.col("__rh"), w=4)).collect()
        }

        def py_winnow(hs, w=4):
            if not hs:
                return []
            if len(hs) < w:
                wins = [min(hs)]
            else:
                wins = [min(hs[i : i + w]) for i in range(len(hs) - w + 1)]
            seen, sel = set(), []
            for v in wins:
                if v not in seen:
                    seen.add(v)
                    sel.append(v)
            return sel

        def py_hashes(text, k=8, base=257, mod=2147483647):
            out = []
            for i in range(max(len(text) - k + 1, 0)):
                acc = 0
                for ch in text[i : i + k]:
                    acc = (acc * base + ord(ch)) % mod
                out.append(acc)
            return out

        for doc_id, (hs, sel) in out.items():
            text = dict(rows)[doc_id]
            assert hs == py_hashes(text), doc_id
            assert sel == py_winnow(hs), doc_id
        assert out[4][1] == []
        # match guarantee across the shared 25-char substring
        assert set(out[1][1]) & set(out[2][1]), "no shared fingerprint"
        # and the unrelated doc shares nothing with doc 1
        assert not set(out[1][1]) & set(out[3][1])


class TestSpanDedup:
    """operators.dedup span-granular substring dedup (Lee et al. 2021
    approximation) vs a from-scratch Python oracle."""

    ROWS = [
        (1, "a b c d e f"),
        (2, "a b c d x y z"),   # first two spans dup doc1; tail "z"
        (3, "q"),               # shorter than one span
        (4, ""),                # empty
        (5, "a b a b a b"),     # pure self-repetition
    ]

    @staticmethod
    def _py_spans(rows, span_len):
        """Python oracle: global keep-first over (doc_id, span_idx)."""
        occ = []
        for doc_id, text in sorted(rows):
            toks = text.lower().split()
            for s in range(len(toks) // span_len):
                occ.append(
                    (doc_id, s, " ".join(toks[s * span_len : (s + 1) * span_len]))
                )
        seen, out = set(), []
        for doc_id, s, span in occ:
            dup = span in seen
            seen.add(span)
            out.append((doc_id, s, span, int(dup)))
        return out

    def test_occurrences_vs_python_oracle(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.dedup import span_occurrences

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = sorted(
            tuple(r)
            for r in span_occurrences(df, span_len=2)
            .select("doc_id", "span_idx", "span", "is_dup")
            .collect()
        )
        assert got == self._py_spans(self.ROWS, 2)

    def test_stats_and_reconstruction(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.dedup import (
            drop_dup_spans,
            span_dedup_stats,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        stats = {
            r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_frac"])
            for r in span_dedup_stats(df, span_len=2).collect()
        }
        # docs with no complete span produce no stats row
        assert set(stats) == {1, 2, 5}
        assert stats[1] == (3, 0, 0.0)
        assert stats[2] == (3, 2, 0.6667)
        assert stats[5] == (3, 3, 1.0)

        text = {
            r["doc_id"]: r["text"]
            for r in drop_dup_spans(df, span_len=2).collect()
        }
        assert text == {1: "a b c d e f", 2: "x y z", 3: "q", 4: "", 5: ""}

    def test_random_corpus_vs_python_oracle(self, spark):
        import random

        rng = random.Random(6)
        vocab = ["t%d" % i for i in range(7)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
            for i in range(40)
        ]
        from amonaly_detection_in_time_series_data_spark.operators.dedup import (
            drop_dup_spans,
            span_occurrences,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        for span_len in (1, 3, 5):
            got = sorted(
                tuple(r)
                for r in span_occurrences(df, span_len=span_len)
                .select("doc_id", "span_idx", "span", "is_dup")
                .collect()
            )
            assert got == self._py_spans(rows, span_len), span_len

        # reconstruction oracle at span_len=3: kept spans + tail
        oracle = {}
        per_doc = {}
        for doc_id, s, span, dup in self._py_spans(rows, 3):
            per_doc.setdefault(doc_id, []).append((s, span, dup))
        for doc_id, text in rows:
            toks = text.lower().split()
            kept = [sp for _, sp, dup in sorted(per_doc.get(doc_id, [])) if not dup]
            tail = toks[(len(toks) // 3) * 3 :]
            oracle[doc_id] = " ".join((" ".join(kept) + " " + " ".join(tail)).split())
        got = {
            r["doc_id"]: r["text"]
            for r in drop_dup_spans(df, span_len=3).collect()
        }
        assert got == oracle

    def test_hash64_key_stats_match_text_key(self, spark, sf_dir):
        # span_dedup_stats defaults to 64-bit span-hash keys (r9: no
        # span-string allocation). Differential: identical stats to the
        # exact string-keyed replay on a real corpus with injected dups.
        from amonaly_detection_in_time_series_data_spark.operators.dedup import (
            span_dedup_stats,
        )
        from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        dup = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
        d = docs.unionByName(dup)
        fast = {
            tuple(r)
            for r in span_dedup_stats(d, span_len=8, key="hash64").collect()
        }
        exact = {
            tuple(r)
            for r in span_dedup_stats(d, span_len=8, key="text").collect()
        }
        assert fast == exact and len(fast) > 0


class TestMixtureResample:
    def _df(self, spark):
        rows = [(i, "d%d" % (i % 4)) for i in range(100)]  # 25 per domain
        return spark.createDataFrame(rows, "doc_id long, domain string")

    def test_quotas_match_target_mixture(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import mixture_resample

        out = mixture_resample(
            self._df(spark), "domain", "doc_id",
            {"d0": 0.4, "d1": 0.3, "d2": 0.2, "d3": 0.1},
        ).collect()
        quotas = {}
        kept = {}
        for r in out:
            quotas[r["domain"]] = r["mix_quota"]
            kept[r["domain"]] = kept.get(r["domain"], 0) + r["mix_keep"]
        # S = min(floor(25/w)) = floor(25/0.4) = 62 -> quotas floor(w*62)
        assert quotas == {"d0": 24, "d1": 18, "d2": 12, "d3": 6}
        assert kept == quotas  # exactly quota rows kept per domain
        # kept mixture tracks the target within integer rounding
        total = sum(kept.values())
        assert abs(kept["d0"] / total - 0.4) < 0.02

    def test_unlisted_domain_drops_and_weights_normalize(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import mixture_resample

        # weights given as ratios (sum 3), d3 unlisted -> quota 0
        out = mixture_resample(
            self._df(spark), "domain", "doc_id", {"d0": 2, "d1": 1}
        ).collect()
        quotas = {r["domain"]: r["mix_quota"] for r in out}
        # S = min(floor(25/(2/3)), floor(25/(1/3))) = min(37, 75) = 37
        assert quotas == {"d0": 24, "d1": 12, "d2": 0, "d3": 0}
        assert all(r["mix_keep"] == 0 for r in out if r["domain"] in ("d2", "d3"))

    def test_selection_is_stable_under_repartition(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import mixture_resample

        df = self._df(spark)
        w = {"d0": 0.5, "d1": 0.5}
        a = {(r["doc_id"], r["mix_keep"])
             for r in mixture_resample(df, "domain", "doc_id", w).collect()}
        b = {(r["doc_id"], r["mix_keep"])
             for r in mixture_resample(df.repartition(7), "domain", "doc_id", w).collect()}
        assert a == b

    def test_bad_weights_raise(self, spark):
        import pytest as _pytest
        from amonaly_detection_in_time_series_data_spark.operators.corpus import mixture_resample

        df = self._df(spark)
        with _pytest.raises(ValueError):
            mixture_resample(df, "domain", "doc_id", {})
        with _pytest.raises(ValueError):
            mixture_resample(df, "domain", "doc_id", {"d0": -1, "d1": 2})
        with _pytest.raises(ValueError):
            mixture_resample(df, "domain", "doc_id", {"d0": 0.0})


class TestPiiRedaction:
    CASES = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk today",
         {"email": 1, "url": 0, "ipv4": 0, "phone": 0},
         "mail me at <EMAIL> today"),
        (2, "server 192.168.0.1 and 10.20.30.40 are up",
         {"email": 0, "url": 0, "ipv4": 2, "phone": 0},
         "server <IPV4> and <IPV4> are up"),
        (3, "call +1 555-867-5309 now",
         {"email": 0, "url": 0, "ipv4": 0, "phone": 1},
         "call <PHONE> now"),
        (4, "see https://example.com/a?b=1#frag for docs",
         {"email": 0, "url": 1, "ipv4": 0, "phone": 0},
         "see <URL> for docs"),
        (5, "a@b.io via http://x.dev/1 ip 8.8.8.8 tel 020 7946 0958",
         {"email": 1, "url": 1, "ipv4": 1, "phone": 1},
         "<EMAIL> via <URL> ip <IPV4> tel <PHONE>"),
        (6, "no pii here at all", {"email": 0, "url": 0, "ipv4": 0, "phone": 0},
         "no pii here at all"),
    ]

    def test_counts_and_redaction(self, spark):
        from pyspark.sql import functions as F
        from amonaly_detection_in_time_series_data_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame(
            [(i, t) for i, t, _, _ in self.CASES], "id long, text string"
        )
        out = {
            r["id"]: r
            for r in df.select(
                "id", *pii_counts("text"), redact_pii("text").alias("red")
            ).collect()
        }
        for i, _, counts, redacted in self.CASES:
            r = out[i]
            got = {k: r[f"n_{k}"] for k in counts}
            assert got == counts, (i, got)
            assert r["red"] == redacted, (i, r["red"])

    def test_redaction_is_map_only(self, spark):
        from amonaly_detection_in_time_series_data_spark.functions.text import redact_pii

        df = spark.range(10).selectExpr("CAST(id AS STRING) AS text")
        plan = (
            df.select(redact_pii("text"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestEmptyInputs:
    """Stateless corpus/text operators must pass an EMPTY frame through
    as zero rows (the S2 empty-table contract extends to the pipeline);
    fit operators must refuse with a clear ValueError instead of an
    opaque numpy/MLlib stack."""

    def _empty_docs(self, spark):
        return spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string"
        )

    def test_stateless_ops_pass_through(self, spark):
        from pyspark.sql import functions as F
        from amonaly_detection_in_time_series_data_spark.functions.text import (
            pii_counts,
            redact_pii,
        )
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            hash_split,
            mixture_resample,
            quality_rules,
        )
        from amonaly_detection_in_time_series_data_spark.operators.dedup import (
            drop_dup_spans,
            span_dedup_stats,
        )

        e = self._empty_docs(spark)
        assert quality_rules(e, "text").count() == 0
        assert hash_split(e, "doc_id").count() == 0
        assert span_dedup_stats(e, "text", "doc_id").count() == 0
        assert drop_dup_spans(e, "text", "doc_id").count() == 0
        assert e.select(*pii_counts("text"), redact_pii("text")).count() == 0
        assert (
            mixture_resample(e, "source", "doc_id", {"src0": 1.0}).count() == 0
        )

    def test_graph_ops_on_empty_edges(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame([], "id_a long, id_b long")
        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        out = {
            r["node"]: r["component"]
            for r in connected_components(
                edges, nodes=nodes, node_col="id"
            ).collect()
        }
        assert out == {1: 1, 2: 2}  # all singletons
        assert connected_components(edges).count() == 0

    def test_fit_ops_raise_cleanly(self, spark):
        import pytest as _pytest
        from amonaly_detection_in_time_series_data_spark.operators.classifier import (
            fit_text_lr,
        )
        from amonaly_detection_in_time_series_data_spark.operators.pq import pq_train

        e = self._empty_docs(spark)
        with _pytest.raises(ValueError, match="empty"):
            fit_text_lr(e.withColumn("keep", F.lit(1)), "text", "keep")
        emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with _pytest.raises(ValueError, match="empty"):
            pq_train(emb, "embedding")


class TestFuzzyDecontaminate:
    def test_near_matches_flag_and_unrelated_pass(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            fuzzy_decontaminate,
        )

        bench = spark.createDataFrame(
            [(100, "the capital of france is paris and the capital of spain is madrid")],
            ["doc_id", "text"],
        )
        corpus = spark.createDataFrame(
            [
                # light paraphrase: one word swapped -> high jaccard
                (1, "the capital of france is paris and the capital of spain is barcelona"),
                # verbatim copy
                (2, "the capital of france is paris and the capital of spain is madrid"),
                # unrelated
                (3, "completely different content about distributed query engines"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in fuzzy_decontaminate(
                corpus, bench, min_jaccard_est=0.5
            ).collect()
        }
        assert out[2]["fuzzy_contaminated"] == 1
        assert out[2]["fuzzy_max_est"] == 1.0
        assert out[1]["fuzzy_contaminated"] == 1, out[1]
        assert out[3]["fuzzy_contaminated"] == 0
        assert out[3]["fuzzy_max_est"] == 0.0

    def test_every_corpus_doc_gets_a_row(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            fuzzy_decontaminate,
        )

        bench = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
        corpus = spark.createDataFrame(
            [(1, "x y z w v u t"), (2, "")], ["doc_id", "text"]
        )
        out = fuzzy_decontaminate(corpus, bench).collect()
        # empty-text doc has no shingles/signature but still reports 0
        assert {r["doc_id"]: r["fuzzy_contaminated"] for r in out} == {1: 0, 2: 0}


class TestCorpusPipelineEndToEnd:
    def test_full_training_data_pipeline_composes(self, spark, sf_dir):
        """The whole training-data pipeline in ONE composition — the
        order a real corpus build runs: scrub -> quality filter ->
        exact dedup -> span-dedup screen -> decontaminate (exact+fuzzy)
        -> mixture resample -> split -> pack. Pins that the operators
        compose without column collisions and the lineage stays free of
        Python evaluation."""
        from pyspark.sql import functions as F

        from amonaly_detection_in_time_series_data_spark.functions.text import redact_pii
        from amonaly_detection_in_time_series_data_spark.operators.corpus import (
            decontaminate,
            fuzzy_decontaminate,
            hash_split,
            mixture_resample,
            pack_chunks,
            quality_rules,
        )
        from amonaly_detection_in_time_series_data_spark.operators.dedup import (
            dedup_exact_text,
            span_dedup_stats,
        )
        from amonaly_detection_in_time_series_data_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        n0 = docs.count()
        bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")

        d = docs.withColumn("text", redact_pii("text"))
        d = quality_rules(d, "text").filter(F.col("keep") == 1)
        d = dedup_exact_text(d, "text", "doc_id")
        spans = span_dedup_stats(d, "text", "doc_id", span_len=8)
        d = (
            d.join(spans, "doc_id", "left")
            .filter(F.coalesce(F.col("dup_span_frac"), F.lit(0.0)) <= 0.5)
        )
        exact = decontaminate(
            d.select("doc_id", "text"), bench, "text", "doc_id", shingle_n=4
        ).filter(F.col("contaminated") == 0).select("doc_id")
        fuzzy = fuzzy_decontaminate(
            d.select("doc_id", "text"), bench, min_jaccard_est=0.8
        ).filter(F.col("fuzzy_contaminated") == 0).select("doc_id")
        d = d.join(exact, "doc_id").join(fuzzy, "doc_id")
        d = mixture_resample(
            d, "source", "doc_id",
            {"src%d" % i: 1.0 for i in range(20)},
        ).filter(F.col("mix_keep") == 1)
        d = hash_split(d, "doc_id")
        packed = pack_chunks(
            d.filter(F.col("split") == "train"), ["lang"], ["doc_id"],
            "text", budget=256,
        )
        out = packed.collect()
        n_final = len(out)
        assert 0 < n_final < n0  # every stage dropped something overall
        # packing invariants survive the composition
        for r in out:
            assert r["chunk_id"] >= 0 and r["n_tokens"] > 0
        plan = packed._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


class TestDomainCap:
    """Per-domain cap: exact hash-ranked selection, flag/filter parity,
    and the scale property — the filter form must compile to a map-side
    WindowGroupLimit so a mega-domain never floods the window shuffle."""

    def _df(self, spark):
        # one mega-domain (60 rows), two small ones under the cap
        rows = [(i, "mega") for i in range(60)]
        rows += [(100 + i, "small_a") for i in range(3)]
        rows += [(200 + i, "small_b") for i in range(5)]
        return spark.createDataFrame(rows, "doc_id long, domain string")

    @staticmethod
    def _py_rank_keep(ids, cap, seed=13):
        import hashlib

        def h(i):
            d = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15]
            return int(d, 16) % 1_000_000_007

        return set(sorted(ids, key=lambda i: (h(i), i))[:cap])

    def test_matches_python_oracle_and_flag_filter_parity(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import domain_cap

        df = self._df(spark)
        cap = 5
        expected = (
            self._py_rank_keep(range(60), cap)
            | {100, 101, 102}
            | {200, 201, 202, 203, 204}
        )
        kept = {r["doc_id"] for r in domain_cap(df, "domain", "doc_id", cap).collect()}
        assert kept == expected
        flagged = {
            r["doc_id"]
            for r in domain_cap(
                df, "domain", "doc_id", cap, keep_col="cap_keep"
            ).filter("cap_keep = 1").collect()
        }
        assert flagged == expected
        # stable under repartition
        kept2 = {
            r["doc_id"]
            for r in domain_cap(df.repartition(7), "domain", "doc_id", cap).collect()
        }
        assert kept2 == expected

    def test_filter_form_uses_window_group_limit(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import domain_cap

        df = self._df(spark)
        plan = (
            domain_cap(df, "domain", "doc_id", 5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # Partial mode = the map-side per-group truncation BEFORE the
        # exchange; this is what caps a mega-domain's shuffle volume at
        # cap rows per input partition instead of its full size.
        assert "WindowGroupLimit" in plan, plan
        assert "Partial" in plan.split("Exchange")[-1] or "Partial" in plan, plan

    def test_bad_cap_raises(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import domain_cap

        with pytest.raises(ValueError, match="cap"):
            domain_cap(self._df(spark), "domain", "doc_id", 0)


class TestWeightedSample:
    def test_matches_python_replication(self, spark):
        """The A-ES selection must equal a python replication of the
        same md5-uniform + ln(u)/w arithmetic — deterministic across
        engines and partitionings."""
        import hashlib
        import math

        from amonaly_detection_in_time_series_data_spark.operators.corpus import weighted_sample

        rows = [(i, float(1 + (i * 7) % 13)) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, w double")

        def key(i, w, seed=17):
            m = 1 << 53
            h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16) % m
            return math.log((h + 1) / (m + 1)) / w

        expected = {
            i for i, _ in sorted(
                rows, key=lambda r: (-key(r[0], r[1]), r[0])
            )[:10]
        }
        got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()}
        assert got == expected
        got2 = {
            r["doc_id"]
            for r in weighted_sample(df.repartition(7), "doc_id", "w", 10).collect()
        }
        assert got2 == expected

    def test_weights_drive_inclusion_probability(self, spark):
        """Sanity: with weights 100 vs 1, the heavy row wins the n=1
        sample for the vast majority of seeds."""
        from amonaly_detection_in_time_series_data_spark.operators.corpus import weighted_sample

        df = spark.createDataFrame(
            [(1, 100.0), (2, 1.0)], "doc_id long, w double"
        )
        wins = sum(
            weighted_sample(df, "doc_id", "w", 1, seed=s).collect()[0]["doc_id"] == 1
            for s in range(20)
        )
        assert wins >= 16

    def test_nonpositive_weights_excluded_and_topk_plan(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.corpus import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double",
        )
        out = weighted_sample(df, "doc_id", "w", 4)
        assert {r["doc_id"] for r in out.collect()} == {1}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan


class TestBPE:
    """operators.bpe — the Sennrich et al. (2016) fixture where the
    merge sequence is hand-computable, plus the GPT-2 apply loop."""

    def _df(self, spark):
        # word frequencies: low x5, lower x2, newest x6, widest x3 —
        # spread across rows to prove counting is corpus-wide
        words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        rows = [(i, " ".join(words[i::3])) for i in range(3)]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_train_recovers_canonical_merge_sequence(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.bpe import (
            bpe_word_freq,
            train_bpe,
        )

        wf = bpe_word_freq(self._df(spark), min_freq=1)
        freqs = {r["word"]: r["freq"] for r in wf.collect()}
        assert freqs == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = train_bpe(wf, n_merges=5)
        assert merges == [
            ("e", "s"),
            ("es", "t"),
            ("est", "</w>"),
            ("l", "o"),
            ("lo", "w"),
        ]

    def test_train_is_partition_invariant(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.bpe import (
            bpe_word_freq,
            train_bpe,
        )

        df = self._df(spark)
        m1 = train_bpe(bpe_word_freq(df, min_freq=1), n_merges=8)
        m2 = train_bpe(bpe_word_freq(df.repartition(7), min_freq=1), n_merges=8)
        assert m1 == m2

    def test_encode_lowest_and_unknown_word(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.bpe import (
            bpe_encode,
            bpe_word_freq,
            train_bpe,
        )

        merges = train_bpe(bpe_word_freq(self._df(spark), min_freq=1), 5)
        df = spark.createDataFrame(
            [(1, "lowest"), (2, "xyz"), (3, None)], "id int, text string"
        )
        out = {
            r["id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
            for r in bpe_encode(df, merges).collect()
        }
        # the canonical segmentation from the paper's example
        assert out[1] == (["low", "est</w>"], 2)
        assert out[2] == (["x", "y", "z", "</w>"], 4)
        assert out[3] == ([], 0)

    def test_count_only_path_matches_token_path(self, spark):
        from amonaly_detection_in_time_series_data_spark.operators.bpe import (
            bpe_encode,
            bpe_word_freq,
            train_bpe,
        )

        df = self._df(spark)
        merges = train_bpe(bpe_word_freq(df, min_freq=1), 5)
        with_tokens = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode(df, merges).collect()
        }
        count_only = bpe_encode(df, merges, emit_tokens=False)
        assert "bpe_tokens" not in count_only.columns
        got = {r["doc_id"]: r["n_bpe_tokens"] for r in count_only.collect()}
        assert got == with_tokens

    def test_roundtrip_reconstruction(self, spark):
        import re as _re

        from amonaly_detection_in_time_series_data_spark.operators.bpe import (
            WORD_PATTERN,
            bpe_encode,
            bpe_word_freq,
            train_bpe,
        )

        df = self._df(spark)
        merges = train_bpe(bpe_word_freq(df, min_freq=1), 8)
        for r in bpe_encode(df, merges).collect():
            rebuilt = "".join(r["bpe_tokens"]).replace("</w>", " ").split()
            assert rebuilt == _re.findall(WORD_PATTERN, r["text"].lower())


class TestUrlFunctions:
    """functions.url — parse/normalize/domain-filter for web curation."""

    def test_parts_and_registrable_domain(self, spark):
        from amonaly_detection_in_time_series_data_spark.functions.url import url_parts

        df = spark.createDataFrame(
            [
                (1, "https://Blog.Example.COM:443/a/b?x=1"),
                (2, "http://sub.example.co.uk/path"),
                (3, "not a url"),
            ],
            "id int, url string",
        )
        got = {
            r["id"]: (r["host"], r["domain"], r["path"])
            for r in url_parts(df).collect()
        }
        assert got[1] == ("blog.example.com", "example.com", "/a/b")
        # documented heuristic: last-two-labels, NOT a PSL lookup
        assert got[2] == ("sub.example.co.uk", "co.uk", "/path")
        assert got[3][0] in (None, "")

    def test_normalize_idempotent_and_strips_noise(self, spark):
        from amonaly_detection_in_time_series_data_spark.functions.url import url_normalize

        rows = [
            (1, "HTTPS://Example.com:443/Path/?utm_source=x&a=1#frag"),
            (2, "https://example.com/Path/?a=1"),
            (3, "http://example.com:80/"),
            (4, "https://example.com/?utm_campaign=z"),
            # params whose NAME merely ends in a tracking name must
            # survive (ADVICE r7: unanchored 'ref=' ate 'href=...')
            (5, "https://a.com/page?href=http://b.com&x=1"),
            (6, "https://a.com/p?subref=abc&ref=track&utm_a=1&b=2"),
        ]
        df = spark.createDataFrame(rows, "id int, url string")
        out = df.select("id", url_normalize("url").alias("n"))
        got = {r["id"]: r["n"] for r in out.collect()}
        assert got[1] == "https://example.com/Path/?a=1"
        assert got[2] == "https://example.com/Path/?a=1"
        assert got[3] == "http://example.com"
        assert got[4] == "https://example.com"
        assert got[5] == "https://a.com/page?href=http://b.com&x=1"
        assert got[6] == "https://a.com/p?subref=abc&b=2"
        # idempotent: normalizing the normalized form changes nothing
        again = {
            r["id"]: r["n2"]
            for r in out.select(
                "id", url_normalize("n").alias("n2")
            ).collect()
        }
        assert again == got

    def test_domain_filter_block_allow_and_broadcast_plan(self, spark):
        from amonaly_detection_in_time_series_data_spark.functions.url import domain_filter

        df = spark.createDataFrame(
            [
                (1, "https://spamfarm.biz/x"),
                (2, "https://docs.example.com/y"),
                (3, "https://news.example.org/z"),
            ],
            "id int, url string",
        )
        bl = spark.createDataFrame([("SpamFarm.biz",)], "domain string")
        blocked = domain_filter(df, bl, mode="block")
        assert sorted(r["id"] for r in blocked.collect()) == [2, 3]
        allowed = domain_filter(df, bl, mode="allow")
        assert [r["id"] for r in allowed.collect()] == [1]
        plan = (
            blocked._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
        with pytest.raises(ValueError, match="unknown mode"):
            domain_filter(df, bl, mode="nope")
