"""Training-data pipeline operators: deterministic splits, stratified
sampling, quality-rule filtering, benchmark decontamination, token-budget
packing, and TF-IDF term scoring.

These extend the reference's surface (it has none of these — it is a
single-series anomaly pipeline, see SURVEY.md §2.14) with the operations
a large-scale LLM training-data pipeline needs. Everything here compiles
to built-in Catalyst expressions — no Python UDFs — and the hashing is
md5-derived so every operator is bit-reproducible in the DuckDB oracle.

Scale notes (100 TB):
- ``hash_split`` / ``stratified_sample`` are map-only except the
  per-stratum window in the latter (one shuffle keyed by the stratum —
  strata counts are computed by the same window, no extra pass).
- ``quality_rules`` is strictly map-only: every metric (token stats,
  symbol ratio, top-token fraction, duplicate-bigram fraction) is a
  per-row array expression, so it runs at scan speed with zero shuffle —
  chosen over explode+groupBy, which would shuffle EVERY token of the
  corpus. Per-row costs are kept linear-ish in doc length: the top-token
  fraction is the longest equal-run after ``array_sort`` (O(n log n)),
  and bigrams are ``zip_with`` over two slices of a token array that is
  materialized ONCE as a column — a free tokenize() expression captured
  in a HOF lambda is re-evaluated per element (quadratic; measured 2933s
  on one 50k-token doc before the fix, 1.3s after).
- ``decontaminate`` broadcasts the benchmark gram set (eval suites are
  tiny relative to the corpus) so the corpus-side join is map-side; only
  the *hits* (rare) are shuffled for the per-doc count. With
  ``bloom_fpp`` set, a pure-Catalyst Bloom bitmap (``getbit`` over one
  int64-array literal, ~10 bits/gram) pre-prunes corpus grams before the
  exact join — 40x less executor state than a broadcast string hash
  relation, and the confirm join keeps results exact.
- ``pack_chunks`` is one window (cumulative sum) per packing key.
- ``tfidf_top_terms`` shuffles exploded tokens once on (doc, term); the
  document-frequency table is tiny (vocab-sized) and broadcast back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.functions.text import tokenize
from amonaly_detection_in_time_series_data_spark.operators.similarity import (
    shingles_from_tokens,
)

__all__ = [
    "hash_split",
    "stratified_sample",
    "domain_cap",
    "weighted_sample",
    "mixture_resample",
    "quality_rules",
    "bloom_build",
    "bloom_might_contain",
    "decontaminate",
    "fuzzy_decontaminate",
    "pack_chunks",
    "chunk_text_overlap",
    "tfidf_top_terms",
    "make_longdoc_corpus",
    "unigram_logprob",
    "ppl_bucket",
    "keyness_log_odds",
]


def _md5_bucket(col: Column, seed: int, n_buckets: int) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets): first 15
    hex digits of md5('<seed>:' || value) as a bigint, mod n_buckets.
    DuckDB equivalent: CAST('0x' || substr(md5(...), 1, 15) AS BIGINT).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % n_buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashing a stable id.

    Each row gets ``bucket`` = md5-derived value in [0, 100) and
    ``split`` by cumulative weight thresholds (default 80/10/10). The
    assignment is a pure function of (id, seed): stable across runs,
    partitionings, and engines — the property a training pipeline needs
    so examples never migrate between splits as the corpus grows.
    Map-only; no shuffle.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = _md5_bucket(F.col(id_col), seed, 100)
    expr = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        cond = bucket < int(round(cum * 100))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(bucket_col, bucket).withColumn(
        split_col, expr.otherwise(list(weights)[-1])
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fraction: float | dict[str, float],
    seed: int = 7,
    keep_col: str = "strat_keep",
) -> DataFrame:
    """Deterministic per-stratum sampling: within each stratum, rank rows
    by a seeded md5 hash of the id and keep the top ``ceil(frac * n)``.

    Unlike ``df.sample``, the selection is exactly sized per stratum and
    reproducible across engines — this is the "mixing quota" primitive
    (e.g. per-language proportions) of a training-data pipeline.
    ``fraction`` may be one float or a per-stratum-value dict keyed by
    the FIRST strata column's value. One shuffle (the stratum window).
    """
    h = _md5_bucket(F.col(id_col), seed, 1_000_000_007)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    n = F.count("*").over(Window.partitionBy(*strata_cols))
    if isinstance(fraction, dict):
        frac = None
        for k, v in fraction.items():
            cond = F.col(strata_cols[0]) == k
            frac = F.when(cond, v) if frac is None else frac.when(cond, v)
        frac = frac.otherwise(0.0)
    else:
        frac = F.lit(float(fraction))
    quota = F.ceil(frac * n)
    return df.withColumn(
        keep_col, (F.row_number().over(w) <= quota).cast("int")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 17,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    (2006) A-ES keys: each row gets ``key = ln(u) / w`` with ``u`` a
    seeded md5-uniform in (0,1) and ``w`` its (positive) weight; the
    ``n`` LARGEST keys are the sample, and P(row in sample) follows the
    weights exactly as in sequential weighted draws without
    replacement. The importance-weighted cousin of
    :func:`stratified_sample` — quality-score-weighted corpus
    selection, upweighting rare domains, etc.

    Deterministic: key is a pure function of (id, seed, weight) —
    stable across runs, partitionings, and engines (md5 arithmetic; the
    only float step is one log+divide per row).

    Scale: map-only key computation; the global top-n compiles to
    ``TakeOrderedAndProject`` — per-partition heaps of size n, never a
    full sort or global shuffle of the corpus. For n too large to heap
    (billions), switch to a per-group quota formulation
    (:func:`stratified_sample` / :func:`domain_cap`).
    """
    if n < 1:
        raise ValueError(f"weighted_sample: n must be >= 1, got {n}")
    m = 1 << 53
    # uniform in (0,1): (h + 1) / (m + 1) can't hit 0 or 1, so ln(u) is finite
    u = (_md5_bucket(F.col(id_col), seed, m) + 1) / F.lit(float(m + 1))
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.log(u) / w)
    return (
        df.withColumn("__es_key", key)
        .filter(F.col("__es_key").isNotNull())
        .orderBy(F.col("__es_key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__es_key")
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    seed: int = 13,
    keep_col: str | None = None,
) -> DataFrame:
    """Per-domain document cap — the source-balancing primitive of web
    corpus curation (C4/RefinedWeb style: no single host dominates the
    corpus): within each ``domain_col`` group keep at most ``cap`` rows,
    the ones with the lowest seeded md5 hash of ``id_col``
    (deterministic across runs, partitionings, and engines); groups at
    or under the cap pass through whole.

    ``keep_col=None`` (default) DROPS the truncated rows, and this is
    the form to use at scale: the ``row_number() <= cap`` filter is
    rewritten by Spark into a map-side WindowGroupLimit
    (InferWindowGroupLimit, partial before the exchange), so every
    input partition forwards at most ``cap`` rows per domain into the
    window shuffle. A mega-domain — the exact skew a web crawl has, one
    host with 10^8 pages — costs ``cap x n_map_partitions`` shuffle
    rows instead of its full row count; no salting needed. The rewrite
    is plan-asserted in tests. With ``keep_col`` set, every row is kept
    and flagged instead; that form necessarily ranks the full group
    (same topology as :func:`stratified_sample`) — use it only when the
    truncated rows themselves are needed downstream.
    """
    if cap < 1:
        raise ValueError(f"domain_cap: cap must be >= 1, got {cap}")
    h = _md5_bucket(F.col(id_col), seed, 1_000_000_007)
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    rn = F.row_number().over(w)
    if keep_col is None:
        return (
            df.withColumn("__rn", rn).filter(F.col("__rn") <= cap).drop("__rn")
        )
    return df.withColumn(keep_col, (rn <= cap).cast("int"))


def quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.30,
    max_top_token_frac: float = 0.125,
    max_dup_bigram_frac: float = 0.60,
    min_alpha_word_frac: float = 0.80,
    max_bullet_line_frac: float = 0.90,
) -> DataFrame:
    """Gopher/C4-style heuristic quality metrics + keep flag, per doc.

    Metrics (all map-only array/regex expressions; thresholds follow the
    published Gopher rules, adapted to word-level):
    - ``n_tokens``: whitespace token count — in [min_tokens, max_tokens]
    - ``mean_word_len``: mean characters per token — in [2, 12]
    - ``symbol_ratio``: non-alphanumeric-non-space chars / chars
    - ``top_token_frac``: most frequent token's share of all tokens
      (repetition signal — boilerplate and degenerate text score high)
    - ``dup_bigram_frac``: 1 - distinct/total word bigrams (the Gopher
      "duplicate n-gram fraction" repetition rule)
    - ``alpha_word_frac``: share of tokens containing an alphabetic
      character (Gopher's 80%-alpha-words rule)
    - ``bullet_line_frac``: share of lines starting with a bullet
      marker (the Gopher 90%-bullet-lines rule)
    ``keep`` = 1 iff every rule passes.
    """
    # Tokens are materialized ONCE as a projected column and every
    # downstream expression references the bound attribute. A free
    # *expression* (the regex split of the whole document) captured
    # inside a higher-order-function lambda is re-evaluated per element
    # in Spark's interpreted HOF path — O(doc_len^2) per row; a bound
    # attribute is an O(1) lookup. Referenced >1 time and non-cheap, so
    # CollapseProject keeps the projection materialized.
    base_cols = df.columns
    clash = {"__toks", "__tok_h", "__sorted", "__bigrams"} & set(base_cols)
    if clash:
        raise ValueError(
            f"quality_rules: input already has internal temp column(s) "
            f"{sorted(clash)}; rename them before calling"
        )
    d = df.withColumn("__toks", tokenize(text_col))
    toks = F.col("__toks")
    # 64-bit token hashes, materialized once: the repetition metrics
    # below (top-token run, bigram distinctness) only need token
    # EQUALITY, so they run over primitive longs — sorting / comparing /
    # zipping 8-byte hashes instead of allocating and comparing strings.
    # (The r8 longdoc ladder's superlinear GC traced to per-gram string
    # materialization in this family of expressions.) Collisions merge
    # two distinct tokens — odds ~n^2/2^65 per doc, vanishing, and both
    # metrics only shift by a collision's worth when it happens.
    d = d.withColumn("__tok_h", F.transform(toks, lambda t: F.xxhash64(t)))
    n_tok = F.size(toks)
    # Sum of token lengths == count of non-whitespace characters
    # (tokenize is a whitespace split with empties removed — no chars
    # are dropped or added), so mean word length needs ONE regex pass
    # over the document string, not an interpreted per-token fold
    # (measured ~0.6 s/16 docs at the 200k-token rung for the fold).
    mean_wl = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
        / F.nullif(n_tok, F.lit(0)),
        4,
    )
    symbol_ratio = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
        / F.nullif(F.length(F.col(text_col)), F.lit(0)),
        4,
    )
    # Most-frequent-token count = longest run of equal adjacent tokens
    # after array_sort: O(n log n) per row, map-only. The naive
    # array_distinct x filter-count form is O(distinct_tokens x tokens)
    # per row — with max_tokens=100k a boilerplate-heavy doc costs ~1e9
    # comparisons inside one task (a straggler at scale). Runs over the
    # token-HASH array: primitive long sort, no string comparisons.
    #
    # The run-length fold packs its (best_run, current_run) state into
    # ONE bigint (best in the high 32 bits) over an adjacent-equality
    # boolean array. The earlier struct-state fold allocated a row +
    # object array + 3 boxes PER TOKEN in the interpreted HOF path —
    # the largest allocation site in the r9 longdoc ladder (quality_rules
    # owned 1.1 s of the 200k rung's 2.47 s GC). Booleans box to cached
    # singletons, so the per-element garbage is just the one state box.
    # __sorted is materialized (bound attribute) because the equality
    # lambda reads it via element_at — a captured free EXPRESSION would
    # re-sort per element (O(n^2 log n)).
    d = d.withColumn("__sorted", F.array_sort(F.col("__tok_h")))
    srt = F.col("__sorted")
    eqs = F.when(
        n_tok >= 2,
        F.transform(
            F.slice(srt, 2, n_tok - 1),
            lambda x, i: x == F.element_at(srt, i + 1),
        ),
    ).otherwise(F.array().cast("array<boolean>"))
    best_run = F.aggregate(
        eqs,
        F.lit((1 << 32) + 1).cast("bigint"),  # best=1, cur=1
        lambda acc, e: F.shiftleft(
            F.greatest(
                F.shiftright(acc, 32),
                F.when(
                    e, acc.bitwiseAND(F.lit(0xFFFFFFFF)) + 1
                ).otherwise(F.lit(1).cast("bigint")),
            ),
            32,
        )
        + F.when(e, acc.bitwiseAND(F.lit(0xFFFFFFFF)) + 1).otherwise(
            F.lit(1).cast("bigint")
        ),
        lambda acc: F.shiftright(acc, 32).cast("int"),
    )
    top_frac = F.round(
        F.when(n_tok > 0, best_run).otherwise(F.lit(None).cast("int"))
        / F.nullif(n_tok, F.lit(0)),
        4,
    )
    # Bigrams via ONE indexed transform over one slice of the bound
    # token-hash column: bigram[i] = xxhash64(th[i+1], th[i+2]), the
    # second token read by element_at on the bound attribute (O(1) —
    # only captured free EXPRESSIONS re-evaluate per element in the
    # interpreted HOF path). The earlier two-slice zip_with form
    # allocated three full-length long arrays per document; this
    # allocates two (slice + output). Materialized as a column so
    # array_distinct/size below don't re-run the transform. Only bigram
    # DISTINCTNESS is measured, so bigrams are 64-bit hash combinations
    # (xxhash64 of the two token hashes), never concatenated strings.
    th = F.col("__tok_h")
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.slice(th, 1, n_tok - 1),
            lambda a, i: F.xxhash64(a, F.element_at(th, i + 2)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    d = d.withColumn("__bigrams", bigrams)
    bg = F.col("__bigrams")
    dup_bigram = F.round(
        F.when(
            F.size(bg) > 0,
            1 - F.size(F.array_distinct(bg)) / F.size(bg).cast("double"),
        ).otherwise(F.lit(0.0)),
        4,
    )
    # Alpha-word count as ONE regex pass over the lowercased document:
    # tokenize() yields exactly the maximal \S+ runs of lower(text), and
    # the greedy `\S*[a-z]\S*` matches each such run containing a
    # lowercase letter exactly once (the match swallows the whole run,
    # so counts can't double). Equal by construction to
    # size(filter(toks, rlike('[a-z]'))) — pinned differentially in
    # tests/test_corpus_ops.py — but with one Matcher per document
    # instead of one per token (200k Matcher allocations/doc at the
    # ladder's top rung).
    alpha_frac = F.round(
        F.regexp_count(F.lower(F.col(text_col)), F.lit(r"\S*[a-z]\S*"))
        / F.nullif(n_tok, F.lit(0)),
        4,
    )
    lines = F.split(F.col(text_col), "\n")
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*]")))
        / F.nullif(F.size(lines), F.lit(0)),
        4,
    )
    out = d.select(
        *base_cols,
        n_tok.cast("bigint").alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        top_frac.alias("top_token_frac"),
        dup_bigram.alias("dup_bigram_frac"),
        alpha_frac.alias("alpha_word_frac"),
        bullet_frac.alias("bullet_line_frac"),
    )
    keep = (
        F.col("n_tokens").between(min_tokens, max_tokens)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
    )
    return out.withColumn("keep", keep.cast("int"))


def bloom_build(
    values: DataFrame,
    col: str,
    fpp: float = 0.01,
    seed: int = 7,
    max_bits: int = 1 << 27,
) -> dict:
    """Build a Bloom filter over a (smallish) value set as PLAIN DRIVER
    STATE — ``{m, k, seed, words}`` with the bitmap packed into signed
    int64 words — so membership tests compile to pure Catalyst
    expressions (:func:`bloom_might_contain`) with NO broadcast hash
    relation and NO join.

    The k bit positions of each value are computed SPARK-SIDE
    (``pmod(xxhash64(lit(i), col), m)``), so the probe expression —
    built from the very same functions — agrees bit-for-bit with the
    build; only the distinct positions (<= n*k ints) reach the driver.

    Sizing is the standard ``m = -n ln(fpp) / ln(2)^2`` rounded up to
    whole words, ``k = round(m/n ln 2)``. ``max_bits`` (default 2^27 =
    16 MB) bounds the literal: ~10M values at 1% fpp. Beyond that, a
    literal bloom is the wrong tool — use the broadcast join (the
    bitmap no longer beats the hash relation) or Spark's runtime
    bloom-filter join injection.
    """
    import math

    n = values.select(col).distinct().count()
    if n == 0:
        return {"m": 64, "k": 1, "seed": seed, "words": [0]}
    if not 0 < fpp < 1:
        raise ValueError(f"bloom_build: fpp must be in (0,1), got {fpp}")
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    if m > max_bits:
        raise ValueError(
            f"bloom_build: {n} values need {m} bits > max_bits={max_bits}; "
            "use the broadcast-join path at this scale"
        )
    k = max(1, round(m / n * math.log(2)))
    pos_exprs = [
        F.pmod(F.xxhash64(F.lit(seed), F.lit(i), F.col(col)), F.lit(m))
        for i in range(k)
    ]
    positions = [
        r["pos"]
        for r in values.select(
            F.explode(F.array(*pos_exprs)).alias("pos")
        ).distinct().collect()
    ]
    words = [0] * (m // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    # bit 63 set -> represent as signed two's-complement int64 (getbit
    # reads the same bit pattern back)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return {"m": m, "k": k, "seed": seed, "words": words}


def bloom_might_contain(bloom: dict, col: Column) -> Column:
    """Membership probe against a :func:`bloom_build` filter as a pure
    Catalyst expression: k ``getbit`` tests against one array<bigint>
    literal. No false negatives; false positives at the built fpp —
    callers use it as a map-side PRE-prune in front of an exact join,
    which keeps composed results exact (see :func:`decontaminate`).
    """
    words = F.lit(bloom["words"])
    m, k, seed = bloom["m"], bloom["k"], bloom["seed"]
    test = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(seed), F.lit(i), col), F.lit(m))
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        bit = F.call_function("getbit", word, F.pmod(pos, F.lit(64)))
        test = test & (bit == 1)
    return test


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    bloom_fpp: float | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    ``shingle_n``-gram with the benchmark (eval) set.

    Standard LLM-pretraining hygiene (n-gram overlap decontamination):
    any training document that contains a verbatim n-gram from an eval
    benchmark is flagged for removal. Returns one row per corpus doc
    with ``n_hit_grams`` (distinct overlapping grams) and
    ``contaminated`` (0/1).

    Scale: the benchmark gram set is exploded, deduped, and BROADCAST —
    eval suites are MBs against a 100 TB corpus — so the corpus side is
    a map-side semi-join of each doc's grams; only matching (doc, gram)
    hits reach the per-doc count shuffle.

    ``bloom_fpp``: when set, a :func:`bloom_build` filter over the
    benchmark grams pre-prunes the corpus grams MAP-SIDE before the
    exact join (the join then only confirms the ~fpp survivors, so
    results are EXACT — same oracle). The win at 100 TB: the bitmap
    literal is ~10 bits/gram vs ~50+ bytes/gram for a broadcast string
    hash relation (40x smaller executor state), and with a large eval
    suite the exact join can drop broadcast entirely — the bloom keeps
    the shuffled side at ~fpp of the corpus grams. Plan-asserted in
    tests: the bloom predicate sits in the scan-side Filter, under the
    join.
    """
    bench_grams = (
        benchmark.withColumn("__toks", tokenize(text_col))
        .select(
            F.explode(
                shingles_from_tokens(F.col("__toks"), shingle_n)
            ).alias("gram")
        )
        .distinct()
    )
    corpus_grams = corpus.withColumn("__toks", tokenize(text_col)).select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__toks"), shingle_n)).alias("gram"),
    )
    if bloom_fpp is not None:
        bloom = bloom_build(bench_grams, "gram", fpp=bloom_fpp)
        corpus_grams = corpus_grams.filter(
            bloom_might_contain(bloom, F.col("gram"))
        )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )
    out = corpus.join(hits, id_col, "left")
    return out.withColumn(
        "n_hit_grams", F.coalesce("n_hit_grams", F.lit(0)).cast("bigint")
    ).withColumn("contaminated", (F.col("n_hit_grams") > 0).cast("int"))


def pack_chunks(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    text_col: str = "text",
    budget: int = 256,
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each doc the training
    chunk its FIRST token lands in when docs are concatenated in
    (key, order) order and cut every ``budget`` tokens.

    This is the deterministic, SQL-expressible formulation of GPT-style
    example packing: ``chunk_id = floor(tokens_before / budget)`` where
    ``tokens_before`` is the running token total of all preceding docs in
    the stream. Adds ``n_tokens``, ``tokens_before``, ``chunk_id``.
    One window (running sum) per packing key — a single shuffle.
    """
    n_tok = F.size(tokenize(text_col)).cast("bigint")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum(n_tok).over(w), F.lit(0)).cast("bigint")
    return df.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        tokens_before.alias("tokens_before"),
    ).withColumn(chunk_col, (F.col("tokens_before") / budget).cast("bigint"))


def chunk_text_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window chunking with overlap — the RAG-indexing /
    long-doc pretraining chunker (:func:`pack_chunks` is the packing
    dual: many docs → one training chunk; this is one doc → many
    windows).

    Token windows of ``size`` start every ``stride = size − overlap``
    tokens. A window k ≥ 1 is emitted only if it contributes at least
    one token beyond the previous window's coverage
    (``k·stride + overlap < n_tokens``) — so the tail is covered by a
    possibly-short last window, no window is a pure subrange of its
    predecessor, consecutive full windows share exactly ``overlap``
    tokens, and an empty doc yields no chunks. Emits per chunk: index,
    start offset, token count, and an md5 of the space-joined window
    (content equality is provable without shipping the text).

    Entirely map-side: one ``explode`` with fan-out ≈ n_tokens/stride
    per doc — no shuffle, no window exchange; at 100 TB the chunker
    rides the scan it is fused into.
    """
    if not 0 <= overlap < size:
        raise ValueError("chunk_text_overlap: need 0 <= overlap < size")
    stride = size - overlap
    n = F.size(F.col("__toks"))
    # windows: k = 0, plus every k with k*stride + overlap < n
    n_chunks = (
        F.lit(1) + F.greatest(F.lit(0), F.floor((n - overlap - 1) / stride))
    ).cast("int")
    starts = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    start = F.col("chunk_idx") * stride
    window = F.slice(F.col("__toks"), start + 1, size)
    return (
        df.withColumn("__toks", tokenize(text_col))
        .select(id_col, F.explode(starts).alias("chunk_idx"), "__toks")
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            start.cast("bigint").alias("chunk_start"),
            F.size(window).cast("bigint").alias("chunk_n_tokens"),
            F.md5(F.concat_ws(" ", window)).alias("chunk_hash"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document (sklearn-style smooth idf:
    ``idf = ln((1+N)/(1+df)) + 1``).

    Per-doc keyword extraction for corpus analysis / topic tagging.
    Plan: explode tokens → count per (doc, term) [the one big shuffle]
    → term document-frequency (vocab-sized, broadcast back) → score →
    per-doc top-k window. Ties and cross-engine float safety: ranked by
    the ROUNDED score (6 dp) with the term as tiebreak.
    """
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * idf, 6))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def make_longdoc_corpus(
    docs: DataFrame,
    n_docs: int = 16,
    target_tokens: int = 200_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic long-document tier for the per-document scale
    ladder: the first ``n_docs`` rows of the corpus with their text
    repeated (boilerplate-style) up to ~``target_tokens`` tokens.

    Exists because the linearity claims on the text operators
    (quality_rules, shingling/minhash) must be MEASURED, not assumed —
    a web crawl's tail has multi-hundred-k-token documents, and a
    per-document quadratic that is invisible at the testdata's ~54
    tokens/doc dominates wall-clock there (r4 shipped two such
    quadratics). bench.py times quality_rules + minhash_signatures over
    this corpus at 25k/50k/100k/200k tokens and reports the ladder;
    the growth ratios are pinned loosely in tests/test_corpus_ops.py
    and recorded in SCALING.md.
    """
    base = docs.filter(F.col(id_col) < n_docs)
    n_tok = F.size(tokenize(text_col))
    k = F.greatest(
        F.lit(1), F.ceil(F.lit(target_tokens) / n_tok)
    ).cast("int")
    # One doc per partition, BEFORE the text expansion (the shuffle moves
    # the small source rows, not the repeated text). Without this, the
    # 16-row filter output collapses into ONE scan partition and every
    # downstream map-only operator processes all 16 multi-hundred-k-token
    # docs serially in a single task — r8's longdoc ladder was measuring
    # exactly that (one core of 32 busy, superlinear GC from one thread
    # churning ~200 MB of ephemeral strings). Spreading heavy-tail
    # documents across executors is also the correct 100 TB posture:
    # wall-clock is the LONGEST document, not the sum.
    return base.repartitionByRange(n_docs, F.col(id_col)).withColumn(
        text_col, F.repeat(F.concat(F.col(text_col), F.lit(" ")), k)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
    score_col: str = "unigram_logprob",
    round_digits: int | None = 6,
) -> DataFrame:
    """LM-style quality score: mean per-token natural-log probability
    under a unigram model (CCNet/Gopher-family "perplexity filtering",
    with the n-gram LM reduced to its SQL-expressible unigram form —
    exactly reproducible in the DuckDB oracle, no external LM).

    Very negative scores mark gibberish / out-of-distribution text
    (tokens rare under the reference distribution); boilerplate scores
    high. ``vocab_df``: optional (token, cnt) reference distribution —
    at 100 TB estimate it ONCE from a sample or a curated corpus and
    reuse; default estimates from ``df`` itself (adds one
    explode+groupBy pass). Docs with zero tokens get a NULL score.

    Plan: explode tokens -> (token) partial-agg vocab (vocab-sized,
    broadcast back, same discipline as tfidf_top_terms) -> map-side
    score join -> per-doc avg (one (doc) shuffle with map-side
    combine).
    """
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("tok"))
    if vocab_df is None:
        vocab_df = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab_df.agg(F.sum("cnt").alias("__total"))
    lp = vocab_df.crossJoin(F.broadcast(total)).select(
        "tok", (F.log("cnt") - F.log("__total")).alias("__lp")
    )
    score = F.avg("__lp")
    if round_digits is not None:
        score = F.round(score, round_digits)
    per_doc = (
        toks.join(F.broadcast(lp), "tok")
        .groupBy(id_col)
        .agg(score.alias(score_col))
    )
    return df.join(per_doc, id_col, "left")


def ppl_bucket(
    df: DataFrame,
    score_col: str = "unigram_logprob",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    bucket_col: str = "ppl_bucket",
    exact: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): partition
    the corpus into quality tiers by LM score — with the default 3
    buckets, ``head`` (most in-distribution / highest mean log-prob),
    ``middle``, ``tail``. Downstream mixing then samples tiers at
    different rates (head-heavy for quality, tail kept for diversity).

    ``exact=True``: ntile over (score desc, id) — deterministic,
    engine-portable (ties broken by id, scores are pre-rounded by
    ``unigram_logprob``), and ORACLE-CHECKABLE, but the ntile is one
    global window: one row per document through a single reducer. Fine
    for validation corpora; NOT the 100 TB path.

    ``exact=False`` is the scale path: bucket cutoffs from
    ``approx_percentile`` (one partial-aggregated pass, tiny result
    broadcast back) and the assignment itself is a map-only CASE —
    no global sort anywhere. Bucket sizes are then approximate at the
    sketch's error bound, which is what CCNet itself does (its cutoffs
    come from a sampled histogram).

    NULL scores (zero-token docs) get a NULL bucket in both modes.
    Bucket labels for n=3 are head/middle/tail; other n get 'b1'..'bN'
    (b1 = best).
    """
    if n_buckets < 2:
        raise ValueError(f"ppl_bucket: n_buckets must be >= 2, got {n_buckets}")
    labels = (
        ["head", "middle", "tail"]
        if n_buckets == 3
        else [f"b{i}" for i in range(1, n_buckets + 1)]
    )
    label_expr = None
    scored = df.filter(F.col(score_col).isNotNull())
    if exact:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        tile = F.ntile(n_buckets).over(w)
        buckets = scored.select(
            F.col(id_col), tile.alias("__tile")
        )
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = scored.agg(
            F.percentile_approx(
                F.col(score_col), F.array(*[F.lit(p) for p in probs]), 10_000
            ).alias("__cuts")
        )
        # tile i (1-based, 1 = best) = count of cutoffs >= score, + 1;
        # cutoffs are ascending quantiles so the BEST tier is scores
        # above the LAST cutoff
        tile = (
            F.size(
                F.filter(
                    F.col("__cuts"), lambda c: c >= F.col(score_col)
                )
            )
            + 1
        )
        buckets = scored.crossJoin(F.broadcast(cuts)).select(
            F.col(id_col), tile.alias("__tile")
        )
    for i, lab in enumerate(labels, start=1):
        cond = F.col("__tile") == i
        label_expr = (
            F.when(cond, lab) if label_expr is None else label_expr.when(cond, lab)
        )
    buckets = buckets.select(
        F.col(id_col), label_expr.alias(bucket_col)
    )
    return df.join(buckets, id_col, "left")


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    target_weights: dict[str, float],
    seed: int = 11,
    keep_col: str = "mix_keep",
    quota_col: str = "mix_quota",
) -> DataFrame:
    """Domain-mixture resampling: downsample so the kept corpus matches a
    target domain distribution (the data-mixing step of LLM pretraining —
    The Pile / DoReMi-style domain weights applied without upsampling).

    Given target proportions over ``domain_col``, the feasible corpus
    size is ``S = min_d floor(n_d / w_d)`` (the largest total for which
    no domain needs more rows than it has); each domain keeps
    ``quota_d = floor(w_d * S)`` rows — the ones with the lowest seeded
    md5 hash of ``id_col``, so the selection is a pure function of
    (id, seed): stable across runs, partitionings, and engines. Domains
    absent from ``target_weights`` (or weighted 0) keep nothing.

    Output adds ``quota_col`` (the domain's quota) and ``keep_col``
    (0/1). Weights are normalized internally, so any positive ratio
    vector works.

    Scale (100 TB): the domain-count aggregate is map-side partial into
    a k-row frame (k = #domains), the quota table is computed driver-free
    and BROADCAST back, and the per-domain ranking is ONE window shuffle
    keyed by the domain — identical topology to ``stratified_sample``.
    No driver collect; the scalar S rides a 1-row broadcast cross join.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if any(v < 0 for v in target_weights.values()):
        raise ValueError(f"negative weight in {target_weights}")
    total_w = float(sum(target_weights.values()))
    if total_w <= 0:
        raise ValueError("target_weights must sum to a positive value")
    weights = {k: v / total_w for k, v in target_weights.items()}

    wexpr = None
    for k, v in weights.items():
        cond = F.col(domain_col) == k
        wexpr = F.when(cond, v) if wexpr is None else wexpr.when(cond, v)
    wexpr = wexpr.otherwise(F.lit(0.0))

    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__w", wexpr)
    )
    feasible = counts.filter(F.col("__w") > 0).agg(
        F.min(F.floor(F.col("__n") / F.col("__w"))).alias("__S")
    )
    quotas = counts.crossJoin(F.broadcast(feasible)).select(
        domain_col,
        F.when(
            F.col("__w") > 0,
            F.least(F.floor(F.col("__w") * F.col("__S")), F.col("__n")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias(quota_col),
    )
    h = _md5_bucket(F.col(id_col), seed, 1_000_000_007)
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(quotas), domain_col, "left")
        .withColumn(
            keep_col,
            (F.row_number().over(w) <= F.coalesce(F.col(quota_col), F.lit(0)))
            .cast("int"),
        )
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
    n_bands: int = 4,
    min_jaccard_est: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """NEAR-match benchmark decontamination (the GPT-3-appendix /
    FLAN-style fuzzy filter): flag corpus docs whose MinHash-estimated
    shingle Jaccard against ANY benchmark doc reaches
    ``min_jaccard_est`` — catching paraphrased or lightly-edited eval
    leakage that exact n-gram overlap (:func:`decontaminate`) misses.

    Cross-dataset banded LSH: both sides get ``n_hashes`` MinHash
    signatures (``hash_fn='md5'`` keeps them engine-portable); the
    benchmark's banded signature table (tiny — eval suites are MBs) is
    BROADCAST, and corpus bands join it on the raw band slice (array
    equality — no bucket-hash collision risk), so the corpus side is
    map-only with no shuffle of corpus rows; only candidate hits
    aggregate per doc.

    Output: one row per corpus doc — ``(id, fuzzy_max_est,
    fuzzy_contaminated)`` with est = matching-minhash fraction.
    """
    from amonaly_detection_in_time_series_data_spark.operators.similarity import (
        minhash_signatures,
    )

    sig_c = minhash_signatures(
        corpus, text_col, id_col, n_hashes=n_hashes,
        shingle_n=shingle_n, hash_fn=hash_fn,
    )
    sig_b = minhash_signatures(
        benchmark, text_col, id_col, n_hashes=n_hashes,
        shingle_n=shingle_n, hash_fn=hash_fn,
    )
    r = n_hashes // n_bands

    def banded(sigs, side):
        return sigs.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col("sig").alias(f"{side}_sig"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.slice(F.col("sig"), b * r + 1, r).alias("slice"),
                    ),
                )
            ).alias("bb"),
        ).select(f"{side}_id", f"{side}_sig", "bb.band", "bb.slice")

    cand = (
        banded(sig_c, "c")
        .join(F.broadcast(banded(sig_b, "b")), ["band", "slice"])
        .select("c_id", "c_sig", "b_id", "b_sig")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("c_sig", "b_sig", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / n_hashes
    )
    hits = (
        cand.withColumn("__est", est)
        .groupBy(F.col("c_id").alias(id_col))
        .agg(F.max("__est").alias("fuzzy_max_est"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce("fuzzy_max_est", F.lit(0.0)), 4).alias(
                "fuzzy_max_est"
            ),
            (
                F.coalesce("fuzzy_max_est", F.lit(0.0))
                >= F.lit(float(min_jaccard_est))
            )
            .cast("int")
            .alias("fuzzy_contaminated"),
        )
    )


def keyness_log_odds(
    docs: DataFrame,
    text_col: str,
    group_expr: Column,
    alpha0: float = 10.0,
    k: int = 10,
) -> DataFrame:
    """Two-corpus keyness: per-token z-scored log-odds ratio with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    "Fightin' Words") between the documents where ``group_expr`` is
    true (group 'a') and the rest (group 'b') — the standard "what
    words characterize THIS slice of the corpus" screen (subreddit vs
    subreddit, spam vs ham, pre vs post cutoff), more robust than raw
    frequency ratios because the corpus-wide prior shrinks rare-token
    noise and the variance term standardizes the estimate.

    Per token w with counts ``y_aw``/``y_bw`` in groups of total size
    ``n_a``/``n_b`` and prior ``a_w = alpha0 * y_w / n`` (proportional
    to overall frequency):

        delta_w = ln((y_aw+a_w)/(n_a+alpha0-y_aw-a_w))
                - ln((y_bw+a_w)/(n_b+alpha0-y_bw-a_w))
        z_w    = delta_w / sqrt(1/(y_aw+a_w) + 1/(y_bw+a_w))

    Output: the top-``k`` tokens most associated with EACH group
    (signed z toward the group, rank on round(z,6) with token
    tiebreak — the engine-portable ordering convention), columns
    ``group`` ('a'/'b'), ``token``, ``cnt_in``, ``cnt_out``, ``z``
    (rounded 6), ``rank``.

    Scale: one explode + (token, group) groupBy (vocab-bounded), the
    two scalar totals broadcast, map-only scoring; the final ranking
    window partitions on the two group labels over VOCAB-sized (not
    corpus-sized) rows — bounded the same way every per-token table
    here is.
    """
    if k < 1:
        raise ValueError(f"keyness_log_odds: k must be >= 1, got {k}")
    if not alpha0 > 0:
        raise ValueError(f"keyness_log_odds: alpha0 must be > 0, got {alpha0}")
    toks = docs.select(
        F.when(group_expr, F.lit(1)).otherwise(F.lit(0)).alias("__ga"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum("__ga").alias("y_a"),
        F.sum(F.lit(1) - F.col("__ga")).alias("y_b"),
    )
    tot = counts.groupBy().agg(
        F.sum("y_a").alias("n_a"), F.sum("y_b").alias("n_b")
    )
    c = counts.crossJoin(F.broadcast(tot))
    a_w = F.lit(alpha0) * (F.col("y_a") + F.col("y_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    ya, yb = F.col("y_a") + a_w, F.col("y_b") + a_w
    delta = F.log(ya / (F.col("n_a") + F.lit(alpha0) - ya)) - F.log(
        yb / (F.col("n_b") + F.lit(alpha0) - yb)
    )
    z = delta / F.sqrt(F.lit(1.0) / ya + F.lit(1.0) / yb)
    scored = c.select(
        "token",
        F.col("y_a").cast("bigint").alias("y_a"),
        F.col("y_b").cast("bigint").alias("y_b"),
        F.round(z, 6).alias("__z"),
    )
    # top-k per direction via TakeOrderedAndProject (per-partition heap
    # + driver merge — never a one-partition sort over the vocab); the
    # rank window then runs on k rows only.
    from .relational import top_k_global

    def _side(label: str, order_desc: bool):
        head = top_k_global(
            scored,
            [
                F.col("__z").desc() if order_desc else F.col("__z").asc(),
                F.col("token").asc(),
            ],
            k,
        )
        w = Window.orderBy(
            F.col("__z").desc() if order_desc else F.col("__z").asc(),
            F.col("token").asc(),
        )
        cnt_in, cnt_out = ("y_a", "y_b") if order_desc else ("y_b", "y_a")
        # + 0.0 normalizes the IEEE -0.0 a negated zero would carry
        zcol = (
            F.col("__z")
            if order_desc
            else (-F.col("__z") + F.lit(0.0))
        )
        return head.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        ).select(
            F.lit(label).alias("group"),
            "token",
            F.col(cnt_in).alias("cnt_in"),
            F.col(cnt_out).alias("cnt_out"),
            zcol.alias("z"),
            "rank",
        )

    return _side("a", True).unionByName(_side("b", False))
