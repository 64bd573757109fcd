"""Lexical + hybrid retrieval tier: BM25 ranked search over an
inverted-postings shape, and reciprocal-rank fusion (RRF) to combine
ranked lists from heterogeneous retrievers (BM25 + embedding kNN).

The reference pipeline has no search capability; this extends the
engine's corpus surface (SURVEY.md §2.14 extension family) with the
query-side twin of the indexing operators that already exist
(tfidf_top_terms for per-doc keywords, the ANN ladder for vectors):
given a set of term queries, return the top-k documents per query under
BM25 (Robertson & Walker; the idf form is Lucene's non-negative
variant), and fuse lexical + vector rankings with RRF
(Cormack, Clarke & Buettcher, SIGIR 2009).

100 TB shape (the reason this is NOT "join everything with everything"):

- The corpus is never self-joined: document length is carried through
  the token explode, so the per-(doc, term) aggregate already has it.
- Postings are filtered to the query vocabulary BEFORE the aggregate
  via a broadcast semi-join — the distributed analogue of a posting-
  list fetch. The one big shuffle is the (doc, term) groupBy over
  query-term hits only, not over the whole corpus's token stream.
- df(term) computed on the filtered postings is still the CORPUS-wide
  document frequency for those terms (filtering by term drops no doc
  containing the term), so correctness survives the pruning.
- Corpus stats (N, avgdl) are one tiny aggregate, broadcast back; the
  query table and per-term df are broadcast; scores aggregate
  map-side per (query, doc).

Determinism / cross-engine portability: scores are ROUNDED before
ranking (BM25 at 4 dp — ln is transcendental; RRF at 6 dp — sums of
1/(k+rank) rationals), ties broken by document id ascending, matching
the repo-wide round-then-rank convention the DuckDB oracles replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = ["bm25_topk", "rrf_fuse", "retrieval_metrics"]


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 4,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    ``queries`` is a small DataFrame ``(query_id, terms: array<string>)``
    (it is broadcast twice: once term-only for the postings prune, once
    with ids to attach matches). Repeated query terms are deduplicated —
    standard bag-of-words BM25 ignores query-side multiplicity.

    Scoring: ``score(q, d) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` with Lucene's
    ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))``; documents with no
    query-term hit are absent (score 0 by construction).

    Output: ``(query_id, doc_id, n_terms_hit, score, rank)``, rank by
    rounded score desc, doc id asc, filtered to ``rank <= k``.
    """
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode_outer(F.col(terms_col)).alias("__term"),
        )
        .distinct()
    )
    vocab = qterms.select("__term").distinct()

    toks = df.select(
        F.col(id_col),
        F.size(tokenize(text_col)).alias("__dl"),
        F.explode(tokenize(text_col)).alias("__term"),
    )
    hits = toks.join(F.broadcast(vocab), "__term", "semi")
    tf = hits.groupBy(id_col, "__term").agg(
        F.count("*").alias("__tf"), F.first("__dl").alias("__dl")
    )
    # corpus-wide df for the query terms — computed AFTER the prune,
    # still exact (see module docstring)
    dfreq = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    stats = df.agg(
        F.count("*").alias("__n_docs"),
        F.avg(F.size(tokenize(text_col))).alias("__avgdl"),
    )

    idf = F.log(
        1.0
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_norm = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf")
        + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "__term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.round(F.sum(idf * tf_norm), round_dp).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "n_terms_hit", "score", "rank")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of ``ranked`` lists (each
    ``(query_id, id, rank)``): ``rrf(q, d) = Σ_lists 1/(k_rrf + rank)``,
    re-ranked per query. An item missing from a list contributes 0 —
    the property that makes RRF robust to incomparable score scales
    (BM25 vs cosine), which is exactly the hybrid-search use.

    Inputs are already top-k ranked lists (small relative to the
    corpus); the union + groupBy shuffles only
    ``O(n_queries · k · n_lists)`` rows.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    parts = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            (1.0 / (F.lit(k_rrf) + F.col(rank_col))).alias("__w"),
        )
        for r in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_id_col, id_col).agg(
        F.count("*").cast("bigint").alias("n_lists"),
        F.round(F.sum("__w"), round_dp).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "n_lists", "score", "rank")
    )


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int | None = None,
) -> DataFrame:
    """Per-query retrieval quality of a ranked result list against a
    relevant-item set: ``recall_at_k`` (hits / relevant), ``mrr``
    (1/rank of the first hit; 0 when none), and binary ``ndcg_at_k``
    (DCG of hit positions / ideal DCG) — the standard evaluation layer
    for the ANN/BM25 tiers (e.g. LSH results vs brute-force truth).

    ``truth`` is ``(query_col, item_col)`` relevant pairs; ``results``
    carries 1-based ``rank_col``. ``k`` truncates results first
    (default: use all). One join on (query, item) + one aggregate per
    query + a relevant-count aggregate broadcast back — never touches
    the corpus, only the (n_queries x k) lists, so it runs after any
    retrieval tier at any corpus scale.

    Duplicate (query, item) pairs — in either input — are collapsed
    before the join (results keep the MINIMUM rank, truth is distinct):
    otherwise a repeated result row double-counts a hit, recall_at_k can
    exceed 1.0, and DCG overstates (only idcg was guarded). A ranked
    list *should* be distinct per (query, item); this makes the metric
    total-correct rather than trusting that.
    """
    r = (
        results.select(query_col, item_col, rank_col)
        .groupBy(query_col, item_col)
        .agg(F.min(rank_col).alias(rank_col))
    )
    if k is not None:
        r = r.where(F.col(rank_col) <= int(k))
    truth_d = truth.select(query_col, item_col).distinct()
    n_rel = truth_d.groupBy(query_col).agg(
        F.count("*").cast("bigint").alias("__n_rel")
    )
    hits = r.join(truth_d, [query_col, item_col])
    per_q = hits.groupBy(query_col).agg(
        F.count("*").cast("bigint").alias("__hits"),
        (1.0 / F.min(rank_col)).alias("mrr"),
        F.sum(1.0 / F.log2(F.col(rank_col) + 1.0)).alias("__dcg"),
    )
    # ideal DCG for h hits: hits at ranks 1..h
    idcg = F.expr(
        "aggregate(sequence(1, cast(least(__hits, __n_rel) as int)), "
        "cast(0.0 as double), (acc, i) -> acc + 1.0 / log2(i + 1.0))"
    )
    out = n_rel.join(per_q, query_col, "left")
    return out.select(
        query_col,
        F.col("__n_rel").alias("n_relevant"),
        F.coalesce("__hits", F.lit(0)).cast("bigint").alias("hits"),
        (F.coalesce("__hits", F.lit(0)) / F.col("__n_rel").cast("double")).alias(
            "recall_at_k"
        ),
        F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
        F.coalesce(
            F.col("__dcg") / F.nullif(idcg, F.lit(0.0)), F.lit(0.0)
        ).alias("ndcg_at_k"),
    )
