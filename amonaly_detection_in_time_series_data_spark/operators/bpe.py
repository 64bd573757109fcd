"""Byte-pair-encoding subword tokenizer (Sennrich et al. 2016; the
GPT-2 merge-rank apply loop): real token counts for a training-data
pipeline instead of the whitespace/regex approximations in
``functions.text``.

Why the split of labor is scale-correct: BPE training never iterates
over the corpus — it iterates over the WORD-FREQUENCY DICTIONARY.
So the one corpus-sized pass (word counting) runs distributed as a
single explode + groupBy, the dictionary is capped (``max_words`` by
frequency — the long tail below ``min_freq`` cannot influence early
merges), and the merge loop runs driver-side over that bounded dict,
exactly like every production tokenizer trainer (SentencePiece, HF
tokenizers) does on its in-memory word counts. Encoding broadcasts the
merge-rank table and applies it in an Arrow-batched pandas UDF with a
per-batch word memo — each DISTINCT word in a batch is encoded once,
and natural language's Zipf skew makes that memo hit ~95%+.

No reference counterpart (the reference has no text surface at all);
library+pytest tier per QUERIES.md policy.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

__all__ = ["bpe_word_freq", "train_bpe", "bpe_encode"]

# word splitter shared by the distributed count and the encoder: runs of
# letters, runs of digits, or a single non-space symbol (GPT-2-ish,
# minus the lookahead tricks Java/RE2 and python re disagree on)
WORD_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
END_OF_WORD = "</w>"


def bpe_word_freq(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int = 50_000,
) -> DataFrame:
    """The distributed pass: ``(word, freq)`` over the corpus, lowered,
    split by :data:`WORD_PATTERN`, pruned to ``freq >= min_freq`` and
    the ``max_words`` most frequent (ties broken by word for
    determinism). One explode + one groupBy; the result is the bounded
    artifact the driver-side merge loop consumes."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
    )


def train_bpe(word_freq: DataFrame, n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` frame
    (:func:`bpe_word_freq` output). Classic algorithm: words start as
    character sequences + ``</w>``; each step merges the most frequent
    adjacent symbol pair (ties broken lexicographically so training is
    deterministic across runs/partitionings). Driver-side over the
    bounded dict — O(dict) per merge, zero Spark jobs."""
    vocab: dict[tuple[str, ...], int] = {}
    for r in word_freq.select("word", "freq").collect():
        vocab[tuple(r["word"]) + (END_OF_WORD,)] = int(r["freq"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        # deterministic: highest freq, ties to the lexicographically
        # smallest pair — training is reproducible across partitionings
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2 apply loop: repeatedly merge the LOWEST-RANK adjacent pair
    until no learned pair remains."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    emit_tokens: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with the learned merges. Adds
    ``{out_col}`` (array<string>, when ``emit_tokens``) and
    ``n_bpe_tokens`` (int). The merge-rank dict rides to executors once
    via broadcast; the pandas UDF memoizes per distinct word per batch.
    With ``emit_tokens=False`` only the count column is added — at
    100 TB the token arrays dominate the output bytes, and counting
    (quality rules, packing budgets) doesn't need them."""
    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)
    word_re = re.compile(WORD_PATTERN)

    @F.pandas_udf(ArrayType(StringType()))
    def _tokens(texts):
        import pandas as pd

        rk = b_ranks.value
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            out: list[str] = []
            for w in word_re.findall(text.lower()):
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, rk)
                    memo[w] = toks
                out.extend(toks)
            return out

        return pd.Series([enc(t) for t in texts])

    @F.pandas_udf(IntegerType())
    def _count(texts):
        import pandas as pd

        rk = b_ranks.value
        memo: dict[str, int] = {}

        def cnt(text):
            if text is None:
                return 0
            n = 0
            for w in word_re.findall(text.lower()):
                c = memo.get(w)
                if c is None:
                    c = len(_encode_word(w, rk))
                    memo[w] = c
                n += c
            return n

        return pd.Series([cnt(t) for t in texts])

    if emit_tokens:
        out = df.withColumn(out_col, _tokens(F.col(text_col)))
        return out.withColumn("n_bpe_tokens", F.size(F.col(out_col)))
    return df.withColumn("n_bpe_tokens", _count(F.col(text_col)))
