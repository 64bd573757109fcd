"""Text-quality classifier: hashed bag-of-words + MLlib logistic
regression, scored back through pure Catalyst expressions.

The fasttext-style quality-classifier pattern of LLM data pipelines
(LLaMA / GPT-3 style: label a slice of the corpus with cheap heuristics
or a reference corpus, train a linear text classifier, score everything
and keep high-probability docs). The reference repo has no classifier —
this extends SURVEY.md §2.14's training-data tier.

Design for 100 TB:

- **Featurization is defined by a Catalyst expression** —
  ``pmod(hash(token), n_features)`` (SQL murmur3, seed fixed by Spark) —
  not by MLlib's ``HashingTF`` (which uses a different murmur variant,
  verified non-identical). The fit consumes vectors built from the SAME
  bucket expression, so the scoring side can reproduce the model with
  zero Python: per-token coefficient lookup
  ``aggregate(tokens, acc + coef[bucket(t)])`` — O(doc_len) per row,
  no feature vector ever materialized at scoring time.
- **Training is distributed** (MLlib LBFGS over the labeled frame); the
  only driver state is the fitted ``(coef[n_features], intercept)`` —
  d+1 scalars, shipped back as ONE array literal
  (:func:`nested_double_literal`), same convention as the linear-AE
  scorer. At 100 TB you fit on a labeled sample (pass ``fit_rows``) and
  score the full corpus map-side.
- The dense count-vector assembly used at FIT time is
  O(n_features · doc_len) per row — acceptable for the bounded fit
  frame, never used at scoring time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.functions.text import tokenize
from amonaly_detection_in_time_series_data_spark.functions.vectors import (
    nested_double_literal,
)

__all__ = [
    "TextLRModel",
    "hashed_bow_bucket",
    "hashed_bow_counts",
    "fit_text_lr",
    "score_text_lr",
]


def hashed_bow_bucket(token: Column, n_features: int) -> Column:
    """Feature index of one token: ``pmod(hash(token), n_features)``.
    ``hash`` is Spark SQL's murmur3 (fixed seed 42) — deterministic
    across runs, partitions, and sessions."""
    return F.pmod(F.hash(token), F.lit(n_features))


def hashed_bow_counts(tokens: Column, n_features: int) -> Column:
    """Dense term-count vector (``array<double>`` length ``n_features``)
    from a bound token-array column. O(n_features · n_tokens) per row —
    fit-time only; scoring never builds this."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda b: F.size(
            F.filter(tokens, lambda t: hashed_bow_bucket(t, n_features) == b)
        ).cast("double"),
    )


@dataclass
class TextLRModel:
    coef: list[float]  # length n_features
    intercept: float
    n_features: int


def fit_text_lr(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 256,
    max_iter: int = 50,
    reg_param: float = 1e-4,
    fit_rows: int | None = None,
    order_cols: list[str] | None = None,
) -> TextLRModel:
    """Fit a binary logistic-regression text classifier on hashed BoW
    counts. Training runs distributed in MLlib; only the (d+1)-scalar
    model comes back to the driver.

    ``fit_rows``/``order_cols``: bound the labeled fit frame (at corpus
    scale the labels cover a sample anyway). ``order_cols`` makes the
    sample deterministic across partitionings — pass it whenever the
    fitted model feeds a pinned digest.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    d = df.select(F.col(label_col).cast("double").alias("label"),
                  tokenize(text_col).alias("__toks"))
    if fit_rows is not None:
        d = d.orderBy(*order_cols).limit(fit_rows) if order_cols else d.limit(fit_rows)
    feat = d.select(
        "label",
        array_to_vector(hashed_bow_counts(F.col("__toks"), n_features)).alias(
            "features"
        ),
    )
    if feat.limit(1).count() == 0:
        raise ValueError("fit_text_lr: empty labeled frame")
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    m = lr.fit(feat)
    return TextLRModel(
        coef=[float(c) for c in m.coefficients.toArray()],
        intercept=float(m.intercept),
        n_features=n_features,
    )


def score_text_lr(
    df: DataFrame,
    model: TextLRModel,
    text_col: str,
    prob_col: str = "quality_prob",
    pred_col: str = "quality_pred",
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents with a fitted :class:`TextLRModel` — pure
    Catalyst, zero Python at execution time.

    ``z = intercept + Σ_t coef[bucket(t)]`` via one ``aggregate`` over
    the bound token array (coefficients ride a single array literal);
    ``prob = 1/(1+e^-z)``. Map-only: the scoring pass adds no shuffle
    and runs inside scan-side projection at any corpus size.
    """
    coef = nested_double_literal(model.coef)
    toks = tokenize(text_col)
    z = F.aggregate(
        toks,
        F.lit(float(model.intercept)),
        lambda acc, t: acc
        + F.element_at(coef, hashed_bow_bucket(t, model.n_features) + 1),
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(prob_col, prob).withColumn(
        pred_col, (prob >= threshold).cast("int")
    )
