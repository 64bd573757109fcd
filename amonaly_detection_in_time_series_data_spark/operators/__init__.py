from .dedup import dedup_keep_positional, dedup_mean, dedup_exact_text
from .missing import ffill, bfill, fill_with_global, fill_with_strategies, fill_zero, drop_nulls
from .features import add_lag_features, add_rolling_features, featurize
from .scaling import minmax_scale
from .sequences import create_sequences
from .anomaly import rolling_zscore, global_zscore_flags, pca_reconstruction_error
from .features import bucketed_rolling
from .inference import (
    fit_linear_ae_epochs,
    flag_sequence_anomalies,
    score_linear_ae_sql,
    sequence_reconstruction_scores,
)
from .relational import join_dim, salted_agg, top_k_global, top_k_per_group
from .similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_cosine_topk,
    lsh_bucket,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from .timeseries import asof_join, resample_grid, sessionize
from .corpus import (
    decontaminate,
    hash_split,
    pack_chunks,
    quality_rules,
    stratified_sample,
    tfidf_top_terms,
)
from .artifacts import (
    BestCheckpoint,
    load_linear_ae,
    load_ml,
    save_linear_ae,
    save_ml,
)

__all__ = [
    "dedup_keep_positional",
    "dedup_mean",
    "dedup_exact_text",
    "ffill",
    "bfill",
    "fill_with_global",
    "fill_with_strategies",
    "fill_zero",
    "drop_nulls",
    "add_lag_features",
    "add_rolling_features",
    "featurize",
    "minmax_scale",
    "create_sequences",
    "rolling_zscore",
    "global_zscore_flags",
    "pca_reconstruction_error",
    "bucketed_rolling",
    "fit_linear_ae_epochs",
    "flag_sequence_anomalies",
    "score_linear_ae_sql",
    "sequence_reconstruction_scores",
    "join_dim",
    "salted_agg",
    "top_k_global",
    "top_k_per_group",
    "cosine_topk",
    "embedding_neardup_pairs",
    "ivf_cosine_topk",
    "lsh_bucket",
    "lsh_cosine_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash64",
    "asof_join",
    "resample_grid",
    "sessionize",
    "decontaminate",
    "hash_split",
    "pack_chunks",
    "quality_rules",
    "stratified_sample",
    "tfidf_top_terms",
    "BestCheckpoint",
    "load_linear_ae",
    "load_ml",
    "save_linear_ae",
    "save_ml",
]
