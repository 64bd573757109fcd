from .dedup import dedup_keep_positional, dedup_mean, dedup_exact_text
from .missing import ffill, bfill, fill_with_global, fill_zero, drop_nulls
from .features import add_lag_features, add_rolling_features, featurize
from .scaling import minmax_scale
from .sequences import create_sequences
from .anomaly import rolling_zscore, global_zscore_flags

__all__ = [
    "dedup_keep_positional",
    "dedup_mean",
    "dedup_exact_text",
    "ffill",
    "bfill",
    "fill_with_global",
    "fill_zero",
    "drop_nulls",
    "add_lag_features",
    "add_rolling_features",
    "featurize",
    "minmax_scale",
    "create_sequences",
    "rolling_zscore",
    "global_zscore_flags",
]
