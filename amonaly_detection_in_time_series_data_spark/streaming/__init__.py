from .rolling import (
    replay_events_stream,
    replay_table_stream,
    sessionized_stats,
    streaming_dedup,
    streaming_adwin,
    streaming_enrich,
    streaming_episode_assign,
    streaming_ewma_deviation,
    streaming_hampel_flags,
    streaming_kalman_level,
    streaming_page_hinkley,
    streaming_throttle_alerts,
    streaming_trend_ols,
    streaming_windowed_stats,
    streaming_zscore_flags,
)
from .joins import interval_join
from .sinks import write_anomaly_alerts

__all__ = [
    "streaming_windowed_stats",
    "sessionized_stats",
    "streaming_zscore_flags",
    "streaming_page_hinkley",
    "streaming_trend_ols",
    "streaming_ewma_deviation",
    "streaming_throttle_alerts",
    "streaming_hampel_flags",
    "streaming_kalman_level",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_adwin",
    "streaming_episode_assign",
    "interval_join",
    "replay_events_stream",
    "replay_table_stream",
    "write_anomaly_alerts",
]
