from .rolling import streaming_windowed_stats, replay_events_stream, replay_table_stream
from .sinks import write_anomaly_alerts

__all__ = [
    "streaming_windowed_stats",
    "replay_events_stream",
    "replay_table_stream",
    "write_anomaly_alerts",
]
