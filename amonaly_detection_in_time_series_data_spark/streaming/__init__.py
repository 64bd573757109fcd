from .rolling import streaming_windowed_stats, replay_events_stream

__all__ = ["streaming_windowed_stats", "replay_events_stream"]
