from .pipeline import anomaly_pipeline

__all__ = ["anomaly_pipeline"]
