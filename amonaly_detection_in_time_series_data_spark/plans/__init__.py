from .pipeline import anomaly_pipeline
from .detector_suite import detector_suite

__all__ = ["anomaly_pipeline", "detector_suite"]
