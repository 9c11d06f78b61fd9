from .metrics import Metrics, METRICS

__all__ = ["Metrics", "METRICS"]
