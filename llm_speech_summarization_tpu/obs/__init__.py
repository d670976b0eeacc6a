from .writer import MetricsWriter

__all__ = ["MetricsWriter"]
