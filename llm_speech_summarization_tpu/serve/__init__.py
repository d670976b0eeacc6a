from .server import BatchingEngine, SummarizationServer, serve

__all__ = ["BatchingEngine", "SummarizationServer", "serve"]
