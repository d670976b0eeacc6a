from .router import ReplicaRouter
from .server import BatchingEngine, ContinuousBatchingEngine, SummarizationServer, serve

__all__ = [
    "BatchingEngine",
    "ContinuousBatchingEngine",
    "ReplicaRouter",
    "SummarizationServer",
    "serve",
]
