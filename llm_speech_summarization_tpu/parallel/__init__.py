from .mesh import make_mesh, mesh_from_devices
from .sharding import (
    batch_sharding,
    encoder_param_spec,
    llama_param_spec,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_from_devices",
    "batch_sharding",
    "encoder_param_spec",
    "llama_param_spec",
    "shard_batch",
    "shard_params",
]
