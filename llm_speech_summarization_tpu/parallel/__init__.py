from .mesh import distributed_init, make_mesh, mesh_from_devices
from .sharding import (
    batch_sharding,
    encoder_param_spec,
    llama_param_spec,
    opt_state_spec,
    shard_batch,
    shard_params,
)

__all__ = [
    "distributed_init",
    "make_mesh",
    "mesh_from_devices",
    "batch_sharding",
    "encoder_param_spec",
    "llama_param_spec",
    "opt_state_spec",
    "shard_batch",
    "shard_params",
]
