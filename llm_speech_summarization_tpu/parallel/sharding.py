"""Sharding rules: parameter PartitionSpecs + batch sharding.

No reference counterpart (single GPU, SURVEY.md §2.3). Strategy:

  * LLM (the 3B frozen teacher/student backbone) is tensor-parallel over the
    "model" axis: attention qkv/out and MLP up/gate/down are sharded on the
    head/ffn dimension (Megatron layout — one all-reduce per block, inserted
    by XLA), embeddings sharded on vocab;
  * the trainable audio encoder (~0.3B) is replicated — its gradients
    all-reduce over "data" automatically;
  * batches are sharded on the leading (batch) axis over "data".

Works with plain ``jax.jit``: inputs carry NamedShardings, XLA propagates.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def llama_param_spec(params: Any) -> Any:
    """PartitionSpec pytree for init_llama_params output."""

    def spec_for(path: str, x) -> P:
        if "embed_tokens" in path:
            return P("model", None)
        if "lm_head" in path:
            return P(None, "model")
        if any(k in path for k in ("wq", "wk", "wv", "w_gate", "w_up")):
            return P(None, None, "model")
        if any(k in path for k in ("wo", "w_down")):
            return P(None, "model", None)
        return P()  # norms etc. replicated

    return jax.tree_util.tree_map_with_path(
        lambda kp, x: spec_for(jax.tree_util.keystr(kp), x), params
    )


def encoder_param_spec(params: Any) -> Any:
    """Audio-encoder params: replicated (small next to the LLM)."""
    return jax.tree_util.tree_map(lambda x: P(), params)


def opt_state_spec(opt_state: Any, mesh: Mesh, min_size: int = 16384) -> Any:
    """ZeRO-1 sharding for the optimizer state (SURVEY.md §2.3 ZeRO row).

    Encoder params are replicated, but their Adam moments (2× the f32
    master size — the encoder's HBM term that caps the per-chip train
    batch, PERF.md) need not be: every moment tensor whose leading dim
    divides by the "data" axis is split there; tiny/odd leaves and scalar
    counts stay replicated. XLA inserts the reshard on update — one
    scatter/gather per step, the classic ZeRO-1 trade.
    """
    n = mesh.shape["data"]

    def spec_for(x) -> P:
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[0] % n == 0 and int(np.prod(shape)) >= min_size:
            return P("data")
        return P()

    return jax.tree_util.tree_map(spec_for, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard every leaf on its leading (batch) axis over "data"."""

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
