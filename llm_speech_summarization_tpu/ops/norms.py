"""Normalization ops.

The reference gets these from torch/transformers (LlamaRMSNorm, nn.LayerNorm
inside HF HuBERT/Whisper). Here they are plain fused-by-XLA jnp ops with
float32 statistics regardless of compute dtype — the TPU-correct recipe for
bf16 activations.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm as used by Llama-family decoders (HF LlamaRMSNorm semantics:
    normalize in fp32, cast back, then scale)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (xf.astype(dtype)) * weight


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (HuBERT/Whisper encoder blocks)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return xf.astype(dtype) * weight + bias
