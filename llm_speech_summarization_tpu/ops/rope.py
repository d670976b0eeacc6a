"""Rotary position embeddings (RoPE), HF-Llama compatible.

Needed for exact numerical parity with the frozen HF teacher
(reference: model/audio_llama.py wraps HF LlamaForCausalLM, whose RoPE uses
the rotate-half convention with an optional Llama-3 frequency rescaling).
Parity here is what makes converted HF weights produce matching logits.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp


@dataclass(frozen=True)
class Llama3RopeScaling:
    """HF `rope_scaling` with rope_type="llama3" (Llama-3.2 checkpoints)."""

    factor: float = 32.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


def rope_inv_freq(
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[Llama3RopeScaling] = None,
) -> jnp.ndarray:
    """Inverse frequencies (head_dim/2,), float32, with optional llama3 scaling.

    Mirrors HF `ROPE_INIT_FUNCTIONS["llama3"]`: low-frequency bands are
    divided by `factor`, high-frequency bands kept, and the middle smoothly
    interpolated.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None:
        return inv_freq

    low_freq_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
    high_freq_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
    wavelen = 2.0 * math.pi / inv_freq

    scaled = inv_freq / scaling.factor
    smooth = (scaling.original_max_position_embeddings / wavelen - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor
    )
    mid = (1.0 - smooth) * scaled + smooth * inv_freq
    out = jnp.where(wavelen > low_freq_wavelen, scaled, inv_freq)
    is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return jnp.where(is_mid, mid, out)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray, dtype=jnp.float32):
    """cos/sin tables for integer positions.

    positions: (..., T) int32 → cos, sin: (..., T, head_dim) where the
    head_dim axis is the HF layout [freqs, freqs] (duplicated halves).
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., T, D/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., T, D)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embeddings.

    x: (B, T, H, Dh); positions: (B, T) or (T,) int32.
    Uses the HF rotate-half convention: out = x*cos + rotate_half(x)*sin,
    computed in x.dtype (see apply_rope_cached: bf16 products match HF's bf16 rope exactly).
    """
    if positions.ndim == 1:
        positions = positions[None, :]
    cos, sin = rope_cos_sin(positions, inv_freq)  # (B, T, Dh)
    return apply_rope_cached(x, cos, sin)


def apply_rope_cached(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """apply_rope with precomputed (B, T, Dh) cos/sin tables — positions are
    layer-invariant, so callers scanning over layers compute the tables once
    instead of 28 times per step (a measurable decode-loop term).

    Math runs in x.dtype with half-width tables and explicit half products
    (out = [x1*c - x2*s | x2*c + x1*s]) rather than f32 rotate-half-concat:
    the concat broke XLA elementwise fusion and the f32 intermediates tripled
    HBM traffic — 7.5 ms/apply → sub-ms at (128, 384, 24, 128). bf16 products
    match HF exactly: Llama casts cos/sin to the activation dtype before
    multiplying (modeling_llama.apply_rotary_pos_emb)."""
    half = x.shape[-1] // 2
    c = cos[..., :half][:, :, None, :].astype(x.dtype)
    s = sin[..., :half][:, :, None, :].astype(x.dtype)
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
