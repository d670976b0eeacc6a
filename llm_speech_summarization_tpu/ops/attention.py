"""Attention ops — XLA reference implementation.

This is the numerically authoritative path; the Pallas flash-attention
kernels in ``kernels/`` are validated against it and swapped in on TPU for
long sequences. The reference relied on HF/torch SDPA inside the frozen LLM
and the HuBERT/Whisper encoders (reference: model/audio_llama.py:49-61 via
transformers).

Conventions:
  * q: (B, T, Hq, Dh); k, v: (B, S, Hkv, Dh) with Hq a multiple of Hkv (GQA).
  * bias: broadcastable additive mask (B, 1, T, S) float32 (0 / -inf-ish).
  * softmax is computed in float32, output cast back to q.dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: keeps fully-masked rows finite


def make_attention_bias(
    q_valid: jnp.ndarray,
    kv_valid: jnp.ndarray,
    causal: bool = True,
    q_offset: Optional[jnp.ndarray] = None,
    kv_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Build an additive attention bias from validity masks.

    q_valid: (B, T) bool — query positions that are real (not padding).
    kv_valid: (B, S) bool — key positions that are real.
    causal: apply causal structure assuming queries occupy the last T slots
        of the S-long key axis (standard decode/prefill layout). For prefill
        T == S and this is the usual lower-triangular mask. ``q_offset``
        (B,) overrides the per-sample alignment: query i attends to keys
        j <= q_offset + i. ``kv_idx`` (S,) assigns explicit sequence
        positions to key slots (for [cache | fresh-keys] concatenated
        layouts where slots are not contiguous positions).

    Left-padded sequences (reference: utils.py:76-82 builds right-aligned
    masks) work out of the box: padding keys are masked everywhere and
    padding queries produce garbage rows that downstream losses mask out.
    """
    B, T = q_valid.shape
    S = kv_valid.shape[1]
    # kv_idx re-bases the KEY axis to explicit sequence positions (e.g. a
    # [cache | fresh-at-offset] layout); comparing those against the
    # default SLOT-based q_idx silently mis-masks, so the combination
    # requires an explicit q_offset
    assert kv_idx is None or q_offset is not None, (
        "kv_idx (position-based keys) needs q_offset (position-based "
        "queries) — the slot-based default would compare slots to positions"
    )
    bias = jnp.where(kv_valid[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    if causal:
        q_pos = jnp.arange(T, dtype=jnp.int32)
        if q_offset is None:
            q_idx = q_pos[None, :] + (S - T)  # queries are the last T keys
        else:
            q_idx = q_offset[:, None] + q_pos[None, :]
        k_idx = jnp.arange(S, dtype=jnp.int32) if kv_idx is None else kv_idx
        causal_ok = k_idx[None, None, :] <= q_idx[:, :, None]  # (B, T, S)
        bias = bias + jnp.where(causal_ok[:, None, :, :], 0.0, NEG_INF)
    return bias


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query scaled dot-product attention, fp32 accumulation."""
    B, T, Hq, Dh = q.shape
    _, S, Hkv, _ = k.shape
    assert Hq % Hkv == 0, f"GQA requires Hq % Hkv == 0, got {Hq=} {Hkv=}"
    group = Hq // Hkv
    if scale is None:
        scale = Dh ** -0.5

    # full-precision matmuls only for f32 inputs (the CPU test/reference
    # path); bf16 inputs use the native MXU pass with f32 accumulation —
    # HIGHEST on bf16 would force the ~6x-slower multi-pass f32 emulation
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None

    qg = q.reshape(B, T, Hkv, group, Dh)
    # (B, Hkv, group, T, S)
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias[:, :, None, :, :]  # bias head axis broadcasts over groups
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.reshape(B, T, Hq, Dh).astype(q.dtype)
