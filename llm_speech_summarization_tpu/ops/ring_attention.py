"""Ring attention: sequence-parallel attention over a mesh axis.

The long-audio building block (docs/DESIGN.md; SURVEY.md §2.3 SP/CP row):
when a sequence no longer fits one chip's attention working set, Q/K/V are
sharded along time over a "seq" mesh axis and K/V blocks rotate around the
ring (one ``jax.lax.ppermute`` per step) while each device folds every
block into a running online-softmax state for its local queries. Peak
memory per device is O(T_local²) instead of O(T²), compute overlaps the
rotation, and XLA compiles the permutes onto ICI neighbors.

The reference needs nothing like this (20 s clip cap ⇒ ≤ ~250 audio
embeds); this op exists so the encoder/LLM can scale to lecture-length
audio. Semantics match ops/attention.py's causal left-padded attention
bit-for-bit (tests/test_ring_attention.py, 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_body(
    q: jnp.ndarray,  # (B, Tl, Hq, Dh) local queries
    k0: jnp.ndarray,  # (B, Tl, Hkv, Dh) local keys (rotate)
    v0: jnp.ndarray,
    pad_lens: jnp.ndarray,  # (B,) replicated
    axis_name: str,
    causal: bool,
    scale: float,
):
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, Tl, Hq, Dh = q.shape
    Hkv = k0.shape[2]
    group = Hq // Hkv

    q_pos = my_idx * Tl + jnp.arange(Tl, dtype=jnp.int32)  # (Tl,) global

    # pvary: the accumulators become device-varying after the first step
    # (they depend on axis_index), so the initial carry must be marked
    # varying too or scan rejects the carry type.
    m0 = jax.lax.pvary(jnp.full((B, Hq, Tl, 1), NEG_INF, jnp.float32), axis_name)
    l0 = jax.lax.pvary(jnp.zeros((B, Hq, Tl, 1), jnp.float32), axis_name)
    acc0 = jax.lax.pvary(jnp.zeros((B, Hq, Tl, Dh), jnp.float32), axis_name)

    def step(carry, s):
        m, l, acc, k, v = carry
        src = (my_idx - s) % n  # which device's block we currently hold
        k_pos = src * Tl + jnp.arange(Tl, dtype=jnp.int32)  # (Tl,)

        qg = q.reshape(B, Tl, Hkv, group, Dh)
        logits = jnp.einsum(
            "bthgd,bshd->bhgts", qg, k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, Hq, Tl, Tl) * scale

        valid = k_pos[None, :] >= pad_lens[:, None]  # (B, Tl)
        mask = valid[:, None, None, :]
        if causal:
            mask = mask & (k_pos[None, None, None, :] <= q_pos[None, None, :, None])
        logits = jnp.where(mask, logits, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        # GQA-aware PV: reshape p to (B, Hkv, group, Tl, Tl) and contract
        pg = p.reshape(B, Hkv, group, Tl, Tl)
        pv = jnp.einsum(
            "bhgts,bshd->bhgtd", pg.astype(q.dtype), v.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, Hq, Tl, Dh)
        acc_new = alpha * acc + pv

        # rotate K/V to the next device on the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return (m_new, l_new, acc_new, k, v), None

    (m, l, acc, _, _), _ = jax.lax.scan(step, (m0, l0, acc0, k0, v0), jnp.arange(n))
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, Tl, Hq, Dh)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pad_lens: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "data",
    causal: bool = True,
) -> jnp.ndarray:
    """Sequence-parallel causal attention.

    q: (B, T, Hq, Dh); k, v: (B, T, Hkv, Dh) — T is sharded over
    ``seq_axis`` of ``mesh``; pad_lens (B,) are global left-pad lengths.
    Returns (B, T, Hq, Dh) sharded like q.
    """
    from jax.experimental.shard_map import shard_map

    Dh = q.shape[-1]
    scale = Dh ** -0.5
    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        partial(_ring_body, axis_name=seq_axis, causal=causal, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None)),
        out_specs=spec,
    )
    return fn(q, k, v, pad_lens)
