"""Pallas TPU single-token decode attention over a KV cache.

The decode hot loop is HBM-bandwidth bound: every step must stream the
whole KV cache once. The XLA fallback (ops/attention.py over a
concatenated [cache | fresh] key stream) additionally materializes a cache
copy per layer per step; this kernel reads the cache in place:

  * cache layout (B, Hkv, S, Dh) — the sequence axis is contiguous per
    head, so the kernel streams K/V at full bandwidth with zero transposes;
  * grid (B, Hkv): each program handles one sample's kv-head — all `group`
    grouped queries at once (GQA);
  * slot validity is arithmetic, not a mask array: slot s is valid iff
    pad_len[b] <= s < offset (left-padded prefill + contiguously generated
    tokens), and the fresh key rides in separately;
  * single-shot softmax in f32 (S fits VMEM for the ≤ few-K contexts this
    framework targets; a blocked online-softmax variant can extend it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    scal_ref,  # scalar-prefetch (B+1,) int32: [pad_0..pad_{B-1}, offset]
    q_ref,  # (1, 1, G, Dh)
    kc_ref,  # (1, S, Dh)
    vc_ref,  # (1, S, Dh)
    kn_ref,  # (1, 1, Dh) fresh key
    vn_ref,  # (1, 1, Dh) fresh value
    o_ref,  # (1, 1, G, Dh)
    *,
    scale: float,
    seq_len: int,
):
    b = pl.program_id(0)
    pad = scal_ref[b]
    offset = scal_ref[pl.num_programs(0)]  # last slot holds the offset

    q = q_ref[0, 0]  # (G, Dh), native dtype — bf16 MXU with f32 accum
    s = jnp.dot(q, kc_ref[0].T, preferred_element_type=jnp.float32) * scale  # (G, S)

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len), 1)
    valid = (slot >= pad) & (slot < offset)
    s = jnp.where(valid, s, NEG_INF)

    s_new = jnp.dot(q, kn_ref[0].T, preferred_element_type=jnp.float32) * scale  # (G, 1)

    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
    p = jnp.exp(s - m)  # (G, S)
    p_new = jnp.exp(s_new - m)  # (G, 1)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
    acc = jnp.dot(
        p.astype(vc_ref.dtype), vc_ref[0], preferred_element_type=jnp.float32
    )
    acc = acc + p_new * vn_ref[0].astype(jnp.float32)
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jnp.ndarray,  # (B, 1, Hq, Dh)
    k_cache: jnp.ndarray,  # (B, Hkv, S, Dh)
    v_cache: jnp.ndarray,  # (B, Hkv, S, Dh)
    k_new: jnp.ndarray,  # (B, 1, Hkv, Dh)
    v_new: jnp.ndarray,  # (B, 1, Hkv, Dh)
    pad_lens: jnp.ndarray,  # (B,) int32
    offset: jnp.ndarray,  # scalar int32: next write slot (= #tokens so far)
    interpret: bool = False,
) -> jnp.ndarray:
    B, _, Hq, Dh = q.shape
    _, Hkv, S, _ = k_cache.shape
    assert Hq % Hkv == 0
    group = Hq // Hkv
    scale = Dh ** -0.5

    qg = q.reshape(B, Hkv, group, Dh).reshape(B * Hkv, 1, group, Dh)
    kn = k_new.reshape(B * Hkv, 1, Dh)
    vn = v_new.reshape(B * Hkv, 1, Dh)

    scalars = jnp.concatenate(
        [pad_lens.astype(jnp.int32), jnp.asarray(offset, jnp.int32)[None]]
    )

    kernel = functools.partial(_decode_kernel, scale=scale, seq_len=S)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv),
            in_specs=[
                pl.BlockSpec((1, 1, group, Dh), lambda b, h, scal: (b * Hkv + h, 0, 0, 0)),
                pl.BlockSpec((1, S, Dh), lambda b, h, scal: (b * Hkv + h, 0, 0)),
                pl.BlockSpec((1, S, Dh), lambda b, h, scal: (b * Hkv + h, 0, 0)),
                pl.BlockSpec((1, 1, Dh), lambda b, h, scal: (b * Hkv + h, 0, 0)),
                pl.BlockSpec((1, 1, Dh), lambda b, h, scal: (b * Hkv + h, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, group, Dh), lambda b, h, scal: (b * Hkv + h, 0, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B * Hkv, 1, group, Dh), q.dtype),
        interpret=interpret,
    )(
        scalars,
        qg,
        k_cache.reshape(B * Hkv, S, Dh),
        v_cache.reshape(B * Hkv, S, Dh),
        kn,
        vn,
    )
    return out.reshape(B, Hkv, group, Dh).reshape(B, 1, Hq, Dh)
