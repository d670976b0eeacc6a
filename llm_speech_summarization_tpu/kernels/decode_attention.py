"""Pallas TPU single-token decode attention over a KV cache.

The decode hot loop is HBM-bandwidth bound: every step must stream the
whole KV cache once. The XLA fallback (ops/attention.py over a
concatenated [cache | fresh] key stream) additionally materializes a cache
copy per layer per step; this kernel reads the cache in place:

  * cache layout (B, Hkv, S, Dh) — the sequence axis is contiguous per
    head, so the kernel streams K/V at full bandwidth with no transposes;
  * the (batch, kv-head) pairs are fused into R = B·Hkv rows and each grid
    program handles a block of ``rows_per_program`` of them — few, fat
    programs instead of R tiny ones (grid-iteration overhead × 28 layers
    was the dominant cost of the naive one-row-per-program version);
  * slot validity is arithmetic, not a mask array: slot s of row r is
    valid iff pad_len[r] <= s < offset;
  * optional int8 cache: values stream from HBM at half width and are
    dequantized in-register (per-row bf16 scales folded into the logits /
    probabilities) — the KV-traffic term of the decode roofline halves;
  * single-shot softmax in f32 (S fits VMEM for the ≤ few-K contexts this
    framework targets; a blocked online-softmax variant can extend it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _rows_per_program(R: int, S: int, Dh: int, itemsize: int) -> int:
    """Largest row block ≤16 dividing R whose K+V slabs fit ~6 MB of VMEM."""
    budget = 6 * 1024 * 1024
    bb = 16
    while bb > 1 and (R % bb != 0 or 2 * bb * S * Dh * itemsize > budget):
        bb -= 1
        while bb > 1 and R % bb != 0:
            bb -= 1
    return max(bb, 1)


def _decode_kernel(
    scal_ref,  # scalar-prefetch (R+1,) int32: [pad_row_0..pad_row_{R-1}, offset]
    q_ref,  # (bb, G, Dh)
    kc_ref,  # (bb, S, Dh)
    vc_ref,  # (bb, S, Dh)
    kn_ref,  # (bb, 1, Dh) fresh key
    vn_ref,  # (bb, 1, Dh) fresh value
    o_ref,  # (bb, G, Dh)
    *,
    scale: float,
    seq_len: int,
    rows_per_program: int,
    quantized: bool,
    ks_ref=None,
    vs_ref=None,
):
    i = pl.program_id(0)
    R = pl.num_programs(0) * rows_per_program
    offset = scal_ref[R]

    q = q_ref[:]  # (bb, G, Dh)
    # batched per-row matmuls: (bb, G, Dh) x (bb, S, Dh) -> (bb, G, S)
    s = jax.lax.dot_general(
        q, kc_ref[:].astype(q.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if quantized:
        s = s * ks_ref[:].astype(jnp.float32)  # (bb, 1, S) row scales
    s = s * scale

    # per-row pad masks (rows_per_program is small and static → unrolled)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len), 1)
    masks = [
        (slot >= scal_ref[i * rows_per_program + r]) & (slot < offset)
        for r in range(rows_per_program)
    ]
    valid = jnp.stack(masks, axis=0)  # (bb, 1, S)
    s = jnp.where(valid, s, NEG_INF)

    s_new = jax.lax.dot_general(
        q, kn_ref[:].astype(q.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (bb, G, 1)

    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
    p = jnp.exp(s - m)  # (bb, G, S)
    p_new = jnp.exp(s_new - m)  # (bb, G, 1)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
    if quantized:
        p = p * vs_ref[:].astype(jnp.float32)  # fold value scales in
    acc = jax.lax.dot_general(
        p.astype(q.dtype), vc_ref[:].astype(q.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, G, Dh)
    acc = acc + p_new * vn_ref[:].astype(jnp.float32)
    o_ref[:] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jnp.ndarray,  # (B, 1, Hq, Dh)
    k_cache: jnp.ndarray,  # (B, Hkv, S, Dh) — bf16/f32 or int8
    v_cache: jnp.ndarray,  # (B, Hkv, S, Dh)
    k_new: jnp.ndarray,  # (B, 1, Hkv, Dh)
    v_new: jnp.ndarray,  # (B, 1, Hkv, Dh)
    pad_lens: jnp.ndarray,  # (B,) int32
    offset: jnp.ndarray,  # scalar int32: next write slot (= #tokens so far)
    k_scale: Optional[jnp.ndarray] = None,  # (B, Hkv, S) iff int8 cache
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, _, Hq, Dh = q.shape
    _, Hkv, S, _ = k_cache.shape
    assert Hq % Hkv == 0
    group = Hq // Hkv
    scale = Dh ** -0.5
    quantized = k_scale is not None

    R = B * Hkv
    bb = _rows_per_program(R, S, Dh, k_cache.dtype.itemsize)

    qg = q.reshape(B, Hkv, group, Dh).reshape(R, group, Dh)
    kn = k_new.astype(q.dtype).reshape(R, 1, Dh)
    vn = v_new.astype(q.dtype).reshape(R, 1, Dh)

    # per-fused-row pad lengths + trailing offset
    pad_rows = jnp.repeat(pad_lens.astype(jnp.int32), Hkv)
    scalars = jnp.concatenate([pad_rows, jnp.asarray(offset, jnp.int32)[None]])

    row_block3 = lambda i, scal: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        seq_len=S,
        rows_per_program=bb,
        quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((bb, group, Dh), row_block3),
        pl.BlockSpec((bb, S, Dh), row_block3),
        pl.BlockSpec((bb, S, Dh), row_block3),
        pl.BlockSpec((bb, 1, Dh), row_block3),
        pl.BlockSpec((bb, 1, Dh), row_block3),
    ]
    operands = [
        scalars,
        qg,
        k_cache.reshape(R, S, Dh) if quantized else k_cache.astype(q.dtype).reshape(R, S, Dh),
        v_cache.reshape(R, S, Dh) if quantized else v_cache.astype(q.dtype).reshape(R, S, Dh),
        kn,
        vn,
    ]
    if quantized:
        # scale kernel args ride as trailing refs
        def kernel_q(scal, q_r, kc, vc, kn_r, vn_r, ks, vs, o_r):
            _decode_kernel(
                scal, q_r, kc, vc, kn_r, vn_r, o_r,
                scale=scale, seq_len=S, rows_per_program=bb, quantized=True,
                ks_ref=ks, vs_ref=vs,
            )

        kernel = kernel_q
        in_specs += [
            pl.BlockSpec((bb, 1, S), row_block3),
            pl.BlockSpec((bb, 1, S), row_block3),
        ]
        operands += [
            k_scale.reshape(R, 1, S),
            v_scale.reshape(R, 1, S),
        ]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // bb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, group, Dh), row_block3),
        ),
        out_shape=jax.ShapeDtypeStruct((R, group, Dh), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, Hkv, group, Dh).reshape(B, 1, Hq, Dh)
