"""Pallas TPU flash-attention (tiled online softmax, GQA, masked windows).

The hot kernel of the KD train step's student and teacher LLM forwards
(run as SEPARATE programs — train/step.py unstacked them so the backward
stays B-wide), generation prefill (infer/generate.py), and the speech
encoders' self-attention. The reference gets attention from torch SDPA
inside HF models (reference: model/audio_llama.py via transformers); here
it is a tiled online-softmax kernel that never materializes the (T, S)
logits in HBM:

  * grid (batch, q-heads, q-blocks); the k/v head is derived from the q
    head (GQA: Hq % Hkv == 0);
  * inner fori_loop over k-blocks up to the causal frontier, with running
    (max, sum) online-softmax state, f32 accumulation;
  * variable lengths enter as per-sample valid windows [start, end):
    left-padded LLM batches pass (pad_len, T), right-padded encoder
    batches pass (0, n_valid). Queries outside the window emit garbage
    rows that callers mask downstream (same contract as ops/attention.py).

Falls back to the XLA reference implementation (ops/attention.py) on
non-TPU backends and un-tileable shapes; parity is tested in interpret
mode (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    scal_ref,  # scalar-prefetch (2B,) int32: [start_0..start_{B-1}, end_0..]
    # (+2 trailing [q_off, k_off] global-position offsets in offset_mode —
    # the ring-attention interior, where the visiting K/V block lives at a
    # different global offset than the local queries)
    q_ref,  # (1, BQ, Dh)
    k_ref,  # (1, S, Dh) full key stream for this (b, kv-head)
    v_ref,  # (1, S, Dh)
    o_ref,  # (1, BQ, Dh)
    *maybe_lse_ref,  # (1, BQ) f32 log-sum-exp per query row (training only)
    block_q: int,
    block_k: int,
    seq_len: int,
    scale: float,
    causal: bool,
    offset_mode: bool = False,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    B = pl.num_programs(0)
    start = scal_ref[b]
    end = scal_ref[B + b]
    q_off = scal_ref[2 * B] if offset_mode else 0
    k_off = scal_ref[2 * B + 1] if offset_mode else 0

    q = q_ref[0]  # (BQ, Dh), native dtype — MXU runs bf16 with f32 accum
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    # causal frontier: last k block any query in this q block can see
    # (offset_mode: the frontier is offset-dependent — loop every block and
    # let the mask decide; ring blocks are one device's Tl, small)
    if causal and not offset_mode:
        num_k_blocks = jax.lax.div(qi * block_q + block_q - 1, block_k) + 1
    else:
        num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (BQ, BK)

        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = (k_pos >= start) & (k_pos < end)
        if causal:
            mask = mask & (k_pos + k_off <= q_pos + q_off)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if maybe_lse_ref:
        # p = exp(s - lse) reproduces the normalized softmax in the backward
        maybe_lse_ref[0][0, 0, :] = m[:, 0] + jnp.log(jnp.maximum(l, 1e-30))[:, 0]


def _xla_reference(q, k, v, starts, ends, causal):
    from ..ops.attention import dot_product_attention, make_attention_bias

    T = q.shape[1]
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = (pos >= starts[:, None]) & (pos < ends[:, None])
    bias = make_attention_bias(valid, valid, causal=causal)
    return dot_product_attention(q, k, v, bias)


def _pick_block(T: int) -> int:
    """Largest tile dividing T — bigger tiles keep the MXU busier per grid
    step (measured ~25% at T=384) while the (b, b) f32 logits tile stays
    ≤ 1 MB of VMEM. Short sequences run as one full-T block: any 16-multiple
    row count is a legal TPU tile (the lane dim is Dh), which lets prefill
    use 64-granular length buckets instead of padding to 128-multiples
    (26% wasted prefill FLOPs on the 10 s-audio workload)."""
    if T <= 512 and T % 16 == 0:
        return T
    for b in (512, 384, 256, 128, 64):
        if T % b == 0:
            return b
    return 128  # flash_attention's divisibility check then falls back to XLA


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    causal: bool = True,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, T, Hq, Dh); k, v: (B, T, Hkv, Dh); starts/ends: (B,) int32.

    Returns (B, T, Hq, Dh). Valid positions per sample are [start, end);
    causal means query i attends keys j <= i. Differentiable: forward AND
    backward are Pallas kernels (FlashAttention-2-style backward from the
    saved per-row log-sum-exp; GQA dk/dv group-summed outside the kernel).
    """
    B, T, Hq, Dh = q.shape
    if jax.default_backend() != "tpu" and not interpret:
        # the documented XLA path for non-TPU backends (module docstring /
        # CLAUDE.md kernel contract) — in-tree callers gate themselves, but
        # external callers of the exported kernel must not crash in Mosaic
        return _xla_reference(q, k, v, starts, ends, causal)
    block_q = block_q or _pick_block(T)
    block_k = block_k or _pick_block(T)
    if block_q % 128 != 0 and block_q != T:
        # LSE/delta blocks are (1, 1, block_q) with block_q on the LANE
        # dim; a multi-block grid slices that dim, and Mosaic requires
        # 128-aligned lane slices — a non-128-multiple block_q (only
        # reachable for T > 512 with T % 128 == 64, e.g. ring shards of a
        # 64-bucketed length) survives ONLY as one full-T block
        if T <= 2048:
            block_q = T
        else:
            return _xla_reference(q, k, v, starts, ends, causal)
    if T % block_q != 0 or T % block_k != 0 or not (Dh % 128 == 0 or Dh == 64):
        # un-tileable shape → XLA reference path
        return _xla_reference(q, k, v, starts, ends, causal)
    return _flash_diff(q, k, v, starts, ends, causal, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_diff(q, k, v, starts, ends, causal, block_q, block_k, interpret):
    return _flash_impl(q, k, v, starts, ends, causal, block_q, block_k, interpret)


def _flash_diff_fwd(q, k, v, starts, ends, causal, block_q, block_k, interpret):
    out, lse = _flash_impl(
        q, k, v, starts, ends, causal, block_q, block_k, interpret, return_lse=True
    )
    return out, (q, k, v, out, lse, starts, ends)


def _flash_diff_bwd(causal, block_q, block_k, interpret, res, g):
    """FlashAttention-2-style backward: two Pallas kernels (dq; dk/dv per
    q-head + XLA group-sum for GQA) recomputing p from the saved LSE —
    round 1 fell back to a full XLA recompute of the attention here, so
    training got the kernel's benefit in forward only."""
    import numpy as np

    q, k, v, out, lse, starts, ends = res
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, out, lse, g, starts, ends, causal, block_q, block_k, interpret
    )
    zero_i = np.zeros(starts.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_i, zero_i


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _bwd_dq_kernel(
    scal_ref,  # (2B,) int32 [starts | ends]
    q_ref,  # (1, BQ, Dh)
    k_ref,  # (1, T, Dh)
    v_ref,  # (1, T, Dh)
    do_ref,  # (1, BQ, Dh)
    lse_ref,  # (1, 1, BQ) f32
    delta_ref,  # (1, 1, BQ) f32 = rowsum(dO * O)
    dq_ref,  # (1, BQ, Dh)
    *,
    block_q: int,
    block_k: int,
    seq_len: int,
    scale: float,
    causal: bool,
    offset_mode: bool = False,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    B = pl.num_programs(0)
    start = scal_ref[b]
    end = scal_ref[B + b]
    q_off = scal_ref[2 * B] if offset_mode else 0
    k_off = scal_ref[2 * B + 1] if offset_mode else 0

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, :][:, None]  # (BQ, 1)
    delta = delta_ref[0, 0, :][:, None]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)

    if causal and not offset_mode:
        num_k_blocks = jax.lax.div(qi * block_q + block_q - 1, block_k) + 1
    else:
        num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(ki, acc):
        kb = k_ref[0, pl.ds(ki * block_k, block_k), :]
        vb = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32) * scale
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = (k_pos >= start) & (k_pos < end)
        if causal:
            mask = mask & (k_pos + k_off <= q_pos + q_off)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # (BQ, BK)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jnp.dot(ds.astype(kb.dtype), kb, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, num_k_blocks, body, jnp.zeros((block_q, q.shape[-1]), jnp.float32)
    )
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    scal_ref,
    k_ref,  # (1, BK, Dh)
    v_ref,  # (1, BK, Dh)
    q_ref,  # (1, T, Dh) full query stream for this (b, q-head)
    do_ref,  # (1, T, Dh)
    lse_ref,  # (1, 1, T) f32
    delta_ref,  # (1, 1, T) f32
    dk_ref,  # (1, BK, Dh) — per q-head; GQA group-sum happens outside
    dv_ref,  # (1, BK, Dh)
    *,
    block_q: int,
    block_k: int,
    seq_len: int,
    scale: float,
    causal: bool,
    offset_mode: bool = False,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    B = pl.num_programs(0)
    start = scal_ref[b]
    end = scal_ref[B + b]
    q_off = scal_ref[2 * B] if offset_mode else 0
    k_off = scal_ref[2 * B + 1] if offset_mode else 0

    kb = k_ref[0]
    vb = v_ref[0]
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    kmask = (k_pos >= start) & (k_pos < end)  # (1, BK)

    num_q_blocks = pl.cdiv(seq_len, block_q)
    if causal and not offset_mode:
        first_q_block = jax.lax.div(ki * block_k, block_q)
    else:
        first_q_block = 0

    def body(qi, carry):
        dk_acc, dv_acc = carry
        qb = q_ref[0, pl.ds(qi * block_q, block_q), :]
        dob = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32) * scale  # (BQ, BK)
        mask = kmask
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            mask = mask & (k_pos + k_off <= q_pos + q_off)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_acc = dv_acc + jnp.dot(
            p.T.astype(dob.dtype), dob, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(dob, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jnp.dot(
            ds.T.astype(qb.dtype), qb, preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_k, kb.shape[-1]), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(first_q_block, num_q_blocks, body, (zeros, zeros))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def _flash_bwd_impl(q, k, v, out, lse, g, starts, ends, causal, block_q, block_k,
                    interpret, offsets=None):
    B, T, Hq, Dh = q.shape
    Hkv = k.shape[2]
    group = Hq // Hkv
    scale = Dh ** -0.5

    qt = q.transpose(0, 2, 1, 3).reshape(B * Hq, T, Dh)
    kt = k.transpose(0, 2, 1, 3).reshape(B * Hkv, T, Dh)
    vt = v.transpose(0, 2, 1, 3).reshape(B * Hkv, T, Dh)
    dot = g.transpose(0, 2, 1, 3).reshape(B * Hq, T, Dh)
    # delta_i = rowsum(dO_i * O_i), the dp→ds correction term (FA-2 eq. 19)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(B * Hq, 1, T)

    parts = [starts.astype(jnp.int32), ends.astype(jnp.int32)]
    if offsets is not None:  # ring interior: [q_off, k_off] global offsets
        parts.append(jnp.stack([jnp.int32(offsets[0]), jnp.int32(offsets[1])]))
    scalars = jnp.concatenate(parts)
    kwargs = dict(
        block_q=block_q, block_k=block_k, seq_len=T, scale=scale, causal=causal,
        offset_mode=offsets is not None,
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kwargs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, T // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0)),
                pl.BlockSpec((1, T, Dh), lambda b, h, i, scal: (b * Hkv + h // group, 0, 0)),
                pl.BlockSpec((1, T, Dh), lambda b, h, i, scal: (b * Hkv + h // group, 0, 0)),
                pl.BlockSpec((1, block_q, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, h, i, scal: (b * Hq + h, 0, i)),
                pl.BlockSpec((1, 1, block_q), lambda b, h, i, scal: (b * Hq + h, 0, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B * Hq, T, Dh), q.dtype),
        interpret=interpret,
    )(scalars, qt, kt, vt, dot, lse, delta)

    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kwargs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, T // block_k),
            in_specs=[
                pl.BlockSpec((1, block_k, Dh), lambda b, h, i, scal: (b * Hkv + h // group, i, 0)),
                pl.BlockSpec((1, block_k, Dh), lambda b, h, i, scal: (b * Hkv + h // group, i, 0)),
                pl.BlockSpec((1, T, Dh), lambda b, h, i, scal: (b * Hq + h, 0, 0)),
                pl.BlockSpec((1, T, Dh), lambda b, h, i, scal: (b * Hq + h, 0, 0)),
                pl.BlockSpec((1, 1, T), lambda b, h, i, scal: (b * Hq + h, 0, 0)),
                pl.BlockSpec((1, 1, T), lambda b, h, i, scal: (b * Hq + h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0)),
                pl.BlockSpec((1, block_k, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * Hq, T, Dh), k.dtype),
            jax.ShapeDtypeStruct((B * Hq, T, Dh), v.dtype),
        ],
        interpret=interpret,
    )(scalars, kt, vt, qt, dot, lse, delta)

    dq = dq.reshape(B, Hq, T, Dh).transpose(0, 2, 1, 3)
    # GQA: per-q-head dk/dv reduce over the group onto the kv head
    dk = dk_h.reshape(B, Hkv, group, T, Dh).sum(2).transpose(0, 2, 1, 3)
    dv = dv_h.reshape(B, Hkv, group, T, Dh).sum(2).transpose(0, 2, 1, 3)
    return dq, dk, dv


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret", "return_lse")
)
def _flash_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
    return_lse: bool = False,
    offsets=None,
):
    B, T, Hq, Dh = q.shape
    Hkv = k.shape[2]
    assert Hq % Hkv == 0
    group = Hq // Hkv
    scale = Dh ** -0.5

    qt = q.transpose(0, 2, 1, 3)  # (B, Hq, T, Dh)
    kt = k.transpose(0, 2, 1, 3)  # (B, Hkv, T, Dh)
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, Hq, T // block_q)
    kernel = functools.partial(
        _flash_kernel,
        block_q=block_q,
        block_k=block_k,
        seq_len=T,
        scale=scale,
        causal=causal,
        offset_mode=offsets is not None,
    )

    parts = [starts.astype(jnp.int32), ends.astype(jnp.int32)]
    if offsets is not None:  # ring interior: [q_off, k_off] global offsets
        parts.append(jnp.stack([jnp.int32(offsets[0]), jnp.int32(offsets[1])]))
    scalars = jnp.concatenate(parts)

    out_specs = pl.BlockSpec((1, block_q, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0))
    out_shape = jax.ShapeDtypeStruct((B * Hq, T, Dh), q.dtype)
    if return_lse:
        # LSE rides as (B*Hq, 1, T) so its (1, 1, block_q) blocks satisfy
        # the TPU (8, 128) last-two-dims tiling rule
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, scal: (b * Hq + h, 0, i)),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((B * Hq, 1, T), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, Dh), lambda b, h, i, scal: (b * Hq + h, i, 0)),
                pl.BlockSpec((1, T, Dh), lambda b, h, i, scal: (b * Hkv + h // group, 0, 0)),
                pl.BlockSpec((1, T, Dh), lambda b, h, i, scal: (b * Hkv + h // group, 0, 0)),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        scalars,
        qt.reshape(B * Hq, T, Dh),
        kt.reshape(B * Hkv, T, Dh),
        vt.reshape(B * Hkv, T, Dh),
    )
    if return_lse:
        out, lse = out
        return out.reshape(B, Hq, T, Dh).transpose(0, 2, 1, 3), lse
    return out.reshape(B, Hq, T, Dh).transpose(0, 2, 1, 3)
