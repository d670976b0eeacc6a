"""Ring attention: sequence-parallel attention over a mesh axis.

The long-audio building block (docs/DESIGN.md; SURVEY.md §2.3 SP/CP row):
when a sequence no longer fits one chip's attention working set, Q/K/V are
sharded along time over a "seq" mesh axis and K/V blocks rotate around the
ring (one ``jax.lax.ppermute`` per step) while each device folds every
visiting block into a running (output, log-sum-exp) state for its local
queries.

Round-3 rework (VERDICT r2 #4):
  * the per-step interior is the Pallas flash kernel
    (kernels/flash_attention.py, offset-mode: visiting K/V blocks live at a
    different global offset than the local queries) — the (Tl, Tl) f32
    logits are never materialized in HBM, so per-device peak memory is
    O(Tl·block) instead of O(Tl²);
  * forward AND backward are explicit ring programs behind a custom VJP —
    no autodiff-through-scan. The backward rotates (k, v, dk, dv) around
    the ring: each device accumulates dq for its local queries while the
    visiting block's dk/dv accumulators collect contributions and arrive
    home after n steps with their full gradients. Classic FlashAttention-2
    math from the saved global LSE (p = exp(s − lse)).
  * non-TPU backends / un-tileable shapes use an XLA blockwise interior
    with identical semantics (the fallback convention every kernel here
    follows); interpret-mode runs the real Pallas interior on CPU for
    parity tests.

The reference needs nothing like this (20 s clip cap ⇒ ≤ ~250 audio
embeds); this op exists so the encoder/LLM can scale to lecture-length
audio. Semantics match ops/attention.py's causal left-padded attention
(tests/test_ring_attention.py, 8-device CPU mesh). ``causal=False`` serves
the (bidirectional) speech-encoder ring (models/hubert.py long-audio path).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.flash_attention import _flash_bwd_impl, _flash_impl, _pick_block

NEG_INF = -1e30


def _pvary(x, axis_name):
    """Mark ``x`` varying over ``axis_name`` across JAX versions:
    ``jax.lax.pvary`` is deprecated in favor of ``pcast(..., to="varying")``
    (DeprecationWarning since 0.9; slated for removal)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, to="varying", axis_name=axis_name)
    return jax.lax.pvary(x, axis_name)


# ---------------------------------------------------------------------------
# per-visiting-block interiors: (o_s normalized f32, lse_s f32) + backward
# ---------------------------------------------------------------------------

def _xla_block_attn(q, k, v, starts, ends, q_off, k_off, causal):
    """XLA interior for one visiting block. Returns
    (o_s (B, Tl, Hq, Dh) f32, lse_s (B, Hq, Tl) f32). Only used off-TPU /
    on un-tileable shapes — it materializes the (B, Hq, Tl, Tl) logits of
    ONE block pair (not the full sequence)."""
    B, Tl, Hq, Dh = q.shape
    Hkv = k.shape[2]
    group = Hq // Hkv
    scale = Dh ** -0.5
    qg = q.reshape(B, Tl, Hkv, group, Dh)
    s = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, Hq, Tl, Tl) * scale
    j = jnp.arange(Tl, dtype=jnp.int32)
    mask = ((j[None, :] >= starts[:, None]) & (j[None, :] < ends[:, None]))[
        :, None, None, :
    ]  # (B,1,1,Tl)
    if causal:
        mask = mask & (
            j[None, None, None, :] + k_off <= j[None, None, :, None] + q_off
        )
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (B, Hq, Tl)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    pg = p.reshape(B, Hkv, group, Tl, Tl)
    pv = jnp.einsum(
        "bhgts,bshd->bhgtd", pg.astype(q.dtype), v.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, Hq, Tl, Dh)
    o = pv / jnp.maximum(l, 1e-30)[..., None]
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    return o.transpose(0, 2, 1, 3), lse


def _xla_block_attn_bwd(q, k, v, g, lse, delta, starts, ends, q_off, k_off, causal):
    """XLA backward for one visiting block: p recomputed from the GLOBAL
    lse (FA-2), returns (dq_c (B,Tl,Hq,Dh), dk_c (B,Tl,Hkv,Dh), dv_c)."""
    B, Tl, Hq, Dh = q.shape
    Hkv = k.shape[2]
    group = Hq // Hkv
    scale = Dh ** -0.5
    qg = q.reshape(B, Tl, Hkv, group, Dh)
    s = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, Hq, Tl, Tl) * scale
    j = jnp.arange(Tl, dtype=jnp.int32)
    mask = ((j[None, :] >= starts[:, None]) & (j[None, :] < ends[:, None]))[
        :, None, None, :
    ]
    if causal:
        mask = mask & (
            j[None, None, None, :] + k_off <= j[None, None, :, None] + q_off
        )
    p = jnp.where(mask, jnp.exp(s - lse[..., None]), 0.0)  # (B, Hq, Tl, Tl)
    gt = g.transpose(0, 2, 1, 3).astype(jnp.float32)  # (B, Hq, Tl, Dh)
    gg = gt.reshape(B, Hkv, group, Tl, Dh)
    dp = jnp.einsum(
        "bhgtd,bshd->bhgts", gg, v.astype(jnp.float32)
    ).reshape(B, Hq, Tl, Tl)
    ds = p * (dp - delta[..., None]) * scale  # (B, Hq, Tl, Tl)
    dsg = ds.reshape(B, Hkv, group, Tl, Tl)
    dq = jnp.einsum("bhgts,bshd->bthgd", dsg, k.astype(jnp.float32)).reshape(
        B, Tl, Hq, Dh
    )
    dk = jnp.einsum(
        "bhgts,bthgd->bshd", dsg, qg.astype(jnp.float32)
    )  # (B, Tl, Hkv, Dh)
    pgf = p.reshape(B, Hkv, group, Tl, Tl)
    dv = jnp.einsum("bhgts,bhgtd->bshd", pgf, gg)
    return dq, dk, dv


def _pallas_block_attn(q, k, v, starts, ends, q_off, k_off, causal, block, interpret):
    B, Tl, Hq, _ = q.shape
    o, lse = _flash_impl(
        q, k, v, starts, ends, causal, block, block, interpret,
        return_lse=True, offsets=(q_off, k_off),
    )
    return o.astype(jnp.float32), lse.reshape(B, Hq, Tl)


def _pallas_block_attn_bwd(
    q, k, v, g, out, lse, starts, ends, q_off, k_off, causal, block, interpret
):
    B, Tl, Hq, _ = q.shape
    return _flash_bwd_impl(
        q, k, v, out, lse.reshape(B * Hq, 1, Tl), g, starts, ends,
        causal, block, block, interpret, offsets=(q_off, k_off),
    )


# ---------------------------------------------------------------------------
# the ring (runs per-device inside shard_map)
# ---------------------------------------------------------------------------

def _ring_fwd(q, k0, v0, starts_g, ends_g, axis_name, causal, interior, block, interpret):
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, Tl, Hq, Dh = q.shape

    o0 = _pvary(jnp.zeros((B, Tl, Hq, Dh), jnp.float32), axis_name)
    lse0 = _pvary(jnp.full((B, Hq, Tl), NEG_INF, jnp.float32), axis_name)

    def step(carry, s):
        o, lse, k, v = carry
        src = (my_idx - s) % n  # which device's block we currently hold
        starts = jnp.clip(starts_g - src * Tl, 0, Tl).astype(jnp.int32)
        ends = jnp.clip(ends_g - src * Tl, 0, Tl).astype(jnp.int32)
        if interior == "pallas":
            o_s, lse_s = _pallas_block_attn(
                q, k, v, starts, ends, my_idx * Tl, src * Tl, causal, block, interpret
            )
        else:
            o_s, lse_s = _xla_block_attn(
                q, k, v, starts, ends, my_idx * Tl, src * Tl, causal
            )
        # online merge of normalized partials via log-sum-exp weights;
        # fully-masked steps carry lse_s ≈ −inf and so weight ≈ 0
        lse_new = jnp.logaddexp(lse, lse_s)
        w_old = jnp.exp(lse - lse_new).transpose(0, 2, 1)[..., None]
        w_new = jnp.exp(lse_s - lse_new).transpose(0, 2, 1)[..., None]
        o = o * w_old + o_s * w_new
        p = [(i, (i + 1) % n) for i in range(n)]
        k = jax.lax.ppermute(k, axis_name, p)
        v = jax.lax.ppermute(v, axis_name, p)
        return (o, lse_new, k, v), None

    (o, lse, _, _), _ = jax.lax.scan(step, (o0, lse0, k0, v0), jnp.arange(n))
    return o.astype(q.dtype), lse


def _ring_bwd_body(q, k0, v0, starts_g, ends_g, out, lse, g,
                   axis_name, causal, interior, block, interpret):
    """Explicit ring backward: dq accumulates locally; (k, v, dk, dv)
    rotate together so each block's gradient accumulators arrive home
    after n steps carrying every device's contribution."""
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, Tl, Hq, Dh = q.shape
    Hkv = k0.shape[2]

    # delta_i = rowsum(dO_i · O_i) in (B, Hq, Tl) layout (FA-2 eq. 19)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)

    dq0 = _pvary(jnp.zeros((B, Tl, Hq, Dh), jnp.float32), axis_name)
    dk0 = _pvary(jnp.zeros((B, Tl, Hkv, Dh), jnp.float32), axis_name)
    dv0 = _pvary(jnp.zeros((B, Tl, Hkv, Dh), jnp.float32), axis_name)

    def step(carry, s):
        dq, dk, dv, k, v = carry
        src = (my_idx - s) % n
        starts = jnp.clip(starts_g - src * Tl, 0, Tl).astype(jnp.int32)
        ends = jnp.clip(ends_g - src * Tl, 0, Tl).astype(jnp.int32)
        if interior == "pallas":
            dq_c, dk_c, dv_c = _pallas_block_attn_bwd(
                q, k, v, g, out, lse, starts, ends, my_idx * Tl, src * Tl,
                causal, block, interpret,
            )
        else:
            dq_c, dk_c, dv_c = _xla_block_attn_bwd(
                q, k, v, g, lse, delta, starts, ends, my_idx * Tl, src * Tl, causal
            )
        dq = dq + dq_c.astype(jnp.float32)
        dk = dk + dk_c.astype(jnp.float32)
        dv = dv + dv_c.astype(jnp.float32)
        p = [(i, (i + 1) % n) for i in range(n)]
        k = jax.lax.ppermute(k, axis_name, p)
        v = jax.lax.ppermute(v, axis_name, p)
        dk = jax.lax.ppermute(dk, axis_name, p)
        dv = jax.lax.ppermute(dv, axis_name, p)
        return (dq, dk, dv, k, v), None

    (dq, dk, dv, _, _), _ = jax.lax.scan(
        step, (dq0, dk0, dv0, k0, v0), jnp.arange(n)
    )
    return dq.astype(q.dtype), dk.astype(k0.dtype), dv.astype(v0.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _ring_core(q, k, v, starts, ends, axis_name, causal, interior, block, interpret):
    out, _ = _ring_fwd(q, k, v, starts, ends, axis_name, causal, interior, block, interpret)
    return out


def _ring_core_fwd(q, k, v, starts, ends, axis_name, causal, interior, block, interpret):
    out, lse = _ring_fwd(q, k, v, starts, ends, axis_name, causal, interior, block, interpret)
    return out, (q, k, v, starts, ends, out, lse)


def _ring_core_bwd(axis_name, causal, interior, block, interpret, res, g):
    q, k, v, starts, ends, out, lse = res
    dq, dk, dv = _ring_bwd_body(
        q, k, v, starts, ends, out, lse, g, axis_name, causal, interior, block, interpret
    )
    zero_i = np.zeros(starts.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_i, zero_i


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    starts: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "data",
    causal: bool = True,
    ends: jnp.ndarray | None = None,
    interior: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel attention (causal or bidirectional).

    q: (B, T, Hq, Dh); k, v: (B, T, Hkv, Dh) — T is sharded over
    ``seq_axis`` of ``mesh``. The valid-key window per sample is
    [starts, ends) in GLOBAL positions: left-padded LLM batches pass
    (pad_lens, None→T); right-padded encoder batches pass (0, n_valid).
    Returns (B, T, Hq, Dh) sharded like q.

    ``interior``: "pallas" (flash kernel per visiting block — O(Tl·block)
    logits memory), "xla" (blockwise einsum — one (Tl, Tl) block at a
    time), or "auto" (pallas on TPU when the local shard is tileable).
    ``interpret=True`` runs the Pallas interior in interpret mode (CPU
    parity tests).
    """
    from jax import shard_map

    n = mesh.shape[seq_axis]
    B, T, Hq, Dh = q.shape
    assert T % n == 0, f"T={T} not divisible by {seq_axis}={n}"
    Tl = T // n
    if interior == "auto":
        tileable = Tl % 16 == 0 and (Dh % 128 == 0 or Dh == 64)
        on_tpu = jax.default_backend() == "tpu"
        interior = "pallas" if (tileable and (on_tpu or interpret)) else "xla"
    block = _pick_block(Tl) if interior == "pallas" else 0

    if ends is None:
        ends = jnp.full((q.shape[0],), T, jnp.int32)
    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        partial(
            _ring_core,
            axis_name=seq_axis,
            causal=causal,
            interior=interior,
            block=block,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None), P(None)),
        out_specs=spec,
        # pallas_call out_shapes carry no varying-mesh-axes annotation, so
        # the vma checker rejects the flash interior; the collectives here
        # are hand-placed (ppermute ring), not inferred — disable the check
        check_vma=False,
    )
    return fn(q, k, v, starts, ends)
