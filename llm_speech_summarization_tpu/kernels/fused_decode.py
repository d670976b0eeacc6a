"""Pallas TPU fused decode attention + in-place quantized cache write.

Round-3 attribution (PERF.md, scripts/bench_decode_gap.py) pinned the
decode step's gap over the bandwidth roofline on per-op SCHEDULING: at
B=128/S=448 the XLA attention chain costs +4.95 ms/step against a ~4.0 ms
KV-stream floor and the quantize+cache-write chain +2.66 ms against a
~0.15 ms write floor — each op family that cannot fuse into the GEMM
stream pays a fixed tax across the 28 sequential layer-scan steps. This
kernel merges the two paying families into ONE Pallas program per layer:

  * the full (L, B, Hkv, S, Dh) KV VALUE buffers stay in HBM (ANY memory
    space) and are ALIASED in place (``input_output_aliases``) — the
    decode scan threads the same buffers through every layer, zero copies;
  * value reads are fat manual DMAs — one (bs, Hkv, S, Dh) slab per
    buffer per program, cross-program double-buffered (program i issues
    program i+1's slabs before waiting on its own);
  * attention is the dense single-shot softmax of the XLA oracle
    (models/llama.py ``decode_xla_q``), per-slot validity arithmetic
    ``pad[b] <= s < offset[b]``, int8 dequant in-register;
  * the fresh k/v token is quantized in-register (bit-matching
    models/llama.py::_quantize_kv) and written back as a 32-aligned
    (Hkv, 32, Dh) WINDOW around each row's write slot — Mosaic rejects
    height-1 and unaligned dynamic-sublane DMA slices (probed on chip;
    ``pl.multiple_of`` on the window start is required), and the window's
    other 31 rows rewrite bytes already resident in VMEM, so correctness
    is free and the extra write traffic is ~8 MB/layer against a 117 MB
    stream.

Scale handling is asymmetric by necessity: the per-slot scale slabs'
LANE dim is S, and Mosaic requires lane-dim DMA slices 128-aligned — at
the production S=448 a manual scale DMA cannot compile (measured: "Slice
shape along dimension 3 must be aligned to tiling (128), but is 448").
So scales READ through the auto-pipelined BlockSpec path (which pads
transparently, like the dense decode kernel's (bb, 1, S) scale blocks)
and the fresh token's scales EXIT as small per-row value outputs that the
caller scatters with one tiny XLA dynamic-update-slice per layer — the
scale slabs ride the decode scan as xs/ys (~1.8 MB/layer), not as
aliased carry. Round 5 (VERDICT r4 #8) built the aliased alternative
(``fused_decode_aliased_scales``: lane-padded slabs, manual DMAs, in-VMEM
merge, in-place write-back) and it MEASURES FASTER — 11.6 vs 12.5
ms/step at the B=128/S=448 int8 point (alternating-run confirmed;
PERF.md round-5 scale-slab section) — so it is now the DEFAULT for
quantized caches (models/llama.py decode_fused); the xs/ys design stays
selectable via LSS_FUSED_ALIASED_SCALES=0.

The reference's decode loop runs one HF forward per token with eager
cache appends (reference: inference.py:55-74); this kernel replaces its
hot inner step. XLA fallback/oracle: ``fused_reference`` (parity-tested
in interpret mode and used on non-TPU backends / unaligned shapes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., Dh) f32 → (int8, f32 scale); mirrors models/llama.py::_quantize_kv
    (absmax/127 floor 1e-8, round, clip) so cache contents stay bit-identical
    with the XLA write path."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def fused_reference(
    q, k_cache, v_cache, k_new, v_new, pad_lens, offsets, layer,
    k_scale_layer=None, v_scale_layer=None,
):
    """XLA oracle: decode_xla_q-equivalent attention + _quantize_kv-exact
    value writes at ``offsets`` into layer ``layer``. Handles T >= 1 fresh
    tokens: T == 1 is the plain decode step; T == k+1 is the speculative
    VERIFICATION forward (infer/slots.py spec decode) — every query
    attends the cache window [pad, offset) plus the fresh tokens causally
    within the block, and all T fresh tokens are written at
    [offset, offset+T). Scales for THIS layer arrive as (B, Hkv, S)
    slabs; the fresh tokens' scales return as (B, Hkv, T) bf16 values
    (the caller owns the slab scatter). Returns
    (out, k_cache, v_cache[, ks_new, vs_new]) like the kernel."""
    B, T, Hq, Dh = q.shape
    L, _, Hkv, S, _ = k_cache.shape
    group = Hq // Hkv
    quantized = k_scale_layer is not None
    kc = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vc = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)

    qg = q.reshape(B, T, Hkv, group, Dh)
    s_c = jnp.einsum(
        "bthgd,bhsd->bthgs", qg, kc.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    if quantized:
        s_c = s_c * k_scale_layer[:, None, :, None, :].astype(jnp.float32)
    s_c = s_c * (Dh ** -0.5)
    slot = jnp.arange(S, dtype=jnp.int32)
    valid = (slot[None, :] >= pad_lens[:, None]) & (slot[None, :] < offsets[:, None])
    s_c = jnp.where(valid[:, None, None, None, :], s_c, NEG_INF)
    s_f = jnp.einsum(
        "bthgd,bshd->bthgs", qg, k_new.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (Dh ** -0.5)
    # query t attends fresh token j iff j <= t (causal within the block;
    # every fresh token is REAL — the fused contract, attn_mask=None)
    causal = jnp.arange(T)[:, None] >= jnp.arange(T)[None, :]  # (Tq, Tk)
    s_f = jnp.where(causal[None, :, None, None, :], s_f, NEG_INF)
    m = jnp.maximum(
        jnp.max(s_c, axis=-1, keepdims=True), jnp.max(s_f, axis=-1, keepdims=True)
    )
    p_c = jnp.exp(s_c - m)
    p_f = jnp.exp(s_f - m)
    denom = jnp.sum(p_c, axis=-1, keepdims=True) + jnp.sum(p_f, axis=-1, keepdims=True)
    p_eff = (
        p_c * v_scale_layer[:, None, :, None, :].astype(jnp.float32)
        if quantized
        else p_c
    )
    pv = jnp.einsum(
        "bthgs,bhsd->bthgd", p_eff.astype(q.dtype), vc.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    pv = pv + jnp.einsum(
        "bthgs,bshd->bthgd", p_f.astype(q.dtype), v_new.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    out = (pv / denom).reshape(B, T, Hq, Dh).astype(q.dtype)

    # write the T fresh tokens at [offset, offset+T) (layer `layer` only)
    kn = k_new.astype(jnp.float32).transpose(0, 2, 1, 3)  # (B, Hkv, T, Dh)
    vn = v_new.astype(jnp.float32).transpose(0, 2, 1, 3)

    def write_row(buf_l, new, off):  # buf_l (Hkv, S, Dh), new (Hkv, T, Dh)
        return jax.lax.dynamic_update_slice(
            buf_l, new.astype(buf_l.dtype), (0, off, 0)
        )

    if quantized:
        kq, ks = _quantize_rows(kn)
        vq, vs = _quantize_rows(vn)
        kc2 = jax.vmap(write_row)(kc, kq, offsets)
        vc2 = jax.vmap(write_row)(vc, vq, offsets)
        return (
            out,
            jax.lax.dynamic_update_index_in_dim(k_cache, kc2.astype(k_cache.dtype), layer, 0),
            jax.lax.dynamic_update_index_in_dim(v_cache, vc2.astype(v_cache.dtype), layer, 0),
            ks[..., 0].astype(jnp.bfloat16),  # (B, Hkv, T)
            vs[..., 0].astype(jnp.bfloat16),
        )
    kc2 = jax.vmap(write_row)(kc, kn, offsets)
    vc2 = jax.vmap(write_row)(vc, vn, offsets)
    return (
        out,
        jax.lax.dynamic_update_index_in_dim(k_cache, kc2.astype(k_cache.dtype), layer, 0),
        jax.lax.dynamic_update_index_in_dim(v_cache, vc2.astype(v_cache.dtype), layer, 0),
    )


WINDOW = 32  # value write-back window (≥ int8 sublane packing, divides S)


def _fused_kernel(
    scal_ref,  # (2B+1,) int32: [pads | offsets | layer]
    q_ref,  # (bb, G, Dh) VMEM
    kn_ref,  # (bb, 1, Dh) VMEM fresh key (bf16)
    vn_ref,  # (bb, 1, Dh) VMEM fresh value
    k_hbm,  # (L, B, Hkv, S, Dh) ANY — aliased in-place
    v_hbm,
    *rest,  # [ks_ref, vs_ref (bb,1,S) VMEM] o_ref, ko/vo_hbm, [ksn/vsn out] scratch...
    bs: int,
    Hkv: int,
    S: int,
    G: int,
    scale: float,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        (o_ref, ko_hbm, vo_hbm, ksn_ref, vsn_ref,
         k_buf, v_buf, rsem, kw_st, vw_st, wsem) = rest[2:]
    else:
        ks_ref = vs_ref = ksn_ref = vsn_ref = None
        (o_ref, ko_hbm, vo_hbm, k_buf, v_buf, rsem, kw_st, vw_st, wsem) = rest

    i = pl.program_id(0)
    n = pl.num_programs(0)
    B = n * bs
    bb = bs * Hkv
    Dh = q_ref.shape[-1]
    li = scal_ref[2 * B]

    def rd(t, slot):
        b0 = t * bs
        return [
            pltpu.make_async_copy(
                k_hbm.at[li, pl.ds(b0, bs)], k_buf.at[slot], rsem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_hbm.at[li, pl.ds(b0, bs)], v_buf.at[slot], rsem.at[slot, 1]
            ),
        ]

    @pl.when(i == 0)
    def _():
        for c in rd(0, 0):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in rd(i + 1, (i + 1) % 2):
            c.start()

    slot = i % 2
    for c in rd(i, slot):
        c.wait()

    q = q_ref[:]  # (bb, G, Dh)
    k = k_buf[slot].reshape(bb, S, Dh)
    v = v_buf[slot].reshape(bb, S, Dh)
    s = jax.lax.dot_general(
        q, k.astype(q.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, G, S)
    if quantized:
        s = s * ks_ref[:].astype(jnp.float32)  # (bb, 1, S) broadcast
    s = s * scale

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    masks = [
        (pos >= scal_ref[(i * bs + r // Hkv)])
        & (pos < scal_ref[B + (i * bs + r // Hkv)])
        for r in range(bb)
    ]
    valid = jnp.stack(masks, axis=0)  # (bb, 1, S)
    s = jnp.where(valid, s, NEG_INF)

    s_new = jax.lax.dot_general(
        q, kn_ref[:].astype(q.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (bb, G, 1)

    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
    p = jnp.exp(s - m)
    p_new = jnp.exp(s_new - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
    if quantized:
        p = p * vs_ref[:].astype(jnp.float32)
    acc = jax.lax.dot_general(
        p.astype(q.dtype), v.astype(q.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc = acc + p_new * vn_ref[:].astype(jnp.float32)
    o_ref[:] = (acc / denom).astype(o_ref.dtype)

    # ---- quantize the fresh token and write the VALUES back in place ----
    kn_f = kn_ref[:].astype(jnp.float32)  # (bb, 1, Dh)
    vn_f = vn_ref[:].astype(jnp.float32)
    if quantized:
        kq, ksn = _quantize_rows(kn_f)  # (bb, 1, Dh) int8, (bb, 1, 1) f32
        vq, vsn = _quantize_rows(vn_f)
        ksn_ref[:] = jax.lax.broadcast_in_dim(
            ksn.astype(jnp.float32), ksn_ref.shape, (0, 1, 2)
        )
        vsn_ref[:] = jax.lax.broadcast_in_dim(
            vsn.astype(jnp.float32), vsn_ref.shape, (0, 1, 2)
        )
        kq = kq.reshape(bs, Hkv, 1, Dh)
        vq = vq.reshape(bs, Hkv, 1, Dh)
    else:
        kq = kn_f.astype(k_buf.dtype).reshape(bs, Hkv, 1, Dh)
        vq = vn_f.astype(v_buf.dtype).reshape(bs, Hkv, 1, Dh)

    # Deferred write pipeline: program i's window writes drain while
    # programs i+1 / i+2 compute — i waits i-2's writes (same staging
    # parity) BEFORE restaging, and the last two programs drain their own
    # so no DMA outlives the kernel.
    def wr_descs(t, parity):
        descs = []
        for r in range(bs):
            off_t = scal_ref[B + t * bs + r]
            # clamp keeps the window in-bounds if a caller ever passes
            # offsets == S (full cache; contract says offsets < S — the
            # fresh token is then silently dropped rather than an
            # out-of-bounds DMA with unspecified Mosaic behavior)
            w0_t = pl.multiple_of(
                jnp.minimum((off_t // WINDOW) * WINDOW, S - WINDOW), WINDOW
            )
            b_t = t * bs + r
            for j, (st, dst) in enumerate(((kw_st, ko_hbm), (vw_st, vo_hbm))):
                descs.append(
                    pltpu.make_async_copy(
                        st.at[parity, r],
                        dst.at[li, b_t, :, pl.ds(w0_t, WINDOW), :],
                        wsem.at[parity, r, j],
                    )
                )
        return descs

    par = i % 2

    @pl.when(i >= 2)
    def _():
        for c in wr_descs(i - 2, par):
            c.wait()

    win_iota = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW, 1), 1)
    for r in range(bs):
        off = scal_ref[B + i * bs + r]
        w0 = pl.multiple_of(
            jnp.minimum((off // WINDOW) * WINDOW, S - WINDOW), WINDOW
        )
        sel = win_iota == (off - w0)  # (1, WINDOW, 1)
        old_k = k_buf[slot, r, :, pl.ds(w0, WINDOW), :]  # (Hkv, WINDOW, Dh)
        old_v = v_buf[slot, r, :, pl.ds(w0, WINDOW), :]
        kw_st[par, r] = jnp.where(sel, kq[r], old_k)
        vw_st[par, r] = jnp.where(sel, vq[r], old_v)
    for c in wr_descs(i, par):
        c.start()

    @pl.when(i >= n - 2)
    def _():
        for c in wr_descs(i, par):
            c.wait()


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def fused_reference_aliased(
    q, k_cache, v_cache, k_new, v_new, pad_lens, offsets, layer,
    k_scales, v_scales,
):
    """XLA oracle for the aliased-scale mode: identical math to
    ``fused_reference`` with the fresh scales scattered into the PADDED
    (L, B, Hkv, Spad) slabs instead of returned. T >= 1 fresh tokens
    scatter at [offset, offset+T). Returns
    (out, k_cache, v_cache, k_scales, v_scales)."""
    S = k_cache.shape[3]
    B, T = q.shape[0], q.shape[1]
    ksl = jax.lax.dynamic_index_in_dim(k_scales, layer, 0, keepdims=False)
    vsl = jax.lax.dynamic_index_in_dim(v_scales, layer, 0, keepdims=False)
    out, kc2, vc2, ksn, vsn = fused_reference(
        q, k_cache, v_cache, k_new, v_new, pad_lens, offsets, layer,
        k_scale_layer=ksl[..., :S], v_scale_layer=vsl[..., :S],
    )
    # advanced indices (B, 1) and (B, T) on axes 0/2 broadcast to (B, T);
    # the head slice between them moves the result axes to the front, so
    # the update operand is (B, T, Hkv)
    rows = jnp.arange(B)[:, None]
    cols = offsets[:, None] + jnp.arange(T, dtype=offsets.dtype)[None, :]
    ks2 = ksl.at[rows, :, cols].set(
        ksn.transpose(0, 2, 1).astype(k_scales.dtype)
    )
    vs2 = vsl.at[rows, :, cols].set(
        vsn.transpose(0, 2, 1).astype(v_scales.dtype)
    )
    return (
        out, kc2, vc2,
        jax.lax.dynamic_update_index_in_dim(k_scales, ks2, layer, 0),
        jax.lax.dynamic_update_index_in_dim(v_scales, vs2, layer, 0),
    )


def _fused_kernel_aliased(
    scal_ref,  # (2B+1,) int32: [pads | offsets | layer]
    q_ref,  # (bb, T*G, Dh) VMEM
    kn_ref,  # (bb, T, Dh) VMEM fresh key(s)
    vn_ref,  # (bb, T, Dh) VMEM fresh value(s)
    k_hbm,  # (L, B, Hkv, S, Dh) int8 ANY — aliased in place
    v_hbm,
    ks_hbm,  # (L, B, Hkv, Spad) bf16 ANY — aliased in place
    vs_hbm,
    o_ref,  # (bb, T*G, Dh) VMEM out
    ko_hbm,  # aliased outputs
    vo_hbm,
    kso_hbm,
    vso_hbm,
    k_buf,  # (2, bs, Hkv, S, Dh) VMEM scratch
    v_buf,
    ksc_buf,  # (2, bs, Hkv, Spad) VMEM scratch
    vsc_buf,
    rsem,  # (2, 4) DMA sems
    kw_st,  # (2, bs, Hkv, W, Dh) value write staging
    vw_st,
    ksw_st,  # (2, bs, Hkv, Spad) merged scale staging
    vsw_st,
    wsem,  # (2, bs, 2) value-window write sems
    ssem,  # (2, 2) scale-slab write sems
    *,
    bs: int,
    Hkv: int,
    S: int,
    G: int,
    T: int,
    W: int,
    scale: float,
):
    """Aliased-scale variant of ``_fused_kernel`` (VERDICT r4 #8): the
    scale slabs' lane dim is padded to a 128 multiple so they can ride the
    decode scan as aliased carry exactly like the values — manual
    double-buffered DMA reads, in-VMEM fresh-scale merge, one whole-slab
    write-back per program (~65 KB against the layer's 117 MB value
    stream). This removes the per-layer xs/ys scale threading AND the
    caller's dense one-hot merge from the scan body.

    Round 5: generalized to T >= 1 fresh tokens (VERDICT r4 weak #2's
    last uncovered surface — the speculative VERIFICATION forward,
    infer/slots.py spec decode): query rows carry T*G sublanes ordered
    (t, g), the fresh block is attended causally (j <= t), and all T
    quantized tokens merge into one W-wide write window at
    [offset, offset+T) — W is sized so any offset alignment fits
    (W = WINDOW·ceil((WINDOW-1+T)/WINDOW))."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    B = n * bs
    bb = bs * Hkv
    Spad = ksc_buf.shape[-1]
    li = scal_ref[2 * B]

    def rd(t, slot):
        b0 = t * bs
        return [
            pltpu.make_async_copy(
                k_hbm.at[li, pl.ds(b0, bs)], k_buf.at[slot], rsem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_hbm.at[li, pl.ds(b0, bs)], v_buf.at[slot], rsem.at[slot, 1]
            ),
            pltpu.make_async_copy(
                ks_hbm.at[li, pl.ds(b0, bs)], ksc_buf.at[slot], rsem.at[slot, 2]
            ),
            pltpu.make_async_copy(
                vs_hbm.at[li, pl.ds(b0, bs)], vsc_buf.at[slot], rsem.at[slot, 3]
            ),
        ]

    @pl.when(i == 0)
    def _():
        for c in rd(0, 0):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in rd(i + 1, (i + 1) % 2):
            c.start()

    slot = i % 2
    for c in rd(i, slot):
        c.wait()

    q = q_ref[:]  # (bb, T*G, Dh)
    Dh = q_ref.shape[-1]
    k = k_buf[slot].reshape(bb, S, Dh)
    v = v_buf[slot].reshape(bb, S, Dh)
    s = jax.lax.dot_general(
        q, k.astype(q.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, T*G, S)
    ks_slab = ksc_buf[slot].reshape(bb, 1, Spad)
    vs_slab = vsc_buf[slot].reshape(bb, 1, Spad)
    s = s * ks_slab[:, :, :S].astype(jnp.float32)
    s = s * scale

    # cache validity [pad, offset) is per ROW only — the fresh tokens are
    # not in the cache, so all T queries share the same cache mask
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    masks = [
        (pos >= scal_ref[(i * bs + r // Hkv)])
        & (pos < scal_ref[B + (i * bs + r // Hkv)])
        for r in range(bb)
    ]
    valid = jnp.stack(masks, axis=0)  # (bb, 1, S)
    s = jnp.where(valid, s, NEG_INF)

    s_new = jax.lax.dot_general(
        q, kn_ref[:].astype(q.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (bb, T*G, T)
    if T > 1:
        # causal within the fresh block: query row (t, g) attends fresh
        # token j iff j <= t (static mask — rows are ordered t-major)
        rq = jax.lax.broadcasted_iota(jnp.int32, (T * G, T), 0) // G
        cj = jax.lax.broadcasted_iota(jnp.int32, (T * G, T), 1)
        s_new = jnp.where((rq >= cj)[None], s_new, NEG_INF)

    m = jnp.maximum(
        jnp.max(s, axis=-1, keepdims=True),
        jnp.max(s_new, axis=-1, keepdims=True),
    )
    p = jnp.exp(s - m)
    p_new = jnp.exp(s_new - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.sum(
        p_new, axis=-1, keepdims=True
    )
    p = p * vs_slab[:, :, :S].astype(jnp.float32)
    acc = jax.lax.dot_general(
        p.astype(q.dtype), v.astype(q.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        p_new.astype(q.dtype), vn_ref[:].astype(q.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc / denom).astype(o_ref.dtype)

    # ---- quantize the fresh token(s); write values (window) + scales (slab)
    kq, ksn = _quantize_rows(kn_ref[:].astype(jnp.float32))  # (bb,T,Dh),(bb,T,1)
    vq, vsn = _quantize_rows(vn_ref[:].astype(jnp.float32))
    kq = kq.reshape(bs, Hkv, T, Dh)
    vq = vq.reshape(bs, Hkv, T, Dh)

    def wr_descs(t, parity):
        descs = []
        for r in range(bs):
            off_t = scal_ref[B + t * bs + r]
            w0_t = pl.multiple_of(
                jnp.minimum((off_t // WINDOW) * WINDOW, S - W), WINDOW
            )
            b_t = t * bs + r
            for j, (st, dst) in enumerate(((kw_st, ko_hbm), (vw_st, vo_hbm))):
                descs.append(
                    pltpu.make_async_copy(
                        st.at[parity, r],
                        dst.at[li, b_t, :, pl.ds(w0_t, W), :],
                        wsem.at[parity, r, j],
                    )
                )
        b0_t = t * bs
        descs.append(
            pltpu.make_async_copy(
                ksw_st.at[parity], kso_hbm.at[li, pl.ds(b0_t, bs)],
                ssem.at[parity, 0],
            )
        )
        descs.append(
            pltpu.make_async_copy(
                vsw_st.at[parity], vso_hbm.at[li, pl.ds(b0_t, bs)],
                ssem.at[parity, 1],
            )
        )
        return descs

    par = i % 2

    @pl.when(i >= 2)
    def _():
        for c in wr_descs(i - 2, par):
            c.wait()

    win_iota = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    for r in range(bs):
        off = scal_ref[B + i * bs + r]
        w0 = pl.multiple_of(
            jnp.minimum((off // WINDOW) * WINDOW, S - W), WINDOW
        )
        cur_k = k_buf[slot, r, :, pl.ds(w0, W), :]  # (Hkv, W, Dh)
        cur_v = v_buf[slot, r, :, pl.ds(w0, W), :]
        for j in range(T):  # T static, small (1 or spec_k+1)
            sel = win_iota == (off - w0 + j)  # (1, W, 1)
            cur_k = jnp.where(sel, kq[r, :, j : j + 1, :], cur_k)
            cur_v = jnp.where(sel, vq[r, :, j : j + 1, :], cur_v)
        kw_st[par, r] = cur_k
        vw_st[par, r] = cur_v
    # merged scale slabs: one elementwise select over (bs, Hkv, Spad) per
    # fresh token — offsets+T <= S < Spad, so pad lanes keep their resident
    # (finite) values. Per-row scalar-vs-iota compares stacked, NOT a (bs,)
    # vector reshaped to (bs,1,1): Mosaic rejects that shape cast
    # ("infer-vector-layout: unsupported shape cast tpu.reshape
    # vector<bs xi32> -> bs x1x1")
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Spad), 1)
    ksn_r = ksn.reshape(bs, Hkv, T)
    vsn_r = vsn.reshape(bs, Hkv, T)
    ks_merged = ksc_buf[slot]
    vs_merged = vsc_buf[slot]
    for j in range(T):
        hit = jnp.stack(
            [lane == scal_ref[B + i * bs + r] + j for r in range(bs)], axis=0
        )  # (bs, 1, Spad)
        ks_merged = jnp.where(
            hit, ksn_r[:, :, j : j + 1].astype(ksw_st.dtype), ks_merged
        )
        vs_merged = jnp.where(
            hit, vsn_r[:, :, j : j + 1].astype(vsw_st.dtype), vs_merged
        )
    ksw_st[par] = ks_merged
    vsw_st[par] = vs_merged
    for c in wr_descs(i, par):
        c.start()

    @pl.when(i >= n - 2)
    def _():
        for c in wr_descs(i, par):
            c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_aliased_scales(
    q: jnp.ndarray,  # (B, T, Hq, Dh), T >= 1
    k_cache: jnp.ndarray,  # (L, B, Hkv, S, Dh) int8
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, T, Hkv, Dh)
    v_new: jnp.ndarray,
    pad_lens: jnp.ndarray,  # (B,) int32
    offsets: jnp.ndarray,  # (B,) int32, offsets + T <= S (base-kernel contract)
    layer: jnp.ndarray,  # scalar int32
    k_scales: jnp.ndarray,  # (L, B, Hkv, Spad) bf16, Spad = pad128(S) — ALIASED
    v_scales: jnp.ndarray,
    interpret: bool = False,
):
    """Aliased-scale fused decode (VERDICT r4 #8): like
    ``fused_decode_attention_write`` but the int8 scale slabs are padded to
    a 128-multiple lane dim and aliased in place alongside the values, so
    the decode scan threads NO scale xs/ys and performs NO post-kernel
    merge. Callers pad the (L, B, Hkv, S) slabs once per step
    (models/llama.py decode_fused path) and slice back after the scan.

    T == 1 is the plain decode step; T == spec_k+1 is the speculative
    VERIFICATION forward (infer/slots.py spec decode): each query attends
    the cache window [pad, offset) plus the fresh tokens causally, and
    all T tokens are quantized + written at [offset, offset+T) in place
    (the scheduler overwrites the rejected tail next round). Returns
    (out, k_cache, v_cache, k_scales, v_scales) — all four cache
    operands are consumed (donated)."""
    B, T, Hq, Dh = q.shape
    L, _, Hkv, S, _ = k_cache.shape
    Spad = k_scales.shape[-1]
    assert T >= 1 and Hq % Hkv == 0
    assert Spad == _pad128(S), (Spad, S)
    group = Hq // Hkv
    # write window sized so [offset, offset+T) fits for any offset%WINDOW
    W = WINDOW * ((WINDOW - 1 + T + WINDOW - 1) // WINDOW)

    aligned = Dh % 128 == 0 and S % WINDOW == 0 and S >= W
    if (jax.default_backend() != "tpu" or not aligned) and not interpret:
        return fused_reference_aliased(
            q, k_cache, v_cache, k_new, v_new, pad_lens, offsets, layer,
            k_scales, v_scales,
        )

    bs = _pick_bs(B, Hkv, S, Dh, k_cache.dtype.itemsize)
    bb = bs * Hkv
    R = B * Hkv

    # rows ordered (b, h); sublanes ordered (t, g) — the kernel's causal
    # fresh mask indexes t as sublane // G
    qg = (
        q.reshape(B, T, Hkv, group, Dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(R, T * group, Dh)
    )
    kn = k_new.astype(q.dtype).transpose(0, 2, 1, 3).reshape(R, T, Dh)
    vn = v_new.astype(q.dtype).transpose(0, 2, 1, 3).reshape(R, T, Dh)
    scalars = jnp.concatenate(
        [
            pad_lens.astype(jnp.int32),
            offsets.astype(jnp.int32),
            jnp.asarray(layer, jnp.int32)[None],
        ]
    )

    row_block = lambda i, scal: (i, 0, 0)  # noqa: E731
    kernel = functools.partial(
        _fused_kernel_aliased, bs=bs, Hkv=Hkv, S=S, G=group, T=T, W=W,
        scale=Dh ** -0.5,
    )
    in_specs = [
        pl.BlockSpec((bb, T * group, Dh), row_block),
        pl.BlockSpec((bb, T, Dh), row_block),
        pl.BlockSpec((bb, T, Dh), row_block),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [scalars, qg, kn, vn, k_cache, v_cache, k_scales, v_scales]
    out_shape = [
        jax.ShapeDtypeStruct((R, T * group, Dh), q.dtype),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
        jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
    ]
    out_specs = [
        pl.BlockSpec((bb, T * group, Dh), row_block),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # operand indices incl. scalar-prefetch arg 0: k_cache=4 ... v_scales=7
    aliases = {4: 1, 5: 2, 6: 3, 7: 4}
    cache_dt = k_cache.dtype
    scale_dt = k_scales.dtype
    Spad_ = Spad
    scratch = [
        pltpu.VMEM((2, bs, Hkv, S, Dh), cache_dt),  # k_buf
        pltpu.VMEM((2, bs, Hkv, S, Dh), cache_dt),  # v_buf
        pltpu.VMEM((2, bs, Hkv, Spad_), scale_dt),  # ksc_buf
        pltpu.VMEM((2, bs, Hkv, Spad_), scale_dt),  # vsc_buf
        pltpu.SemaphoreType.DMA((2, 4)),  # rsem
        pltpu.VMEM((2, bs, Hkv, W, Dh), cache_dt),  # kw_st
        pltpu.VMEM((2, bs, Hkv, W, Dh), cache_dt),  # vw_st
        pltpu.VMEM((2, bs, Hkv, Spad_), scale_dt),  # ksw_st
        pltpu.VMEM((2, bs, Hkv, Spad_), scale_dt),  # vsw_st
        pltpu.SemaphoreType.DMA((2, bs, 2)),  # wsem
        pltpu.SemaphoreType.DMA((2, 2)),  # ssem
    ]

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // bs,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
    out = (
        outs[0]
        .reshape(B, Hkv, T, group, Dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, T, Hq, Dh)
    )
    return (out,) + tuple(outs[1:])


def _pick_bs(B: int, Hkv: int, S: int, Dh: int, itemsize: int) -> int:
    """Largest bs in {8,4,2,1} dividing B whose double-buffered K+V slabs
    fit ~9 MB of VMEM."""
    budget = 9 * 1024 * 1024
    for bs in (8, 4, 2, 1):
        if B % bs == 0 and 4 * bs * Hkv * S * Dh * itemsize <= budget:
            return bs
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention_write(
    q: jnp.ndarray,  # (B, 1, Hq, Dh)
    k_cache: jnp.ndarray,  # (L, B, Hkv, S, Dh) int8 or bf16/f32
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, 1, Hkv, Dh) fresh post-rope key
    v_new: jnp.ndarray,
    pad_lens: jnp.ndarray,  # (B,) int32: valid slots are [pad, offset)
    offsets: jnp.ndarray,  # (B,) int32: this token's write slot
    layer: jnp.ndarray,  # scalar int32
    k_scale_layer: Optional[jnp.ndarray] = None,  # (B, Hkv, S) bf16 iff int8
    v_scale_layer: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """One decode step's attention over layer ``layer`` of a dense KV cache
    PLUS the quantized in-place write of the fresh token's VALUES — one
    Pallas program instead of XLA's two unfusable op chains. The value
    buffers are aliased: callers must treat them as consumed (the decode
    scan threads them as carry). Scale slabs are read-only here; the
    fresh scales return as (B, Hkv) bf16 for the caller's per-layer
    scatter. Contract: ``offsets`` must be < S (a decode step always has a
    free slot to write) — the kernel clamps its write window in-bounds at
    offsets == S (fresh token dropped) where the XLA oracle's
    dynamic_update_slice would clamp to slot S-1, so kernel and fallback
    diverge past the contract. Also assumes every fresh token is REAL: the
    fused path has no fresh-token attn_mask (models/llama.py only selects
    it when the caller passed attn_mask=None). Returns
    (out (B, 1, Hq, Dh), k_cache, v_cache[, ks_new, vs_new])."""
    B, T, Hq, Dh = q.shape
    L, _, Hkv, S, _ = k_cache.shape
    assert T == 1 and Hq % Hkv == 0
    group = Hq // Hkv
    quantized = k_scale_layer is not None

    aligned = Dh % 128 == 0 and S % WINDOW == 0
    if (jax.default_backend() != "tpu" or not aligned) and not interpret:
        res = fused_reference(
            q, k_cache, v_cache, k_new, v_new, pad_lens, offsets, layer,
            k_scale_layer=k_scale_layer, v_scale_layer=v_scale_layer,
        )
        if quantized:  # oracle returns (B, Hkv, T) scales; T == 1 here
            return res[0], res[1], res[2], res[3][..., 0], res[4][..., 0]
        return res

    bs = _pick_bs(B, Hkv, S, Dh, k_cache.dtype.itemsize)
    bb = bs * Hkv
    R = B * Hkv

    qg = q.reshape(B, Hkv, group, Dh).reshape(R, group, Dh)
    kn = k_new.astype(q.dtype).transpose(0, 2, 1, 3).reshape(R, 1, Dh)
    vn = v_new.astype(q.dtype).transpose(0, 2, 1, 3).reshape(R, 1, Dh)
    scalars = jnp.concatenate(
        [
            pad_lens.astype(jnp.int32),
            offsets.astype(jnp.int32),
            jnp.asarray(layer, jnp.int32)[None],
        ]
    )

    row_block = lambda i, scal: (i, 0, 0)  # noqa: E731
    kernel = functools.partial(
        _fused_kernel, bs=bs, Hkv=Hkv, S=S, G=group,
        scale=Dh ** -0.5, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((bb, group, Dh), row_block),
        pl.BlockSpec((bb, 1, Dh), row_block),
        pl.BlockSpec((bb, 1, Dh), row_block),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [scalars, qg, kn, vn, k_cache, v_cache]
    out_shape = [
        jax.ShapeDtypeStruct((R, group, Dh), q.dtype),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    out_specs = [
        pl.BlockSpec((bb, group, Dh), row_block),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # operand indices (incl. scalar-prefetch arg 0): k_cache=4, v_cache=5
    aliases = {4: 1, 5: 2}
    cache_dt = k_cache.dtype
    if quantized:
        # scale slabs read through the auto-pipelined BlockSpec path
        # (manual lane-dim DMAs need 128-aligned extents; S=448 is not)
        in_specs += [
            pl.BlockSpec((bb, 1, S), row_block),
            pl.BlockSpec((bb, 1, S), row_block),
        ]
        operands += [
            k_scale_layer.reshape(R, 1, S),
            v_scale_layer.reshape(R, 1, S),
        ]
        # fresh scales exit lane-broadcast to 128 (1-lane output blocks
        # are fragile); the caller slices [:, 0, 0]
        out_shape += [
            jax.ShapeDtypeStruct((R, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 1, 128), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((bb, 1, 128), row_block),
            pl.BlockSpec((bb, 1, 128), row_block),
        ]
    scratch = [
        pltpu.VMEM((2, bs, Hkv, S, Dh), cache_dt),  # k_buf
        pltpu.VMEM((2, bs, Hkv, S, Dh), cache_dt),  # v_buf
        pltpu.SemaphoreType.DMA((2, 2)),  # rsem
        pltpu.VMEM((2, bs, Hkv, WINDOW, Dh), cache_dt),  # kw_st (parity-dbl)
        pltpu.VMEM((2, bs, Hkv, WINDOW, Dh), cache_dt),  # vw_st
        pltpu.SemaphoreType.DMA((2, bs, 2)),  # wsem (value windows)
    ]

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // bs,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
    out = outs[0].reshape(B, Hkv, group, Dh).reshape(B, 1, Hq, Dh)
    if quantized:
        ks_new = outs[3][:, 0, 0].reshape(B, Hkv).astype(jnp.bfloat16)
        vs_new = outs[4][:, 0, 0].reshape(B, Hkv).astype(jnp.bfloat16)
        return out, outs[1], outs[2], ks_new, vs_new
    return out, outs[1], outs[2]
