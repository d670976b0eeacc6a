"""Pallas TPU fused PAGED decode attention + in-place page writes.

The dense fused kernel (kernels/fused_decode.py) showed the decode step's
residual over the bandwidth roofline is per-op SCHEDULING: op families
that cannot fuse into the GEMM stream pay a fixed tax across the 28
sequential layer-scan steps. The paged decoder (kernels/
paged_attention.py) still pays both taxes PERF.md charged the dense path
for: the attention pallas_call reads per-layer pool slices that ride the
scan xs (a dynamic-slice of every pool per layer), and the fresh token is
committed by a post-scan ``infer/paged.py::write_tokens`` — four XLA
scatters over the (L, P, Hkv, ps[, Dh]) pools per step. This kernel gives
the paged cache the dense kernel's treatment:

  * the FULL (L, P, Hkv, ps, Dh) pools stay in HBM (ANY memory space) and
    are ALIASED in place (``input_output_aliases``) — they ride the decode
    scan as CARRY, zero per-layer slicing, zero post-scan scatters;
  * page reads are the paged kernel's manual double-buffered DMAs — one
    (Hkv, ps, Dh) page-major slab per (sequence, page-step);
  * while page t streams for attention, each row whose WRITE page is t
    snapshots its 32-wide write window from VMEM (the page is resident
    right then — re-reading the window from HBM after the loop would add
    a second pass over the write page);
  * the fresh k/v token is quantized in-register (bit-matching
    models/llama.py::_quantize_kv), merged into the snapshot at the row's
    ``length % page_size`` slot, and DMA'd back as a 32-aligned
    (Hkv, 32, Dh) window of page ``page_table[b, length // page_size]`` —
    same Mosaic alignment rules as the dense kernel's window write, but
    page-local (page_size is a multiple of 32 by construction);
  * per-slot SCALES keep the dense kernel's asymmetric split: this
    layer's slabs stream in for the in-register dequant (page-major
    manual DMAs, like the unfused paged kernel), and the fresh token's
    scales EXIT as small per-row outputs — the caller scatters the
    (L, B, Hkv) stack with ONE tiny post-scan XLA scatter (the values,
    which are 128× the bytes, were already written in place here).

Rows whose write page id is 0 (inactive / released rows routed to the
null page by the allocator contract, infer/paged.py) write the null
page's window — a safe sink no valid table entry references; concurrent
null writes from different rows race benignly over garbage that is never
attended. Contract: ``lengths`` < page_size·max_pages (a decode step has
a slot to write); at the boundary the kernel drops the fresh token
(clamped in-bounds window, no slot selected) while the XLA oracle routes
it to the null page — both keep real pages intact.

The reference's decode loop is one HF forward per token with eager cache
appends (reference: inference.py:55-74); paging itself is
beyond-reference serving capability (SURVEY.md §2.2). XLA fallback /
parity oracle: ``fused_paged_reference`` (tests/test_fused_paged.py,
interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_decode import _quantize_rows
from .paged_attention import paged_reference

NEG_INF = -1e30
WINDOW = 32  # write-back window (≥ int8 sublane packing, divides page_size)


def fused_paged_reference(
    q, k_pool, v_pool, page_table, lengths, pad_lens, k_new, v_new, layer,
    k_scale_layer=None, v_scale_layer=None,
):
    """XLA oracle: paged_reference attention over layer ``layer`` of the
    (L, ...) pools + _quantize_kv-exact value writes at each row's
    ``lengths`` slot. Scales for THIS layer arrive as (P, Hkv, ps) slabs;
    the fresh token's scales return as (B, Hkv) bf16 (the caller owns the
    (L, B, Hkv) post-scan scatter). Returns
    (out, k_pool, v_pool[, ks_new, vs_new]) like the kernel."""
    B = q.shape[0]
    L, P, Hkv, ps, Dh = k_pool.shape
    mp = page_table.shape[1]
    quantized = k_scale_layer is not None
    kp = jax.lax.dynamic_index_in_dim(k_pool, layer, 0, keepdims=False)
    vp = jax.lax.dynamic_index_in_dim(v_pool, layer, 0, keepdims=False)
    out = paged_reference(
        q, kp, vp, page_table, lengths, pad_lens, k_new, v_new,
        k_scale=k_scale_layer, v_scale=v_scale_layer,
    )

    # write the fresh token at each row's length (write_tokens semantics:
    # out-of-table positions and null-page rows sink to page 0)
    page_idx = lengths // ps  # (B,)
    slot = lengths % ps
    pid = jnp.take_along_axis(
        page_table, jnp.clip(page_idx, 0, mp - 1)[:, None], axis=1
    )[:, 0]
    pid = jnp.where((page_idx >= 0) & (page_idx < mp), pid, 0)
    kn = k_new.astype(jnp.float32).transpose(0, 2, 1, 3)  # (B, Hkv, 1, Dh)
    vn = v_new.astype(jnp.float32).transpose(0, 2, 1, 3)
    if quantized:
        kq, ks = _quantize_rows(kn)
        vq, vs = _quantize_rows(vn)
    else:
        kq, vq = kn, vn
    kp2 = kp.at[pid, :, slot].set(kq[:, :, 0].astype(kp.dtype))
    vp2 = vp.at[pid, :, slot].set(vq[:, :, 0].astype(vp.dtype))
    k_pool = jax.lax.dynamic_update_index_in_dim(k_pool, kp2, layer, 0)
    v_pool = jax.lax.dynamic_update_index_in_dim(v_pool, vp2, layer, 0)
    if quantized:
        return (
            out, k_pool, v_pool,
            ks[..., 0, 0].astype(jnp.bfloat16),  # (B, Hkv)
            vs[..., 0, 0].astype(jnp.bfloat16),
        )
    return out, k_pool, v_pool


def _fused_paged_kernel(
    scal_ref,  # (B·mp + 2B + 1,) int32: [page_table | lengths | pads | layer]
    q_ref,  # (bs, Hkv·G, Dh) VMEM — (Hkv, G)-ordered query rows
    kn_ref,  # (bs, Hkv, 1, Dh) fresh key (post-rope)
    vn_ref,  # (bs, Hkv, 1, Dh) fresh value
    k_pool_hbm,  # (L, P, Hkv, ps, Dh) ANY — aliased in place
    v_pool_hbm,
    *rest,
    bs: int,
    ps: int,
    mp: int,
    Hkv: int,
    scale: float,
    quantized: bool,
):
    if quantized:
        ks_pool_ref, vs_pool_ref = rest[0], rest[1]  # (P, Hkv, 1, ps) f32 ANY
        (o_ref, ko_hbm, vo_hbm, ksn_ref, vsn_ref,
         k_buf, v_buf, sem, ks_buf, vs_buf, ssem,
         kw_st, vw_st, wsem) = rest[2:]
    else:
        ks_pool_ref = vs_pool_ref = ks_buf = vs_buf = ssem = None
        ksn_ref = vsn_ref = None
        (o_ref, ko_hbm, vo_hbm, k_buf, v_buf, sem, kw_st, vw_st, wsem) = rest

    i = pl.program_id(0)
    n = pl.num_programs(0)
    B = n * bs
    bb = bs * Hkv
    Dh = q_ref.shape[-1]
    li = scal_ref[B * mp + 2 * B]

    def seq_b(s):
        return i * bs + s

    def rw_coords(b):
        """(pid, w0, slot_in_page) of row ``b``'s write target, clamped
        in-bounds at the lengths == mp·ps boundary (token then drops)."""
        ln = scal_ref[B * mp + b]
        tw = jnp.minimum(ln // ps, mp - 1)
        slot_in = ln - tw * ps  # == ps only at the clamped boundary
        w0 = pl.multiple_of(
            jnp.minimum((slot_in // WINDOW) * WINDOW, ps - WINDOW), WINDOW
        )
        return scal_ref[b * mp + tw], tw, w0, slot_in

    def issue(t, slot):
        for s in range(bs):
            pid = scal_ref[seq_b(s) * mp + t]
            pltpu.make_async_copy(
                k_pool_hbm.at[li, pid], k_buf.at[slot, s], sem.at[slot, 0, s]
            ).start()
            pltpu.make_async_copy(
                v_pool_hbm.at[li, pid], v_buf.at[slot, s], sem.at[slot, 1, s]
            ).start()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[pid], ks_buf.at[slot, s], ssem.at[slot, 0, s]
                ).start()
                pltpu.make_async_copy(
                    vs_pool_ref.at[pid], vs_buf.at[slot, s], ssem.at[slot, 1, s]
                ).start()

    def wait(t, slot):
        for s in range(bs):
            pid = scal_ref[seq_b(s) * mp + t]
            pltpu.make_async_copy(
                k_pool_hbm.at[li, pid], k_buf.at[slot, s], sem.at[slot, 0, s]
            ).wait()
            pltpu.make_async_copy(
                v_pool_hbm.at[li, pid], v_buf.at[slot, s], sem.at[slot, 1, s]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[pid], ks_buf.at[slot, s], ssem.at[slot, 0, s]
                ).wait()
                pltpu.make_async_copy(
                    vs_pool_ref.at[pid], vs_buf.at[slot, s], ssem.at[slot, 1, s]
                ).wait()

    # Deferred write pipeline (kernels/fused_decode.py): program i's window
    # writes drain while i+1 / i+2 compute. The page loop below SNAPSHOTS
    # into kw_st/vw_st[i%2], so i-2's writes (same staging parity) must be
    # waited BEFORE the loop's first store, not merely before the restage.
    def wr_descs(t, parity):
        descs = []
        for s in range(bs):
            pid_t, _, w0_t, _ = rw_coords(t * bs + s)
            for j, (st, dst) in enumerate(((kw_st, ko_hbm), (vw_st, vo_hbm))):
                descs.append(
                    pltpu.make_async_copy(
                        st.at[parity, s],
                        dst.at[li, pid_t, :, pl.ds(w0_t, WINDOW), :],
                        wsem.at[parity, s, j],
                    )
                )
        return descs

    par = i % 2

    @pl.when(i >= 2)
    def _():
        for c in wr_descs(i - 2, par):
            c.wait()

    G = q_ref.shape[1] // Hkv
    q = q_ref[:].reshape(bb, G, Dh)

    issue(0, 0)

    m = jnp.full((bb, G, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bb, G, 1), jnp.float32)
    acc = jnp.zeros((bb, G, Dh), jnp.float32)

    for t in range(mp):
        slot = t % 2
        if t + 1 < mp:
            issue(t + 1, (t + 1) % 2)
        wait(t, slot)
        # rows writing into page t snapshot their window NOW, while the
        # page is VMEM-resident (the double buffer only keeps 2 pages)
        for s in range(bs):
            _, tw, w0, _ = rw_coords(seq_b(s))

            @pl.when(tw == t)
            def _(s=s, slot=slot, w0=w0):
                kw_st[par, s] = k_buf[slot, s, :, pl.ds(w0, WINDOW), :]
                vw_st[par, s] = v_buf[slot, s, :, pl.ds(w0, WINDOW), :]

        k = k_buf[slot].reshape(bb, ps, Dh)
        v = v_buf[slot].reshape(bb, ps, Dh)
        s_t = jax.lax.dot_general(
            q, k.astype(q.dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (bb, G, ps)
        if quantized:
            s_t = s_t * ks_buf[slot].reshape(bb, 1, ps).astype(jnp.float32)
        pos = t * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        masks = [
            (pos >= scal_ref[B * mp + B + seq_b(r // Hkv)])
            & (pos < scal_ref[B * mp + seq_b(r // Hkv)])
            for r in range(bb)
        ]
        valid = jnp.stack(masks, axis=0)  # (bb, 1, ps)
        s_t = jnp.where(valid, s_t, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s_t, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_t - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_buf[slot].reshape(bb, 1, ps).astype(jnp.float32)
        acc = alpha * acc + jax.lax.dot_general(
            p.astype(q.dtype), v.astype(q.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    # fresh token folds in last (T == 1: a single always-valid column)
    kn = kn_ref[:].reshape(bb, 1, Dh)
    vn = vn_ref[:].reshape(bb, 1, Dh)
    s_new = jax.lax.dot_general(
        q.astype(jnp.float32), kn.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (bb, G, 1)
    m_new = jnp.maximum(m, s_new)
    alpha = jnp.exp(m - m_new)
    p_new = jnp.exp(s_new - m_new)
    l = alpha * l + p_new
    acc = alpha * acc + p_new * vn.astype(jnp.float32)
    o_ref[:] = (acc / l).reshape(o_ref.shape).astype(o_ref.dtype)

    # ---- quantize the fresh token and write the page windows in place ----
    kn_f = kn_ref[:].astype(jnp.float32)  # (bs, Hkv, 1, Dh)
    vn_f = vn_ref[:].astype(jnp.float32)
    if quantized:
        kq, ksn = _quantize_rows(kn_f)  # (bs, Hkv, 1, Dh) int8, (bs, Hkv, 1, 1)
        vq, vsn = _quantize_rows(vn_f)
        ksn_ref[:] = jax.lax.broadcast_in_dim(
            ksn[..., 0].astype(jnp.float32), ksn_ref.shape, (0, 1, 2)
        )
        vsn_ref[:] = jax.lax.broadcast_in_dim(
            vsn[..., 0].astype(jnp.float32), vsn_ref.shape, (0, 1, 2)
        )
    else:
        kq = kn_f.astype(k_buf.dtype)
        vq = vn_f.astype(v_buf.dtype)

    # (program i's i-2 wait already happened BEFORE the page loop above —
    # the loop's snapshots store into the same staging parity)
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW, 1), 1)
    for s in range(bs):
        _, _, w0, slot_in = rw_coords(seq_b(s))
        sel = win_iota == (slot_in - w0)  # no hit at the clamped boundary
        kw_st[par, s] = jnp.where(sel, kq[s], kw_st[par, s])
        vw_st[par, s] = jnp.where(sel, vq[s], vw_st[par, s])
    for c in wr_descs(i, par):
        c.start()

    @pl.when(i >= n - 2)
    def _():
        for c in wr_descs(i, par):
            c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_paged_decode_write(
    q: jnp.ndarray,  # (B, 1, Hq, Dh)
    k_pool: jnp.ndarray,  # (L, P, Hkv, ps, Dh) int8 or bf16/f32 — consumed
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, max_pages) int32 (0-padded)
    lengths: jnp.ndarray,  # (B,) int32: cached window is [pad, length),
    # and ``length`` is this token's write slot
    pad_lens: jnp.ndarray,  # (B,) int32
    k_new: jnp.ndarray,  # (B, 1, Hkv, Dh) fresh post-rope key
    v_new: jnp.ndarray,
    layer: jnp.ndarray,  # scalar int32
    k_scale_layer: Optional[jnp.ndarray] = None,  # (P, Hkv, ps) bf16 iff int8
    v_scale_layer: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """One paged decode step's attention over layer ``layer`` of the
    (L, ...) pools PLUS the quantized in-place page write of the fresh
    token — one Pallas program instead of a per-layer pool slice, an
    attention kernel, and four post-scan XLA pool scatters. The pools are
    aliased: callers must treat them as consumed (the decode scan threads
    them as carry). Scale slabs are read-only here; the fresh scales
    return as (B, Hkv) bf16 for the caller's single post-scan scatter.
    Same fresh-token contract as the dense fused kernel: T == 1 and every
    fresh token REAL (models/llama.py selects this path only with
    attn_mask=None). Returns (out, k_pool, v_pool[, ks_new, vs_new])."""
    B, T, Hq, Dh = q.shape
    L, P, Hkv, ps, _ = k_pool.shape
    assert T == 1 and Hq % Hkv == 0
    group = Hq // Hkv
    mp = page_table.shape[1]
    quantized = k_scale_layer is not None

    aligned = Dh % 128 == 0 and ps % WINDOW == 0 and (
        not quantized or ps % 128 == 0
    )
    if (jax.default_backend() != "tpu" or not aligned) and not interpret:
        return fused_paged_reference(
            q, k_pool, v_pool, page_table, lengths, pad_lens,
            k_new, v_new, layer,
            k_scale_layer=k_scale_layer, v_scale_layer=v_scale_layer,
        )

    bs = max(1, 8 // Hkv)
    while bs > 1 and B % bs != 0:
        bs -= 1
    bb = bs * Hkv

    qg = q.reshape(B, Hkv, group, Dh).reshape(B, Hkv * group, Dh)
    kn = k_new.astype(q.dtype).transpose(0, 2, 1, 3)  # (B, Hkv, 1, Dh)
    vn = v_new.astype(q.dtype).transpose(0, 2, 1, 3)
    scalars = jnp.concatenate(
        [
            page_table.astype(jnp.int32).reshape(-1),
            lengths.astype(jnp.int32),
            pad_lens.astype(jnp.int32),
            jnp.asarray(layer, jnp.int32)[None],
        ]
    )

    seq_block = lambda i, scal: (i, 0, 0)  # noqa: E731
    seq_block4 = lambda i, scal: (i, 0, 0, 0)  # noqa: E731
    kernel = functools.partial(
        _fused_paged_kernel, bs=bs, ps=ps, mp=mp, Hkv=Hkv,
        scale=Dh ** -0.5, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((bs, Hkv * group, Dh), seq_block),
        pl.BlockSpec((bs, Hkv, 1, Dh), seq_block4),
        pl.BlockSpec((bs, Hkv, 1, Dh), seq_block4),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [scalars, qg, kn, vn, k_pool, v_pool]
    out_shape = [
        jax.ShapeDtypeStruct((B, Hkv * group, Dh), q.dtype),
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    out_specs = [
        pl.BlockSpec((bs, Hkv * group, Dh), seq_block),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # operand indices (incl. scalar-prefetch arg 0): k_pool=4, v_pool=5
    aliases = {4: 1, 5: 2}
    cache_dt = k_pool.dtype
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        # (P, Hkv, 1, ps) f32 page slabs: see kernels/paged_attention.py —
        # the height-1 dim gives the scale scratch a (bb, 1, ps) reshape
        # that broadcasts against (bb, G, ps) logits, and f32 sidesteps
        # bf16's sublane-packed height-1 DMA rejection
        operands += [
            k_scale_layer[:, :, None, :].astype(jnp.float32),
            v_scale_layer[:, :, None, :].astype(jnp.float32),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, Hkv, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 128), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((bs, Hkv, 128), seq_block),
            pl.BlockSpec((bs, Hkv, 128), seq_block),
        ]
    scratch = [
        pltpu.VMEM((2, bs, Hkv, ps, Dh), cache_dt),  # k_buf
        pltpu.VMEM((2, bs, Hkv, ps, Dh), cache_dt),  # v_buf
        pltpu.SemaphoreType.DMA((2, 2, bs)),  # sem (page reads)
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((2, bs, Hkv, 1, ps), jnp.float32),  # ks_buf
            pltpu.VMEM((2, bs, Hkv, 1, ps), jnp.float32),  # vs_buf
            pltpu.SemaphoreType.DMA((2, 2, bs)),  # ssem
        ]
    scratch += [
        pltpu.VMEM((2, bs, Hkv, WINDOW, Dh), cache_dt),  # kw_st (parity-dbl)
        pltpu.VMEM((2, bs, Hkv, WINDOW, Dh), cache_dt),  # vw_st
        pltpu.SemaphoreType.DMA((2, bs, 2)),  # wsem (window writes)
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
        ks_new = outs[3][:, :, 0].astype(jnp.bfloat16)  # (B, Hkv)
        vs_new = outs[4][:, :, 0].astype(jnp.bfloat16)
        return out, outs[1], outs[2], ks_new, vs_new
    return out, outs[1], outs[2]
