"""Pallas TPU paged decode attention: KV cache as scattered fixed-size pages.

Completes SURVEY.md §2.2's "decode attention + paged KV cache" row (the
reference gets a contiguous HF cache and no paging at all; paging is the
vLLM/JetStream serving idea re-done TPU-style). The slot cache
(infer/slots.py) reserves max_len per slot; pages drop that to
ceil(len/page_size) pages per sequence, so heterogeneous-length loads pack
~S_max/mean_len× more sequences into the same HBM.

Design (the part BlockSpecs cannot express): each sequence's pages are
SCATTERED in the pool, and fused-fat-row programs (the thing that made the
dense decode kernel fast — kernels/decode_attention.py) need a different
page per row per step. Block index_maps return one block per operand, so
the page fetches are manual double-buffered DMAs instead:

  * pools live in ANY (= HBM) memory space, PAGE-major:
    (P, Hkv, page_size, Dh) — one page slab holds EVERY kv head of that
    page contiguously, so a single DMA per (sequence, page-step) fetches
    all heads. Round 2's head-major layout issued 2·Hkv DMAs per page step
    and measured DMA-ISSUE-bound (int8's half-sized bursts bought only ~7%
    — PERF.md); all heads of a sequence share one page id, so fusing them
    into one burst cuts issued DMAs Hkv-fold (VERDICT r2 #7);
  * grid is (B/bs,) over sequences (bs sequences, bb = bs·Hkv fused rows
    per program);
  * per page-step t, each sequence s issues ONE async copy of its page
    pool[page_table[b_s, t]] into VMEM k/v buffers — double-buffered,
    so page t+1 streams while page t computes;
  * validity is arithmetic: global position t·ps + slot is valid iff
    pad[b] ≤ pos < length[b]; rows past their last page copy page 0 and
    mask everything;
  * the fresh (just-computed) k/v token rides in VMEM like the dense
    kernel's kn/vn and folds into the online softmax last; the caller
    scatters it into the pool after the layer scan (write-outside-scan,
    same O(1)-write rule as the dense cache).

The XLA fallback (`paged_reference`) gathers pages into a dense cache and
runs masked attention — used on non-TPU backends and as the parity oracle
(tests/test_paged.py, interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def paged_reference(q, k_pool, v_pool, page_table, lengths, pad_lens, k_new, v_new,
                    k_scale=None, v_scale=None):
    """XLA oracle: gather each sequence's pages into a dense cache, run
    masked attention over [pad, length) plus the fresh tokens (T ≥ 1: the
    T == 1 plain decode step, or a speculative (k+1)-token verification
    forward attending the fresh block causally). int8 pools dequantize
    through the gathered per-slot scales."""
    B, T, Hq, Dh = q.shape
    P, Hkv, ps, _ = k_pool.shape
    mp = page_table.shape[1]
    S = mp * ps
    # (B, mp) pages -> dense (B, Hkv, S, Dh)
    kg = k_pool[page_table]  # (B, mp, Hkv, ps, Dh)
    vg = v_pool[page_table]
    kd = kg.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, S, Dh)
    vd = vg.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, S, Dh)
    if k_scale is not None:
        ksg = k_scale[page_table].transpose(0, 2, 1, 3).reshape(B, Hkv, S)
        vsg = v_scale[page_table].transpose(0, 2, 1, 3).reshape(B, Hkv, S)
        kd = (kd.astype(jnp.float32) * ksg[..., None].astype(jnp.float32)).astype(q.dtype)
        vd = (vd.astype(jnp.float32) * vsg[..., None].astype(jnp.float32)).astype(q.dtype)

    group = Hq // Hkv
    # merged (T·G) query-row layout so BOTH einsums keep the exact dot
    # shape of the T == 1 decode oracle ("bhgd,bhsd") — XLA:CPU's DotThunk
    # rejects the bf16 variant with an extra degenerate batch dim
    qg = (
        q.reshape(B, T, Hkv, group, Dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, Hkv, T * group, Dh)
    )
    s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd.astype(q.dtype),
                   preferred_element_type=jnp.float32) * (Dh ** -0.5)
    pos = jnp.arange(S, dtype=jnp.int32)
    valid = (pos[None, :] >= pad_lens[:, None]) & (pos[None, :] < lengths[:, None])
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    # fresh block: query t attends fresh key s iff s <= t. f32 operands:
    # the block is tiny (T ≤ k+1 columns) and XLA:CPU rejects some
    # degenerate bf16 dot shapes (T == 1 contractions)
    kn = k_new.transpose(0, 2, 1, 3)  # (B, Hkv, T, Dh)
    vn = v_new.transpose(0, 2, 1, 3)
    s_new = jnp.einsum(
        "bhgd,bhtd->bhgt", qg.astype(jnp.float32), kn.astype(jnp.float32)
    ) * (Dh ** -0.5)
    # merged row r is query t_q = r // group
    tq = jnp.arange(T * group) // group  # (T·G,)
    causal = tq[:, None] >= jnp.arange(T)[None, :]  # (T·G, Tk)
    s_new = jnp.where(causal[None, None, :, :], s_new, NEG_INF)
    m = jnp.maximum(
        jnp.max(s, axis=-1, keepdims=True), jnp.max(s_new, axis=-1, keepdims=True)
    )
    p = jnp.exp(s - m)
    p_new = jnp.exp(s_new - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.sum(p_new, axis=-1, keepdims=True)
    pv = jnp.einsum("bhgs,bhsd->bhgd", p.astype(q.dtype), vd.astype(q.dtype),
                    preferred_element_type=jnp.float32)
    pv = pv + jnp.einsum("bhgt,bhtd->bhgd", p_new, vn.astype(jnp.float32))
    out = (pv / denom).reshape(B, Hkv, T, group, Dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, Dh).astype(q.dtype)


def _paged_kernel(
    scal_ref,  # (B*mp + 2B,) int32: [page_table | lengths | pads]
    q_ref,  # (bs, Hkv*T*G, Dh) VMEM — (Hkv, T, G)-ordered query rows
    kn_ref,  # (bs, Hkv, T, Dh) fresh keys (T = 1 decode / k+1 spec verify)
    vn_ref,  # (bs, Hkv, T, Dh) fresh values
    k_pool_ref,  # (P, Hkv, ps, Dh) ANY (HBM), page-major; bf16/f32 or int8
    v_pool_ref,
    *rest,  # [ks_pool, vs_pool (P, Hkv, 1, ps) ANY iff quantized,] o_ref, scratch...
    bs: int,
    ps: int,
    max_pages: int,
    Hkv: int,
    T: int,
    scale: float,
    quantized: bool = False,
):
    if quantized:
        ks_pool_ref, vs_pool_ref = rest[0], rest[1]
        o_ref, k_buf, v_buf, sem, ks_buf, vs_buf, ssem = rest[2:]
    else:
        ks_pool_ref = vs_pool_ref = ks_buf = vs_buf = ssem = None
        o_ref, k_buf, v_buf, sem = rest
    i = pl.program_id(0)
    B = pl.num_programs(0) * bs
    bb = bs * Hkv  # fused compute rows
    mp = max_pages

    def seq_b(s):
        return i * bs + s

    def issue(t, slot):
        """ONE (Hkv, ps, Dh) DMA per (sequence, k/v) — the page slab holds
        every head contiguously (page-major pools)."""
        for s in range(bs):
            pid = scal_ref[seq_b(s) * mp + t]
            pltpu.make_async_copy(
                k_pool_ref.at[pid], k_buf.at[slot, s], sem.at[slot, 0, s]
            ).start()
            pltpu.make_async_copy(
                v_pool_ref.at[pid], v_buf.at[slot, s], sem.at[slot, 1, s]
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
                k_pool_ref.at[pid], k_buf.at[slot, s], sem.at[slot, 0, s]
            ).wait()
            pltpu.make_async_copy(
                v_pool_ref.at[pid], v_buf.at[slot, s], sem.at[slot, 1, s]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_pool_ref.at[pid], ks_buf.at[slot, s], ssem.at[slot, 0, s]
                ).wait()
                pltpu.make_async_copy(
                    vs_pool_ref.at[pid], vs_buf.at[slot, s], ssem.at[slot, 1, s]
                ).wait()

    G = q_ref.shape[1] // (Hkv * T)
    q = q_ref[:].reshape(bb, T * G, q_ref.shape[2])  # (bb, T·G, Dh)

    issue(0, 0)

    m0 = jnp.full((bb, q.shape[1], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bb, q.shape[1], 1), jnp.float32)
    acc0 = jnp.zeros((bb, q.shape[1], q.shape[2]), jnp.float32)

    carry = (m0, l0, acc0)
    # static unroll over pages: max_pages is small (S_max / ps) and the DMA
    # issue loop needs static row indices anyway
    for t in range(max_pages):
        slot = t % 2
        if t + 1 < max_pages:
            issue(t + 1, (t + 1) % 2)
        wait(t, slot)
        k = k_buf[slot].reshape(bb, ps, k_buf.shape[-1])  # (bb, ps, Dh)
        v = v_buf[slot].reshape(bb, ps, v_buf.shape[-1])
        m, l, acc = carry
        s = jax.lax.dot_general(
            q, k.astype(q.dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (bb, T·G, ps)
        if quantized:
            # in-register dequant: per-slot K scales fold into the logits,
            # V scales into the probabilities (same trick as the dense int8
            # kernel). Scale buffers are (bb, 1, ps) so the multiply is a
            # natural broadcast — a [:, None, :] reshape of a (bb, ps) tile
            # fails Mosaic's vector-layout inference.
            s = s * ks_buf[slot].reshape(bb, 1, ps).astype(jnp.float32)
        pos = t * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        masks = [
            (pos >= scal_ref[B * mp + B + seq_b(r // Hkv)])
            & (pos < scal_ref[B * mp + seq_b(r // Hkv)])
            for r in range(bb)
        ]
        valid = jnp.stack(masks, axis=0)  # (bb, 1, ps)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_buf[slot].reshape(bb, 1, ps).astype(jnp.float32)
        acc = alpha * acc + jax.lax.dot_general(
            p.astype(q.dtype), v.astype(q.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        carry = (m_new, l, acc)

    # fresh tokens fold in last: query t attends fresh key s iff s <= t
    # (T == 1 decode: a single always-valid column; T == k+1 spec verify:
    # causal within the fresh block)
    m, l, acc = carry
    kn = kn_ref[:].reshape(bb, T, kn_ref.shape[-1])
    vn = vn_ref[:].reshape(bb, T, vn_ref.shape[-1])
    # f32 operands: the fresh block is (T·G, T) — a few dozen MACs, and
    # XLA:CPU's interpret path rejects some degenerate bf16 dot shapes
    s_new = jax.lax.dot_general(
        q.astype(jnp.float32), kn.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (bb, T·G, T)
    if T > 1:
        # query rows are (T, G)-ordered: row r is query t_q = r // G
        tq = jax.lax.broadcasted_iota(jnp.int32, (T * G, T), 0) // G
        tk = jax.lax.broadcasted_iota(jnp.int32, (T * G, T), 1)
        s_new = jnp.where((tk <= tq)[None, :, :], s_new, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s_new, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p_new = jnp.exp(s_new - m_new)
    l = alpha * l + jnp.sum(p_new, axis=-1, keepdims=True)
    acc = alpha * acc + jax.lax.dot_general(
        p_new, vn.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc / l).reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(
    q: jnp.ndarray,  # (B, T, Hq, Dh) — T = 1 decode / k+1 spec verify
    k_pool: jnp.ndarray,  # (P, Hkv, page_size, Dh) page-major
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, max_pages) int32 page ids (0-padded)
    lengths: jnp.ndarray,  # (B,) int32: tokens already in pages (per row)
    pad_lens: jnp.ndarray,  # (B,) int32: left-pad inside the logical seq
    k_new: jnp.ndarray,  # (B, T, Hkv, Dh) fresh tokens (not yet in pages)
    v_new: jnp.ndarray,
    k_scale: Optional[jnp.ndarray] = None,  # (P, Hkv, ps) bf16 iff int8 pools
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over a paged KV cache for T ≥ 1 fresh queries; returns
    (B, T, Hq, Dh). Every query attends its row's cached window
    [pad, length) plus the fresh block causally (T == k+1 is the
    speculative verification forward, infer/slots.py). The caller scatters
    k_new/v_new into the pool after the layer scan (write-outside-scan).
    int8 pools dequantize in-register from per-slot scales (halves the
    page traffic, like the dense int8 cache)."""
    B, T, Hq, Dh = q.shape
    P, Hkv, ps, _ = k_pool.shape
    assert Hq % Hkv == 0
    group = Hq // Hkv
    mp = page_table.shape[1]
    quantized = k_scale is not None

    # The manual page DMAs slice the pools' minor (lane) dim, and Mosaic
    # requires such slices 128-aligned on real chips: head_dim < 128 (e.g.
    # the tiny test config's 16) fails to COMPILE on hardware even though
    # BlockSpec-driven kernels pad the same shapes automatically. Likewise
    # the int8 scale slabs' (1, ps) rows — int8 callers use page_size 128
    # (infer/slots.py does this automatically). Unaligned shapes take the
    # XLA gather path; production geometry (Dh=128) uses the kernel.
    unaligned = (Dh % 128 != 0 or (quantized and ps % 128 != 0)) and not interpret
    if (jax.default_backend() != "tpu" or unaligned) and not interpret:
        return paged_reference(
            q, k_pool, v_pool, page_table, lengths, pad_lens, k_new, v_new,
            k_scale=k_scale, v_scale=v_scale,
        )

    # sequences per program: keep ~8 fused compute rows (bb = bs·Hkv) like
    # the dense kernel, bounded by VMEM (2 double-buffered page slabs)
    bs = max(1, 8 // Hkv)
    while bs > 1 and B % bs != 0:
        bs -= 1

    # (Hkv, T, G)-ordered query rows: all of a kv head's queries sit in one
    # fused compute row, so the page loop's logits broadcast one (1, ps)
    # validity mask over T·G rows
    qg = (
        q.reshape(B, T, Hkv, group, Dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, Hkv * T * group, Dh)
    )
    kn = k_new.astype(q.dtype).transpose(0, 2, 1, 3)  # (B, Hkv, T, Dh)
    vn = v_new.astype(q.dtype).transpose(0, 2, 1, 3)
    scalars = jnp.concatenate(
        [
            page_table.astype(jnp.int32).reshape(-1),
            lengths.astype(jnp.int32),
            pad_lens.astype(jnp.int32),
        ]
    )

    seq_block = lambda i, scal: (i, 0, 0)  # noqa: E731
    seq_block4 = lambda i, scal: (i, 0, 0, 0)  # noqa: E731
    kernel = functools.partial(
        _paged_kernel, bs=bs, ps=ps, max_pages=mp, Hkv=Hkv, T=T,
        scale=Dh ** -0.5, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((bs, Hkv * T * group, Dh), seq_block),
        pl.BlockSpec((bs, Hkv, T, Dh), seq_block4),
        pl.BlockSpec((bs, Hkv, T, Dh), seq_block4),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [scalars, qg, kn, vn, k_pool, v_pool]
    scratch = [
        pltpu.VMEM((2, bs, Hkv, ps, Dh), k_pool.dtype),
        pltpu.VMEM((2, bs, Hkv, ps, Dh), v_pool.dtype),
        pltpu.SemaphoreType.DMA((2, 2, bs)),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        # (P, Hkv, 1, ps) f32: page slabs arrive as (Hkv, 1, ps) rows, so
        # the scale scratch reshapes to (bb, 1, ps) and broadcasts against
        # (bb, G, ps) logits with no shape cast. f32 because bf16 sublane
        # packing (2) rejects height-1 DMA slices; the cast is ~1 MB/layer,
        # noise next to the page traffic.
        operands += [
            k_scale[:, :, None, :].astype(jnp.float32),
            v_scale[:, :, None, :].astype(jnp.float32),
        ]
        scratch += [
            pltpu.VMEM((2, bs, Hkv, 1, ps), jnp.float32),
            pltpu.VMEM((2, bs, Hkv, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, bs)),
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // bs,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bs, Hkv * T * group, Dh), seq_block),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv * T * group, Dh), q.dtype),
        interpret=interpret,
    )(*operands)
    # (Hkv, T, G)-ordered rows back to (B, T, Hq, Dh)
    return (
        out.reshape(B, Hkv, T, group, Dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, T, Hq, Dh)
    )
