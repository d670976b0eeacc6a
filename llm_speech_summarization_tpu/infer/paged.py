"""Paged KV cache: fixed-size pages, host-side allocator, device pools.

The slot cache (infer/slots.py) reserves `max_len` cache rows per slot; a
paged cache allocates `ceil(len / page_size)` pages as a sequence grows, so
heterogeneous-length loads share one pool (SURVEY.md §2.2 "decode attention
+ paged KV cache"; the vLLM idea, shaped for TPU: static pool shapes, page
reads as Pallas DMAs — kernels/paged_attention.py — and page writes as
XLA scatters, everything jit-compatible).

Layout: pools are (L, P, Hkv, page_size, Dh) — PAGE-major: per (layer,
page) the slab holding ALL kv heads is contiguous, so the decode kernel
fetches one (Hkv, page_size, Dh) burst per (sequence, page) instead of one
per (head, page). That is the round-3 DMA-coalescing fix (VERDICT r2 #7):
the kernel was measured DMA-ISSUE-bound (PERF.md), and every head of a
sequence shares the same page id, so fusing them cuts issued DMAs Hkv-fold.
The page table, lengths and pads are small int32 arrays; the free list
lives on the host (the allocator runs between jitted calls, like the slot
scheduler's admission).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PagedKVCache(NamedTuple):
    k_pool: jnp.ndarray  # (L, P, Hkv, ps, Dh) — bf16/f32, or int8 quantized
    v_pool: jnp.ndarray  # (L, P, Hkv, ps, Dh)
    page_table: jnp.ndarray  # (B, max_pages) int32 (0-padded)
    lengths: jnp.ndarray  # (B,) int32 tokens written per row
    pad_lens: jnp.ndarray  # (B,) int32 left-pad inside the logical sequence
    k_scale: Optional[jnp.ndarray] = None  # (L, P, Hkv, ps) bf16 iff int8
    v_scale: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k_pool.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pool.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_paged_cache(
    num_layers: int,
    num_kv_heads: int,
    head_dim: int,
    *,
    num_pages: int,
    page_size: int = 64,
    batch: int,
    max_pages_per_seq: int,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    shape = (num_layers, num_pages, num_kv_heads, page_size, head_dim)
    quantized = jnp.dtype(dtype) == jnp.int8
    # each field its own buffer (never alias zeros — donation, see
    # models/llama.py::init_kv_cache)
    zeros = lambda s, dt: jnp.zeros(s, dt) + 0  # noqa: E731
    return PagedKVCache(
        k_pool=zeros(shape, dtype),
        v_pool=zeros(shape, dtype),
        page_table=jnp.zeros((batch, max_pages_per_seq), jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
        pad_lens=jnp.zeros((batch,), jnp.int32),
        k_scale=zeros(shape[:-1], jnp.bfloat16) if quantized else None,
        v_scale=zeros(shape[:-1], jnp.bfloat16) if quantized else None,
    )


class PageAllocator:
    """Host-side free-list allocator over pool page ids.

    Page 0 is reserved as the null page (page tables are 0-padded and the
    kernel reads — and masks — page 0 for rows past their last page), so
    allocation starts at id 1.
    """

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free: List[int] = list(range(num_pages - 1, 0, -1))  # pop() -> 1 first

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(f"paged cache exhausted: want {n}, free {len(self._free)}")
        return [self._free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        for p in pages:
            if p:  # never recycle the null page
                self._free.append(int(p))


def pages_needed(num_tokens: int, page_size: int) -> int:
    return -(-num_tokens // page_size)


@jax.jit
def write_prefill_pages(
    cache: PagedKVCache,
    row: jnp.ndarray,  # scalar int32: which page-table row
    pages: jnp.ndarray,  # (n_pages,) int32 page ids for this sequence
    k_toks: jnp.ndarray,  # (L, T, Hkv, Dh) prefill keys (T = n_pages * ps)
    v_toks: jnp.ndarray,
    pad_len: jnp.ndarray,  # scalar int32
) -> PagedKVCache:
    """Scatter a prefilled sequence's K/V into its pages and install the
    page table row. T must be padded to a page multiple (engines bucket
    prompt lengths anyway); `pad_len` marks the left padding inside it.
    Single-row convenience wrapper over write_prefill_pages_batch."""
    return write_prefill_pages_batch(
        cache,
        jnp.asarray(row, jnp.int32)[None],
        jnp.asarray(pages, jnp.int32)[None],
        k_toks[:, None],
        v_toks[:, None],
        jnp.asarray(pad_len, jnp.int32)[None],
    )


def write_token(
    cache: PagedKVCache,
    k_new: jnp.ndarray,  # (L, B, Hkv, Dh)
    v_new: jnp.ndarray,
    positions: Optional[jnp.ndarray] = None,  # (B,) write slot; default lengths
    active: Optional[jnp.ndarray] = None,  # (B,) bool; inactive → null page
) -> PagedKVCache:
    """Scatter one fresh token per row into its page at ``positions``
    (lengths are NOT advanced — the caller owns progression, mirroring the
    dense path where the decode loop owns cache offsets). Inactive rows —
    and rows whose target page is unallocated — write the null page 0, a
    safe sink no valid table entry references. One routing rule, one
    implementation: this is ``write_tokens`` at T = 1."""
    return write_tokens(
        cache,
        k_new[:, :, None],
        v_new[:, :, None],
        positions=None if positions is None else positions[:, None],
        active=active,
    )


def write_tokens(
    cache: PagedKVCache,
    k_new: jnp.ndarray,  # (L, B, T, Hkv, Dh)
    v_new: jnp.ndarray,
    positions: Optional[jnp.ndarray] = None,  # (B, T); default lengths + [0..T)
    active: Optional[jnp.ndarray] = None,  # (B,) bool; inactive → null page
) -> PagedKVCache:
    """Scatter T fresh tokens per row into its pages at ``positions`` —
    the speculative verification write (a (k+1)-token forward commits its
    fresh K/V at the row's offset before knowing how many draft tokens
    survive; the rejected tail is simply overwritten next round,
    infer/slots.py::_spec_chunk_fn). Same contracts as ``write_token``:
    lengths are NOT advanced, inactive rows and positions past the page
    table sink to the null page 0. Positions may cross page boundaries —
    each token routes through the row's table independently."""
    L, B, T, Hkv, Dh = k_new.shape
    ps = cache.page_size
    mp = cache.page_table.shape[1]
    if positions is None:
        positions = cache.lengths[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    page_idx = positions // ps  # (B, T)
    slot = positions % ps
    pid = jnp.take_along_axis(
        cache.page_table, jnp.clip(page_idx, 0, mp - 1), axis=1
    )
    # out-of-range BOTH ways: a negative position would otherwise clamp to
    # the row's FIRST real page and silently corrupt prompt K/V
    pid = jnp.where((page_idx >= 0) & (page_idx < mp), pid, 0)
    if active is not None:
        pid = jnp.where(active[:, None], pid, 0)
    # page-major pools: (B, T) advanced indices on axes (1: page, 3: slot)
    # are separated by the head slice, so numpy moves them to the FRONT —
    # the update operand is (B, T, L, Hkv, Dh)
    kt = k_new.transpose(1, 2, 0, 3, 4)
    vt = v_new.transpose(1, 2, 0, 3, 4)
    if cache.quantized:
        from ..models.llama import _quantize_kv

        kq, ks = _quantize_kv(kt)
        vq, vs = _quantize_kv(vt)
        return cache._replace(
            k_pool=cache.k_pool.at[:, pid, :, slot].set(kq),
            v_pool=cache.v_pool.at[:, pid, :, slot].set(vq),
            k_scale=cache.k_scale.at[:, pid, :, slot].set(ks),
            v_scale=cache.v_scale.at[:, pid, :, slot].set(vs),
        )
    return cache._replace(
        k_pool=cache.k_pool.at[:, pid, :, slot].set(kt.astype(cache.k_pool.dtype)),
        v_pool=cache.v_pool.at[:, pid, :, slot].set(vt.astype(cache.v_pool.dtype)),
    )


@jax.jit
def write_decode_token(
    cache: PagedKVCache,
    active: jnp.ndarray,  # (B,) bool: rows that actually decoded this step
    k_new: jnp.ndarray,  # (L, B, Hkv, Dh)
    v_new: jnp.ndarray,
) -> PagedKVCache:
    """Append one token per active row at its current length and advance it
    (the page for that position must already be allocated — grow_pages
    handles boundary crossings between chunks, on the host)."""
    out = write_token(cache, k_new, v_new, active=active)
    return out._replace(lengths=jnp.where(active, cache.lengths + 1, cache.lengths))


def write_prefill_pages_batch(
    cache: PagedKVCache,
    rows: jnp.ndarray,  # (n,) int32 page-table rows
    pages: jnp.ndarray,  # (n, n_pages) int32 page ids per sequence
    k_toks: jnp.ndarray,  # (L, n, T, Hkv, Dh) — T = n_pages * ps
    v_toks: jnp.ndarray,
    pad_lens: jnp.ndarray,  # (n,) int32
    k_scales: Optional[jnp.ndarray] = None,  # (L, n, T, Hkv): k_toks already int8
    v_scales: Optional[jnp.ndarray] = None,
) -> PagedKVCache:
    """Batched prefill write: all n admitted sequences scatter in ONE
    program (a host loop of per-row writes would pay one dispatch RPC per
    row on remote backends). For int8 pools, pass pre-quantized values +
    scales (e.g. straight from an int8 dense prefill cache) or raw toks —
    the latter quantize here."""
    L, n, T, Hkv, Dh = k_toks.shape
    ps = cache.page_size
    np_ = pages.shape[1]

    def to_pages(x):  # (L, n, T, Hkv, Dh) -> (L, n*np_, Hkv, ps, Dh)
        return (
            x.reshape(L, n, np_, ps, Hkv, Dh)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(L, n * np_, Hkv, ps, Dh)
        )

    def to_pages_s(x):  # (L, n, T, Hkv) -> (L, n*np_, Hkv, ps)
        return (
            x.reshape(L, n, np_, ps, Hkv)
            .transpose(0, 1, 2, 4, 3)
            .reshape(L, n * np_, Hkv, ps)
        )

    flat = pages.reshape(-1)
    mp = cache.page_table.shape[1]
    table_rows = jnp.zeros((n, mp), jnp.int32).at[:, :np_].set(pages)
    kp, vp = to_pages(k_toks), to_pages(v_toks)
    if cache.quantized:
        if k_scales is not None:  # already quantized upstream
            kq, vq = kp, vp
            ks, vs = to_pages_s(k_scales), to_pages_s(v_scales)
        else:
            from ..models.llama import _quantize_kv

            kq, ks = _quantize_kv(kp)
            vq, vs = _quantize_kv(vp)
        k_pool = cache.k_pool.at[:, flat].set(kq)
        v_pool = cache.v_pool.at[:, flat].set(vq)
        k_scale = cache.k_scale.at[:, flat].set(ks)
        v_scale = cache.v_scale.at[:, flat].set(vs)
    else:
        k_pool = cache.k_pool.at[:, flat].set(kp.astype(cache.k_pool.dtype))
        v_pool = cache.v_pool.at[:, flat].set(vp.astype(cache.v_pool.dtype))
        k_scale, v_scale = cache.k_scale, cache.v_scale
    return cache._replace(
        k_pool=k_pool,
        v_pool=v_pool,
        page_table=cache.page_table.at[rows].set(table_rows, mode="drop"),
        lengths=cache.lengths.at[rows].set(T, mode="drop"),
        pad_lens=cache.pad_lens.at[rows].set(pad_lens, mode="drop"),
        k_scale=k_scale,
        v_scale=v_scale,
    )


def grow_pages(
    cache: PagedKVCache,
    allocator: PageAllocator,
    active_rows: List[int],
    lookahead: int = 1,
) -> Tuple[PagedKVCache, bool]:
    """Host-side step between decode chunks: every active row gets pages
    covering positions [length, length + lookahead) — callers running
    k-step chunks pass lookahead=k so mid-chunk boundary crossings never
    hit an unallocated page. Returns (cache, grew)."""
    lengths = np.asarray(cache.lengths)
    table = None
    fresh: List[int] = []  # pids placed only in the local copy so far
    ps = cache.page_size
    try:
        for b in active_rows:
            first = int(lengths[b]) // ps
            last = (int(lengths[b]) + max(lookahead, 1) - 1) // ps
            for page_idx in range(first, min(last + 1, cache.page_table.shape[1])):
                if table is None:
                    table = np.asarray(cache.page_table).copy()
                if table[b, page_idx] == 0:
                    (pid,) = allocator.alloc(1)
                    fresh.append(pid)
                    table[b, page_idx] = pid
    except MemoryError:
        # roll the partial grow back BEFORE re-raising: callers catch
        # MemoryError to defer/evict and retry — pids recorded only in the
        # discarded local copy would otherwise leak out of the pool forever
        allocator.free(fresh)
        raise
    if not fresh:
        # nothing grew: return the cache UNTOUCHED — re-uploading an
        # identical table costs a host->device transfer per chunk boundary
        # and drops the array's committed placement
        return cache, False
    return cache._replace(page_table=jnp.asarray(table)), True


def free_row(cache: PagedKVCache, allocator: PageAllocator, row: int) -> PagedKVCache:
    """Return a finished row's pages to the allocator and clear its table."""
    table = np.asarray(cache.page_table)
    allocator.free(table[row][table[row] != 0].tolist())
    return cache._replace(
        page_table=cache.page_table.at[row].set(0),
        lengths=cache.lengths.at[row].set(0),
        pad_lens=cache.pad_lens.at[row].set(0),
    )
