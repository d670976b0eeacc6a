"""Paged KV cache: kernel parity, allocator, and dense-cache equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.infer.paged import (
    PageAllocator,
    free_row,
    grow_pages,
    init_paged_cache,
    pages_needed,
    write_decode_token,
    write_prefill_pages,
)
from llm_speech_summarization_tpu.kernels.paged_attention import (
    paged_decode_attention,
    paged_reference,
)
from llm_speech_summarization_tpu.ops.attention import (
    dot_product_attention,
    make_attention_bias,
)


def _random_paged_case(seed=0, B=2, Hq=4, Hkv=2, Dh=128, ps=64, mp=3):
    """Random pool + tables with per-row lengths/pads and a fresh token."""
    rng = np.random.RandomState(seed)
    P = 1 + B * mp
    # page-major pools: (P, Hkv, ps, Dh) — one slab per page holds all heads
    k_pool = rng.randn(P, Hkv, ps, Dh).astype(np.float32)
    v_pool = rng.randn(P, Hkv, ps, Dh).astype(np.float32)
    # distinct pages per row (page 0 reserved/null)
    ids = np.arange(1, 1 + B * mp).reshape(B, mp).astype(np.int32)
    lengths = np.array([ps * mp - 7, ps + 3], np.int32)  # partial last pages
    pads = np.array([0, 5], np.int32)
    q = rng.randn(B, 1, Hq, Dh).astype(np.float32)
    k_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    v_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    return map(jnp.asarray, (q, k_pool, v_pool, ids, lengths, pads, k_new, v_new))


def test_paged_reference_matches_dense_attention():
    """The XLA paged oracle == plain masked attention over the gathered
    dense cache + fresh token (independent construction)."""
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case()
    out = paged_reference(q, k_pool, v_pool, ids, lengths, pads, k_new, v_new)

    B, _, Hq, Dh = q.shape
    _, Hkv, ps, _ = k_pool.shape
    mp = ids.shape[1]
    S = mp * ps
    kd = np.zeros((B, S + 1, Hkv, Dh), np.float32)
    vd = np.zeros((B, S + 1, Hkv, Dh), np.float32)
    for b in range(B):
        for t in range(mp):
            kd[b, t * ps : (t + 1) * ps] = np.asarray(k_pool)[ids[b, t]].transpose(1, 0, 2)
            vd[b, t * ps : (t + 1) * ps] = np.asarray(v_pool)[ids[b, t]].transpose(1, 0, 2)
    kd[:, S] = np.asarray(k_new)[:, 0]
    vd[:, S] = np.asarray(v_new)[:, 0]

    pos = np.arange(S + 1)[None, :]
    kv_valid = ((pos >= np.asarray(pads)[:, None]) & (pos < np.asarray(lengths)[:, None])) | (
        pos == S
    )
    bias = make_attention_bias(
        jnp.ones((B, 1), bool), jnp.asarray(kv_valid), causal=False
    )
    ref = dot_product_attention(q, jnp.asarray(kd), jnp.asarray(vd), bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_kernel_matches_reference_interpret():
    """Pallas kernel (manual double-buffered page DMAs) == XLA oracle."""
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case(seed=1)
    out_k = paged_decode_attention(
        q, k_pool, v_pool, ids, lengths, pads, k_new, v_new, interpret=True
    )
    out_r = paged_reference(q, k_pool, v_pool, ids, lengths, pads, k_new, v_new)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), rtol=2e-5, atol=2e-5)


def test_paged_kernel_bf16_interpret():
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case(seed=2)
    cast = lambda x: x.astype(jnp.bfloat16)  # noqa: E731
    out_k = paged_decode_attention(
        cast(q), cast(k_pool), cast(v_pool), ids, lengths, pads,
        cast(k_new), cast(v_new), interpret=True,
    )
    out_r = paged_reference(
        cast(q), cast(k_pool), cast(v_pool), ids, lengths, pads, cast(k_new), cast(v_new)
    )
    diff = np.abs(
        np.asarray(out_k, np.float32) - np.asarray(out_r, np.float32)
    )
    assert diff.max() < 2e-2, diff.max()


def _random_paged_case_T(seed=0, B=2, T=3, Hq=4, Hkv=2, Dh=128, ps=64, mp=3):
    """Multi-query variant (speculative verification: T = k+1 fresh
    tokens per row)."""
    rng = np.random.RandomState(seed)
    P = 1 + B * mp
    k_pool = rng.randn(P, Hkv, ps, Dh).astype(np.float32)
    v_pool = rng.randn(P, Hkv, ps, Dh).astype(np.float32)
    ids = np.arange(1, 1 + B * mp).reshape(B, mp).astype(np.int32)
    lengths = np.array([ps * mp - 7, ps + 3], np.int32)
    pads = np.array([0, 5], np.int32)
    q = rng.randn(B, T, Hq, Dh).astype(np.float32)
    k_new = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    v_new = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    return map(jnp.asarray, (q, k_pool, v_pool, ids, lengths, pads, k_new, v_new))


def test_paged_reference_multi_query_matches_dense_attention():
    """T > 1 oracle (spec verification): every query attends the cached
    window [pad, length) plus the fresh block causally — checked against
    an independent dense construction with a hand-built bias."""
    T = 3
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case_T(T=T)
    out = paged_reference(q, k_pool, v_pool, ids, lengths, pads, k_new, v_new)

    B, _, Hq, Dh = q.shape
    _, Hkv, ps, _ = k_pool.shape
    mp = ids.shape[1]
    S = mp * ps
    kd = np.zeros((B, S + T, Hkv, Dh), np.float32)
    vd = np.zeros((B, S + T, Hkv, Dh), np.float32)
    for b in range(B):
        for t in range(mp):
            kd[b, t * ps : (t + 1) * ps] = np.asarray(k_pool)[ids[b, t]].transpose(1, 0, 2)
            vd[b, t * ps : (t + 1) * ps] = np.asarray(v_pool)[ids[b, t]].transpose(1, 0, 2)
    kd[:, S:] = np.asarray(k_new)
    vd[:, S:] = np.asarray(v_new)

    pos = np.arange(S + T)
    valid = np.zeros((B, T, S + T), bool)
    for b in range(B):
        for tq in range(T):
            valid[b, tq, :S] = (pos[:S] >= pads[b]) & (pos[:S] < lengths[b])
            valid[b, tq, S : S + tq + 1] = True
    bias = jnp.where(jnp.asarray(valid)[:, None, :, :], 0.0, -1e30)
    ref = dot_product_attention(q, jnp.asarray(kd), jnp.asarray(vd), bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_kernel_multi_query_matches_reference_interpret():
    """Pallas kernel at T = 3 (causal fresh-block fold) == XLA oracle."""
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case_T(seed=4)
    out_k = paged_decode_attention(
        q, k_pool, v_pool, ids, lengths, pads, k_new, v_new, interpret=True
    )
    out_r = paged_reference(q, k_pool, v_pool, ids, lengths, pads, k_new, v_new)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), rtol=2e-5, atol=2e-5)


def test_write_tokens_matches_sequential_write_token():
    """write_tokens (the spec verification write, T tokens per row,
    page-boundary crossings included) == T sequential write_token calls."""
    from llm_speech_summarization_tpu.infer.paged import write_token, write_tokens

    L, Hkv, Dh, ps, mp, B, T = 2, 2, 8, 4, 4, 3, 3
    rng = np.random.RandomState(0)
    cache = init_paged_cache(
        L, Hkv, Dh, num_pages=1 + B * mp, page_size=ps, batch=B,
        max_pages_per_seq=mp, dtype=jnp.float32,
    )
    ids = np.arange(1, 1 + B * mp).reshape(B, mp).astype(np.int32)
    cache = cache._replace(page_table=jnp.asarray(ids))
    # positions straddle a page boundary on row 0 (3,4,5), run mid-page on
    # row 1, and run off the end of the table on row 2 (→ null page)
    positions = np.array(
        [[3, 4, 5], [6, 7, 8], [mp * ps - 2, mp * ps - 1, mp * ps]], np.int32
    )
    k_new = rng.randn(L, B, T, Hkv, Dh).astype(np.float32)
    v_new = rng.randn(L, B, T, Hkv, Dh).astype(np.float32)

    got = write_tokens(cache, jnp.asarray(k_new), jnp.asarray(v_new),
                       positions=jnp.asarray(positions))
    want = cache
    for t in range(T):
        want = write_token(
            want, jnp.asarray(k_new[:, :, t]), jnp.asarray(v_new[:, :, t]),
            positions=jnp.asarray(positions[:, t]),
        )
    np.testing.assert_array_equal(np.asarray(got.k_pool), np.asarray(want.k_pool))
    np.testing.assert_array_equal(np.asarray(got.v_pool), np.asarray(want.v_pool))
    # null page absorbed row 2's off-table token; real pages 1.. unchanged
    # by it (write_token routes off-table positions to page 0 too)


def test_page_allocator():
    a = PageAllocator(8)  # pages 1..7 usable
    assert a.free_pages == 7
    got = a.alloc(3)
    assert got == [1, 2, 3]
    a.free([2])
    assert a.free_pages == 5
    assert a.alloc(1) == [2]
    with pytest.raises(MemoryError):
        a.alloc(10)
    a.free([0])  # null page never recycled
    assert a.free_pages == 4
    assert pages_needed(1, 64) == 1 and pages_needed(64, 64) == 1 and pages_needed(65, 64) == 2


def test_paged_cache_roundtrip_matches_dense():
    """Prefill-write + decode-append + paged attention == dense cache math,
    end to end through the cache manager."""
    L, Hkv, Hq, Dh, ps, mp, B = 2, 2, 4, 128, 64, 3, 2
    cache = init_paged_cache(
        L, Hkv, Dh, num_pages=16, page_size=ps, batch=B, max_pages_per_seq=mp,
        dtype=jnp.float32,
    )
    alloc = PageAllocator(16)
    rng = np.random.RandomState(0)

    T = 2 * ps  # prefill length (page multiple)
    dense_k = np.zeros((B, L, T + 4, Hkv, Dh), np.float32)
    dense_v = np.zeros((B, L, T + 4, Hkv, Dh), np.float32)
    pads = [0, 9]
    for b in range(B):
        kt = rng.randn(L, T, Hkv, Dh).astype(np.float32)
        vt = rng.randn(L, T, Hkv, Dh).astype(np.float32)
        pages = alloc.alloc(pages_needed(T, ps))
        cache = write_prefill_pages(
            cache, jnp.int32(b), jnp.asarray(pages, jnp.int32),
            jnp.asarray(kt), jnp.asarray(vt), jnp.int32(pads[b]),
        )
        dense_k[b, :, :T] = kt.transpose(0, 1, 2, 3)
        dense_v[b, :, :T] = vt.transpose(0, 1, 2, 3)

    # two decode appends (second crosses a page boundary at T+1? no: T is a
    # page multiple, so the FIRST append needs a fresh page via grow_pages)
    n_appended = 0
    for step in range(2):
        cache, grew = grow_pages(cache, alloc, active_rows=list(range(B)))
        if step == 0:
            assert grew  # lengths sit exactly at a page boundary
        k_new = rng.randn(L, B, Hkv, Dh).astype(np.float32)
        v_new = rng.randn(L, B, Hkv, Dh).astype(np.float32)
        cache = write_decode_token(
            cache, jnp.ones((B,), bool), jnp.asarray(k_new), jnp.asarray(v_new)
        )
        dense_k[:, :, T + step] = k_new.transpose(1, 0, 2, 3)
        dense_v[:, :, T + step] = v_new.transpose(1, 0, 2, 3)
        n_appended += 1

    assert np.asarray(cache.lengths).tolist() == [T + n_appended] * B

    # attention through the paged path (XLA fallback on CPU) vs dense math
    q = jnp.asarray(rng.randn(B, 1, Hq, Dh).astype(np.float32))
    k_fresh = jnp.asarray(rng.randn(B, 1, Hkv, Dh).astype(np.float32))
    v_fresh = jnp.asarray(rng.randn(B, 1, Hkv, Dh).astype(np.float32))
    for layer in range(L):
        out = paged_decode_attention(
            q, cache.k_pool[layer], cache.v_pool[layer], cache.page_table,
            cache.lengths, cache.pad_lens, k_fresh, v_fresh,
        )
        S = T + n_appended
        kd = np.concatenate([dense_k[:, layer, :S], np.asarray(k_fresh)], axis=1)
        vd = np.concatenate([dense_v[:, layer, :S], np.asarray(v_fresh)], axis=1)
        pos = np.arange(S + 1)[None, :]
        kv_valid = (
            (pos >= np.asarray(cache.pad_lens)[:, None]) & (pos < S)
        ) | (pos == S)
        bias = make_attention_bias(jnp.ones((B, 1), bool), jnp.asarray(kv_valid), causal=False)
        ref = dot_product_attention(q, jnp.asarray(kd), jnp.asarray(vd), bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # freeing a row returns its pages
    before = alloc.free_pages
    cache = free_row(cache, alloc, 0)
    assert alloc.free_pages == before + 3  # 2 prefill pages + 1 grown
    assert int(cache.lengths[0]) == 0


@pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
def test_slot_decoder_paged_matches_dense(cache_dtype):
    """SlotDecoder(paged=True) emits exactly the dense slot decoder's
    tokens — full admit → chunk → harvest → re-admit lifecycle, including
    page growth across chunk boundaries and page recycling. int8 pools
    quantize identically to the dense int8 cache (same per-row absmax at
    prefill scatter and decode append), so tokens stay identical there
    too."""
    import jax

    from llm_speech_summarization_tpu.infer.slots import SlotDecoder
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    def run(paged):
        dec = SlotDecoder(
            params, cfg, eos_id=0, n_slots=4, max_prompt_len=128,
            max_new_tokens=16, cache_dtype=jnp.dtype(cache_dtype),
            paged=paged, page_size=64,
        )
        rng = np.random.RandomState(0)
        table = params["embed_tokens"]
        outs = {}
        # wave 1: two prompts, different budgets
        ids = rng.randint(1, cfg.vocab_size, (2, 64))
        embeds = table[jnp.asarray(ids)]
        dec.admit(embeds, jnp.ones((2, 64), bool), [0, 1], [5, 16])
        dec.decode_chunk(8)  # row 0 finishes (budget 5)
        for s, toks, n in dec.harvest():
            outs[("w1", s)] = toks[:n].tolist()
        # wave 2 admits into the freed slot mid-decode (page recycling)
        ids2 = rng.randint(1, cfg.vocab_size, (1, 64))
        dec.admit(table[jnp.asarray(ids2)], jnp.ones((1, 64), bool), [2], [9])
        for _ in range(4):
            dec.decode_chunk(8)
        for s, toks, n in dec.harvest():
            outs[("w2", s)] = toks[:n].tolist()
        return outs

    dense = run(False)
    paged = run(True)
    assert dense.keys() == paged.keys()
    for k in dense:
        assert dense[k] == paged[k], (k, dense[k], paged[k])
    assert ("w1", 0) in dense and len(dense[("w1", 0)]) == 5


def test_paged_kernel_int8_interpret():
    """int8 pools + per-slot scales: kernel == oracle == dequantized dense.
    q is scaled down so logits stay O(1) — int8 K values reach ±30, and a
    sharp softmax would amplify bf16 rounding into spurious output diffs."""
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case(seed=4)
    q = q * 0.05
    rng = np.random.RandomState(9)
    P, Hkv, ps, Dh = k_pool.shape
    k_scale = jnp.asarray(0.5 + rng.rand(P, Hkv, ps), jnp.bfloat16)
    v_scale = jnp.asarray(0.5 + rng.rand(P, Hkv, ps), jnp.bfloat16)
    k8 = jnp.clip(jnp.round(k_pool * 10), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v_pool * 10), -127, 127).astype(jnp.int8)
    cast = lambda x: x.astype(jnp.bfloat16)  # noqa: E731

    out_k = paged_decode_attention(
        cast(q), k8, v8, ids, lengths, pads, cast(k_new), cast(v_new),
        k_scale=k_scale, v_scale=v_scale, interpret=True,
    )
    out_r = paged_reference(
        cast(q), k8, v8, ids, lengths, pads, cast(k_new), cast(v_new),
        k_scale=k_scale, v_scale=v_scale,
    )
    # relative tolerance: the kernel folds scales in f32 AFTER the int8
    # matmul while the oracle rounds k·scale to bf16 BEFORE it — both are
    # correct int8 attention, differing by bf16 ulp at the output magnitude
    a, b = np.asarray(out_k, np.float32), np.asarray(out_r, np.float32)
    rel = np.abs(a - b) / (np.abs(b) + 1.0)
    assert rel.max() < 2e-2, rel.max()
    # and the oracle itself equals attention over the DEQUANTIZED dense pools
    kd = (k8.astype(jnp.float32) * k_scale[..., None].astype(jnp.float32)).astype(jnp.bfloat16)
    vd = (v8.astype(jnp.float32) * v_scale[..., None].astype(jnp.float32)).astype(jnp.bfloat16)
    out_d = paged_reference(cast(q), kd, vd, ids, lengths, pads, cast(k_new), cast(v_new))
    c = np.asarray(out_d, np.float32)
    rel2 = np.abs(b - c) / (np.abs(c) + 1.0)
    assert rel2.max() < 2e-2, rel2.max()


def test_paged_kernel_int8_multi_query_interpret():
    """int8 pools at T = 4 (speculative verification over quantized pages):
    kernel == oracle, causal fresh block included."""
    T = 4
    q, k_pool, v_pool, ids, lengths, pads, k_new, v_new = _random_paged_case_T(
        seed=7, T=T
    )
    q = q * 0.05
    rng = np.random.RandomState(17)
    P, Hkv, ps, Dh = k_pool.shape
    k_scale = jnp.asarray(0.5 + rng.rand(P, Hkv, ps), jnp.bfloat16)
    v_scale = jnp.asarray(0.5 + rng.rand(P, Hkv, ps), jnp.bfloat16)
    k8 = jnp.clip(jnp.round(k_pool * 10), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v_pool * 10), -127, 127).astype(jnp.int8)
    cast = lambda x: x.astype(jnp.bfloat16)  # noqa: E731

    out_k = paged_decode_attention(
        cast(q), k8, v8, ids, lengths, pads, cast(k_new), cast(v_new),
        k_scale=k_scale, v_scale=v_scale, interpret=True,
    )
    out_r = paged_reference(
        cast(q), k8, v8, ids, lengths, pads, cast(k_new), cast(v_new),
        k_scale=k_scale, v_scale=v_scale,
    )
    a, b = np.asarray(out_k, np.float32), np.asarray(out_r, np.float32)
    rel = np.abs(a - b) / (np.abs(b) + 1.0)
    assert rel.max() < 2e-2, rel.max()


def test_harvest_zeroes_device_table_rows():
    """After harvest frees a finished row's pages, its DEVICE page-table row
    must be zeroed: done slots keep writing their last K/V every chunk, and
    a stale entry would corrupt pages re-allocated to live requests
    (writes sink to the null page 0 instead)."""
    import jax

    from llm_speech_summarization_tpu.infer.slots import SlotDecoder
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    dec = SlotDecoder(params, cfg, eos_id=0, n_slots=4, max_prompt_len=128,
                      max_new_tokens=16, cache_dtype=jnp.float32,
                      paged=True, page_size=64)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.vocab_size, (2, 64))
    embeds = params["embed_tokens"][jnp.asarray(ids)]
    dec.admit(embeds, jnp.ones((2, 64), bool), [0, 1], [4, 16])
    dec.decode_chunk(8)  # row 0 hits its budget
    got = dec.harvest()
    harvested = [s for s, _, _ in got]
    assert 0 in harvested
    table = np.asarray(dec.state.cache.page_table)
    for s in harvested:
        assert (table[s] == 0).all(), table[s]
    # live row keeps its reservation
    assert (table[1] != 0).any()
