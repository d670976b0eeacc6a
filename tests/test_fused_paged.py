"""Fused PAGED decode attention+write kernel (kernels/fused_paged.py):
interpret-mode parity vs the XLA oracle, oracle parity vs the in-tree
paged path (paged_reference attention + infer/paged.py::write_tokens),
and the end-to-end llama_forward attn_impl='fused' paged decode vs the
default paged decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.kernels.fused_paged import (
    fused_paged_decode_write,
    fused_paged_reference,
)


def _case(seed=0, L=2, B=4, Hq=6, Hkv=2, ps=128, mp=3, quantized=True):
    """Distinct pages per row (page 0 = null); lengths hit a 32-window
    interior, a window edge, a fresh page's first slot, and a near-full
    final page."""
    rng = np.random.RandomState(seed)
    P = 1 + B * mp  # null page + mp pages per row
    q = rng.randn(B, 1, Hq, 128).astype(np.float32)
    k_new = rng.randn(B, 1, Hkv, 128).astype(np.float32)
    v_new = rng.randn(B, 1, Hkv, 128).astype(np.float32)
    pads = rng.randint(0, 5, size=(B,)).astype(np.int32)
    lengths = np.array([17, 32, ps, mp * ps - 1] * ((B + 3) // 4))[:B].astype(
        np.int32
    )
    page_table = (1 + np.arange(B * mp, dtype=np.int32)).reshape(B, mp)
    if quantized:
        kp = rng.randint(-127, 128, size=(L, P, Hkv, ps, 128)).astype(np.int8)
        vp = rng.randint(-127, 128, size=(L, P, Hkv, ps, 128)).astype(np.int8)
        ks = (0.02 + 0.1 * rng.rand(L, P, Hkv, ps)).astype(jnp.bfloat16)
        vs = (0.02 + 0.1 * rng.rand(L, P, Hkv, ps)).astype(jnp.bfloat16)
    else:
        kp = rng.randn(L, P, Hkv, ps, 128).astype(np.float32)
        vp = rng.randn(L, P, Hkv, ps, 128).astype(np.float32)
        ks = vs = None
    to = lambda a: None if a is None else jnp.asarray(a)  # noqa: E731
    return tuple(
        map(to, (q, kp, vp, page_table, lengths, pads, k_new, v_new, ks, vs))
    )


def _call(fn, case, layer, interpret=None):
    q, kp, vp, pt, lens, pads, kn, vn, ks, vs = case
    li = jnp.int32(layer)
    kwargs = dict(
        k_scale_layer=None if ks is None else ks[layer],
        v_scale_layer=None if vs is None else vs[layer],
    )
    if interpret is not None:
        kwargs["interpret"] = interpret
    return fn(q, kp, vp, pt, lens, pads, kn, vn, li, **kwargs)


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("layer", [0, 1])
def test_kernel_matches_oracle(quantized, layer):
    case = _case(quantized=quantized)
    ref = _call(fused_paged_reference, case, layer)
    got = _call(fused_paged_decode_write, case, layer, interpret=True)
    assert len(got) == len(ref)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-3, atol=1e-4
    )
    for g, r, name in zip(got[1:], ref[1:], ("k", "v", "ks_new", "vs_new")):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.float32), np.asarray(r).astype(np.float32),
            err_msg=f"buffer {name} (layer {layer})",
        )


def test_oracle_matches_in_tree_paged_path():
    """fused_paged_reference == the current production pair: attention via
    kernels/paged_attention.py::paged_reference over the layer slice, and
    the write via infer/paged.py::write_tokens (values AND the scatter of
    the returned scales)."""
    from llm_speech_summarization_tpu.infer.paged import PagedKVCache, write_tokens
    from llm_speech_summarization_tpu.kernels.paged_attention import paged_reference

    case = _case(quantized=True, seed=3)
    q, kp, vp, pt, lens, pads, kn, vn, ks, vs = case
    layer = 1
    out, kp2, vp2, ksn, vsn = _call(fused_paged_reference, case, layer)

    exp_out = paged_reference(
        q, kp[layer], vp[layer], pt, lens, pads, kn, vn,
        k_scale=ks[layer], v_scale=vs[layer],
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(exp_out), rtol=1e-5, atol=1e-5
    )

    cache = PagedKVCache(
        k_pool=kp, v_pool=vp, page_table=pt, lengths=lens, pad_lens=pads,
        k_scale=ks, v_scale=vs,
    )
    L = kp.shape[0]
    B = kn.shape[0]
    written = write_tokens(
        cache,
        jnp.broadcast_to(kn[None], (L, B) + kn.shape[1:]),  # (L, B, 1, Hkv, Dh)
        jnp.broadcast_to(vn[None], (L, B) + vn.shape[1:]),
    )
    # the fused path writes only layer `layer`; write_tokens wrote all L —
    # compare just that layer's pools/scales
    np.testing.assert_array_equal(
        np.asarray(kp2[layer]), np.asarray(written.k_pool[layer])
    )
    np.testing.assert_array_equal(
        np.asarray(vp2[layer]), np.asarray(written.v_pool[layer])
    )
    # the returned fresh scales == what write_tokens scattered
    ps = cache.page_size
    pid = np.asarray(pt)[np.arange(4), np.asarray(lens) // ps]
    slot = np.asarray(lens) % ps
    np.testing.assert_array_equal(
        np.asarray(ksn).astype(np.float32),
        np.asarray(written.k_scale[layer])[pid, :, slot].astype(np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(vsn).astype(np.float32),
        np.asarray(written.v_scale[layer])[pid, :, slot].astype(np.float32),
    )


@pytest.mark.parametrize("cache_dtype", ["int8", "float32"])
def test_llama_forward_paged_fused_matches_default(cache_dtype):
    """attn_impl='fused' through llama_forward with a PAGED cache == the
    default paged decode path: identical logits, identical pools/scales,
    identical greedy tokens over several steps (CPU → the kernel wrapper's
    oracle fallback, which is what non-TPU backends run)."""
    from llm_speech_summarization_tpu.infer.paged import (
        init_paged_cache, write_prefill_pages_batch,
    )
    from llm_speech_summarization_tpu.models.llama import (
        init_kv_cache, init_llama_params, llama_forward, llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # prompt bucket T0 == one page; a second page per row takes the decodes
    B, T0, ps, mp = 3, 32, 32, 2
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, T0)))
    mask = np.zeros((B, T0), bool)
    for b, real in enumerate([29, 32, 31]):
        mask[b, T0 - real:] = True  # LEFT padding (repo convention)
    pads = (T0 - mask.sum(1)).astype(np.int32)

    # prefill on a DENSE temp cache, then scatter rows into pages — the
    # SlotDecoder admit flow (infer/slots.py)
    dense = init_kv_cache(cfg, B, T0, dtype=jnp.dtype(cache_dtype))
    out = llama_forward(
        params, cfg, input_ids=ids, attn_mask=jnp.asarray(mask),
        kv_cache=dense, cache_offset=jnp.int32(0), last_logit_only=True,
    )
    cache = init_paged_cache(
        cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
        num_pages=1 + B * mp, page_size=ps, batch=B, max_pages_per_seq=mp,
        dtype=jnp.dtype(cache_dtype),
    )
    dkv = out.kv_cache
    k_toks = jnp.transpose(dkv.k, (0, 1, 3, 2, 4))  # (L, B, T0, Hkv, Dh)
    v_toks = jnp.transpose(dkv.v, (0, 1, 3, 2, 4))
    if cache.quantized:
        ksr = jnp.transpose(dkv.k_scale, (0, 1, 3, 2))  # (L, B, T0, Hkv)
        vsr = jnp.transpose(dkv.v_scale, (0, 1, 3, 2))
    else:
        ksr = vsr = None
    prompt_pages = jnp.asarray([[1 + b * mp] for b in range(B)], jnp.int32)
    cache = write_prefill_pages_batch(
        cache, jnp.arange(B, dtype=jnp.int32), prompt_pages,
        k_toks, v_toks, jnp.asarray(pads),
        k_scales=ksr, v_scales=vsr,
    )
    # grow_pages equivalent: a decode page per row
    cache = cache._replace(
        page_table=cache.page_table.at[:, 1].set(
            jnp.asarray([2 + b * mp for b in range(B)], jnp.int32)
        )
    )

    tok = jnp.argmax(out.logits[:, -1], -1)[:, None]
    c_x = c_f = cache
    tx = tf = tok
    for step in range(3):
        pos = jnp.asarray(mask.sum(1) + step, jnp.int32)[:, None]
        ox = llama_forward(
            params, cfg, input_ids=tx, positions=pos, kv_cache=c_x,
        )
        of = llama_forward(
            params, cfg, input_ids=tf, positions=pos, kv_cache=c_f,
            attn_impl="fused",
        )
        np.testing.assert_allclose(
            np.asarray(ox.logits), np.asarray(of.logits), rtol=2e-4, atol=2e-4
        )
        for a, b, name in zip(ox.kv_cache, of.kv_cache, ox.kv_cache._fields):
            if a is not None and isinstance(a, jnp.ndarray):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=1e-5, atol=1e-5, err_msg=f"cache field {name}",
                )
        tx = jnp.argmax(ox.logits[:, 0], -1)[:, None]
        tf = jnp.argmax(of.logits[:, 0], -1)[:, None]
        assert (np.asarray(tx) == np.asarray(tf)).all()
        c_x = ox.kv_cache._replace(lengths=ox.kv_cache.lengths + 1)
        c_f = of.kv_cache._replace(lengths=of.kv_cache.lengths + 1)
