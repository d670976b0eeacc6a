"""Fused decode attention+write kernel: interpret-mode parity vs the XLA
oracle, oracle parity vs the in-tree decode path, and write-content
bit-equality with models/llama.py::_quantize_kv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.kernels.fused_decode import (
    fused_decode_attention_write,
    fused_reference,
)
from llm_speech_summarization_tpu.models.llama import _quantize_kv


def _case(seed=0, L=2, B=4, Hq=6, Hkv=2, S=64, Dh=128, quantized=True,
          uniform=False):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, 1, Hq, Dh).astype(np.float32)
    k_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    v_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    pads = rng.randint(0, 5, size=(B,)).astype(np.int32)
    if uniform:
        offsets = np.full((B,), S - 9, np.int32)
    else:
        # spread across different 32-windows, incl. a window edge
        offsets = np.array([31, 32, S - 1, 17] * ((B + 3) // 4))[:B].astype(np.int32)
    if quantized:
        kc = rng.randint(-127, 128, size=(L, B, Hkv, S, Dh)).astype(np.int8)
        vc = rng.randint(-127, 128, size=(L, B, Hkv, S, Dh)).astype(np.int8)
        ks = (0.02 + 0.1 * rng.rand(L, B, Hkv, S)).astype(jnp.bfloat16)
        vs = (0.02 + 0.1 * rng.rand(L, B, Hkv, S)).astype(jnp.bfloat16)
    else:
        kc = rng.randn(L, B, Hkv, S, Dh).astype(np.float32)
        vc = rng.randn(L, B, Hkv, S, Dh).astype(np.float32)
        ks = vs = None
    to = lambda a: None if a is None else jnp.asarray(a)  # noqa: E731
    return tuple(map(to, (q, kc, vc, k_new, v_new, pads, offsets, ks, vs)))


def _call(fn, case, layer, interpret=None):
    q, kc, vc, kn, vn, pads, offs, ks, vs = case
    li = jnp.int32(layer)
    kwargs = dict(
        k_scale_layer=None if ks is None else ks[layer],
        v_scale_layer=None if vs is None else vs[layer],
    )
    if interpret is not None:
        kwargs["interpret"] = interpret
    res = fn(q, kc, vc, kn, vn, pads, offs, li, **kwargs)
    if fn is fused_reference and len(res) == 5:
        # the oracle returns (B, Hkv, T) scales (round-5 multi-token
        # generalization); the T == 1 base kernel returns (B, Hkv)
        res = res[:3] + (res[3][..., 0], res[4][..., 0])
    return res


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("layer", [0, 1])
def test_kernel_matches_oracle(quantized, layer):
    case = _case(quantized=quantized)
    ref = _call(fused_reference, case, layer)
    got = _call(fused_decode_attention_write, case, layer, interpret=True)
    assert len(got) == len(ref)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-3, atol=1e-4
    )
    for g, r, name in zip(got[1:], ref[1:], ("k", "v", "ks_new", "vs_new")):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.float32), np.asarray(r).astype(np.float32),
            err_msg=f"buffer {name} (layer {layer})",
        )


def test_kernel_uniform_offsets():
    case = _case(quantized=True, uniform=True)
    ref = _call(fused_reference, case, 0)
    got = _call(fused_decode_attention_write, case, 0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-3, atol=1e-4
    )
    for g, r in zip(got[1:], ref[1:]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_oracle_write_matches_quantize_kv():
    """The oracle's value write + returned scales == _quantize_kv + DUS —
    the invariant that keeps fused-decode caches bit-compatible with the
    decode_xla_q path's."""
    case = _case(quantized=True)
    q, kc, vc, kn, vn, pads, offs, ks, vs = case
    _, kc2, _, ksn, _ = _call(fused_reference, case, 1)
    kq, ks_exp = _quantize_kv(np.asarray(kn, np.float32).reshape(4, 2, 1, 128))
    kc_exp = np.asarray(kc).copy()
    for b, off in enumerate(np.asarray(offs)):
        kc_exp[1, b, :, off, :] = np.asarray(kq)[b, :, 0, :]
    np.testing.assert_array_equal(np.asarray(kc2), kc_exp)
    np.testing.assert_array_equal(
        np.asarray(ksn).astype(np.float32),
        np.asarray(ks_exp)[:, :, 0].astype(np.float32),
    )


def test_oracle_attention_matches_decode_xla_q():
    """Oracle attention == llama_forward's decode_xla_q formulation on the
    same inputs (single layer, fresh token included)."""
    from llm_speech_summarization_tpu.models.llama import dequantize_kv

    case = _case(quantized=True, seed=3)
    q, kc, vc, kn, vn, pads, offs, ks, vs = case
    out = _call(fused_reference, case, 0)[0]

    # dense masked attention over the dequantized cache + fresh token
    B, _, Hq, Dh = q.shape
    Hkv, S = kc.shape[2], kc.shape[3]
    kd = dequantize_kv(kc[0], ks[0], jnp.float32)  # (B, Hkv, S, Dh)
    vd = dequantize_kv(vc[0], vs[0], jnp.float32)
    group = Hq // Hkv
    qg = jnp.asarray(q).reshape(B, 1, Hkv, group, Dh)
    s_c = jnp.einsum("bthgd,bhsd->bthgs", qg, kd) * (Dh ** -0.5)
    slot = jnp.arange(S)
    valid = (slot[None, :] >= pads[:, None]) & (slot[None, :] < offs[:, None])
    s_c = jnp.where(valid[:, None, None, None, :], s_c, -1e30)
    s_f = jnp.einsum("bthgd,bshd->bthgs", qg, jnp.asarray(kn)) * (Dh ** -0.5)
    m = jnp.maximum(s_c.max(-1, keepdims=True), s_f.max(-1, keepdims=True))
    p_c, p_f = jnp.exp(s_c - m), jnp.exp(s_f - m)
    den = p_c.sum(-1, keepdims=True) + p_f.sum(-1, keepdims=True)
    pv = jnp.einsum("bthgs,bhsd->bthgd", p_c, vd) + jnp.einsum(
        "bthgs,bshd->bthgd", p_f, jnp.asarray(vn)
    )
    exp = (pv / den).reshape(B, 1, Hq, Dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=2e-3, atol=2e-3)


def _aliased_case(seed=0, L=2, B=4, Hq=6, Hkv=2, S=64, Dh=128):
    from llm_speech_summarization_tpu.kernels.fused_decode import _pad128

    rng = np.random.RandomState(seed)
    Spad = _pad128(S)
    q = jnp.asarray(rng.randn(B, 1, Hq, Dh).astype(np.float32))
    kn = jnp.asarray(rng.randn(B, 1, Hkv, Dh).astype(np.float32))
    vn = jnp.asarray(rng.randn(B, 1, Hkv, Dh).astype(np.float32))
    pads = jnp.asarray(rng.randint(0, 5, size=(B,)).astype(np.int32))
    offs = jnp.asarray(np.array([31, 32, S - 1, 17] * ((B + 3) // 4))[:B]
                       .astype(np.int32))
    kc = jnp.asarray(rng.randint(-127, 128, size=(L, B, Hkv, S, Dh)).astype(np.int8))
    vc = jnp.asarray(rng.randint(-127, 128, size=(L, B, Hkv, S, Dh)).astype(np.int8))
    ks = jnp.zeros((L, B, Hkv, Spad), jnp.bfloat16).at[..., :S].set(
        jnp.asarray(0.02 + 0.1 * rng.rand(L, B, Hkv, S), jnp.bfloat16))
    vs = jnp.zeros((L, B, Hkv, Spad), jnp.bfloat16).at[..., :S].set(
        jnp.asarray(0.02 + 0.1 * rng.rand(L, B, Hkv, S), jnp.bfloat16))
    return q, kc, vc, kn, vn, pads, offs, ks, vs


@pytest.mark.parametrize("layer", [0, 1])
def test_aliased_scale_kernel_matches_oracle(layer):
    """Aliased-scale mode (VERDICT r4 #8): interpret-mode kernel ==
    fused_reference_aliased, including the in-place padded-slab scale
    writes and the untouched other layer."""
    from llm_speech_summarization_tpu.kernels.fused_decode import (
        fused_decode_aliased_scales,
        fused_reference_aliased,
    )

    case = _aliased_case()
    q, kc, vc, kn, vn, pads, offs, ks, vs = case
    li = jnp.int32(layer)
    ref = fused_reference_aliased(q, kc, vc, kn, vn, pads, offs, li, ks, vs)
    got = fused_decode_aliased_scales(
        q, kc, vc, kn, vn, pads, offs, li, ks, vs, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-3, atol=1e-4
    )
    for g, r, name in zip(got[1:], ref[1:], ("k", "v", "ks", "vs")):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.float32), np.asarray(r).astype(np.float32),
            err_msg=f"buffer {name} (layer {layer})",
        )


def test_aliased_scale_oracle_matches_base_reference():
    """The aliased-scale oracle's attention + value writes are the BASE
    oracle's; scales land at (layer, b, :, off) of the padded slab and the
    pad lanes stay untouched."""
    from llm_speech_summarization_tpu.kernels.fused_decode import (
        fused_reference,
        fused_reference_aliased,
    )

    case = _aliased_case(seed=3)
    q, kc, vc, kn, vn, pads, offs, ks, vs = case
    S = kc.shape[3]
    base = fused_reference(
        q, kc, vc, kn, vn, pads, offs, jnp.int32(1),
        k_scale_layer=ks[1][..., :S], v_scale_layer=vs[1][..., :S],
    )
    ali = fused_reference_aliased(
        q, kc, vc, kn, vn, pads, offs, jnp.int32(1), ks, vs
    )
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(ali[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(ali[1]))
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(ali[2]))
    ks2, vs2 = np.asarray(ali[3], np.float32), np.asarray(ali[4], np.float32)
    # base oracle scales are (B, Hkv, T) since round 5; T == 1 here
    ksn, vsn = (
        np.asarray(base[3], np.float32)[..., 0],
        np.asarray(base[4], np.float32)[..., 0],
    )
    exp_ks = np.asarray(ks, np.float32).copy()
    exp_vs = np.asarray(vs, np.float32).copy()
    for b, off in enumerate(np.asarray(offs)):
        exp_ks[1, b, :, off] = ksn[b]
        exp_vs[1, b, :, off] = vsn[b]
    np.testing.assert_array_equal(ks2, exp_ks)
    np.testing.assert_array_equal(vs2, exp_vs)


def test_llama_forward_aliased_scale_mode(monkeypatch):
    """LSS_FUSED_ALIASED_SCALES=1 routes the fused decode scan through the
    padded aliased-scale kernel; logits, cache contents, and scale slabs
    must match the default xs/ys fused path exactly (the mode is a pure
    layout experiment — PERF.md round-5 scale-slab section)."""
    from llm_speech_summarization_tpu.models.llama import (
        init_kv_cache, init_llama_params, llama_forward, llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, L = 2, 8
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, L)))
    mask = jnp.ones((B, L), bool)
    cache = init_kv_cache(cfg, B, L + 4, dtype=jnp.int8)
    out = llama_forward(
        params, cfg, input_ids=ids, attn_mask=mask,
        kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
    )
    tok = jnp.argmax(out.logits[:, -1], -1)[:, None]
    pads = jnp.zeros((B,), jnp.int32)

    def step(c, env):
        monkeypatch.setenv("LSS_FUSED_ALIASED_SCALES", env)
        return llama_forward(
            params, cfg, input_ids=tok, attn_mask=None,
            positions=jnp.full((B, 1), L, jnp.int32), kv_cache=c,
            cache_offset=jnp.int32(L), kv_pad_lens=pads, attn_impl="fused",
        )

    o_xs = step(out.kv_cache, "0")
    o_al = step(out.kv_cache, "1")
    np.testing.assert_allclose(
        np.asarray(o_xs.logits), np.asarray(o_al.logits), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(o_xs.kv_cache, o_al.kv_cache):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5,
        )


# measured on-chip single-step logit delta between the fused kernel and
# the XLA decode formulation (PERF.md round-4 fused-decode section)
KERNEL_DELTA = 2e-4


@pytest.mark.parametrize("cache_dtype", ["int8", "float32"])
def test_fused_margin_aware_stream(cache_dtype):
    """Margin-aware fused-vs-XLA quality contract (VERDICT r4 #6), valid on
    ANY backend (CPU runs the oracle fallback; a weights-available TPU
    environment runs the real kernel via scripts/verify_weights.sh).

    Free-running greedy streams from the two paths may legitimately
    diverge at argmax ties (f32 accumulation-order deltas ~2e-4 flip
    near-degenerate logits). The well-defined assertion: teacher-force the
    XLA path's tokens into BOTH paths for a long stream and require the
    fused argmax to equal the XLA argmax at every step where the XLA
    top1-top2 margin exceeds 2x the measured kernel delta — i.e. the
    kernel may only ever flip genuine ties."""
    from llm_speech_summarization_tpu.models.llama import (
        init_kv_cache, init_llama_params, llama_forward, llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    B, L, STEPS = 4, 16, 24
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, L)))
    pads = np.array([0, 3, 7, 1], np.int32)
    mask = jnp.asarray(np.arange(L)[None, :] >= pads[:, None])
    S = L + STEPS + 1
    cache = init_kv_cache(cfg, B, S, dtype=jnp.dtype(cache_dtype))
    out = llama_forward(
        params, cfg, input_ids=ids, attn_mask=mask,
        kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
    )
    tok = jnp.argmax(out.logits[:, -1], -1)[:, None]
    c_x = c_f = out.kv_cache
    kv_pads = jnp.asarray(pads)
    checked = 0
    for step in range(STEPS):
        off = L + step
        pos = (jnp.sum(mask.astype(jnp.int32), 1) + step)[:, None]
        # attn_mask=None licenses the fused kernel (fresh token always real)
        ox = llama_forward(
            params, cfg, input_ids=tok, attn_mask=None, positions=pos,
            kv_cache=c_x, cache_offset=off, kv_pad_lens=kv_pads,
        )
        of = llama_forward(
            params, cfg, input_ids=tok, attn_mask=None, positions=pos,
            kv_cache=c_f, cache_offset=off, kv_pad_lens=kv_pads,
            attn_impl="fused",
        )
        lx = np.asarray(ox.logits[:, 0], np.float32)
        lf = np.asarray(of.logits[:, 0], np.float32)
        top2 = np.partition(lx, -2, axis=-1)[:, -2:]
        margin = top2[:, 1] - top2[:, 0]
        decided = margin > 2 * KERNEL_DELTA
        assert (
            lx.argmax(-1)[decided] == lf.argmax(-1)[decided]
        ).all(), f"step {step}: fused flipped a decided (margin>4e-4) token"
        checked += int(decided.sum())
        # teacher-force the XLA stream into both paths
        tok = jnp.argmax(ox.logits[:, 0], -1)[:, None]
        c_x, c_f = ox.kv_cache, of.kv_cache
    # random tiny weights produce decided margins essentially always: the
    # contract must actually have been exercised
    assert checked >= B * STEPS // 2


@pytest.mark.parametrize("cache_dtype", ["int8", "float32"])
def test_llama_forward_fused_matches_default(cache_dtype):
    """attn_impl='fused' through llama_forward == the default decode path:
    identical logits, identical cache contents, identical greedy tokens
    over several steps (CPU → the kernel wrapper's oracle fallback, which
    is what non-TPU backends run)."""
    from llm_speech_summarization_tpu.models.llama import (
        init_kv_cache, init_llama_params, llama_forward, llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, L = 3, 12
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, L)))
    mask = jnp.asarray(
        np.array([[0] * 3 + [1] * 9, [1] * 12, [0] * 1 + [1] * 11], bool)
    )
    S = L + 6
    cache = init_kv_cache(cfg, B, S, dtype=jnp.dtype(cache_dtype))
    out = llama_forward(
        params, cfg, input_ids=ids, attn_mask=mask,
        kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
    )
    pad = (L - jnp.sum(mask.astype(jnp.int32), 1)).astype(jnp.int32)
    tok = jnp.argmax(out.logits[:, -1], -1)[:, None]
    c_x = c_f = out.kv_cache
    tx = tf = tok
    for step in range(4):
        off = L + step
        pos = (jnp.sum(mask.astype(jnp.int32), 1) + step)[:, None]
        # attn_mask=None on BOTH: an explicit mask de-licenses the fused
        # kernel (and now raises on an explicit fused request) — this test
        # silently compared XLA to XLA until round 5 caught it
        ox = llama_forward(
            params, cfg, input_ids=tx, attn_mask=None,
            positions=pos, kv_cache=c_x, cache_offset=off, kv_pad_lens=pad,
        )
        of = llama_forward(
            params, cfg, input_ids=tf, attn_mask=None,
            positions=pos, kv_cache=c_f, cache_offset=off, kv_pad_lens=pad,
            attn_impl="fused",
        )
        np.testing.assert_allclose(
            np.asarray(ox.logits), np.asarray(of.logits), rtol=2e-4, atol=2e-4
        )
        for a, b in zip(ox.kv_cache, of.kv_cache):
            if a is not None:
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=1e-5, atol=1e-5,
                )
        tx = jnp.argmax(ox.logits[:, 0], -1)[:, None]
        tf = jnp.argmax(of.logits[:, 0], -1)[:, None]
        assert (np.asarray(tx) == np.asarray(tf)).all()
        c_x, c_f = ox.kv_cache, of.kv_cache


# ---- round 5: multi-token (speculative verification) fused decode ----


def _aliased_case_T(seed=0, L=2, B=4, Hq=6, Hkv=2, S=64, Dh=128, T=5):
    """Aliased-mode case with T fresh tokens; offsets include window-edge
    and window-CROSSING placements ((off % 32) + T > 32) and the S - T
    headroom boundary."""
    from llm_speech_summarization_tpu.kernels.fused_decode import _pad128

    rng = np.random.RandomState(seed)
    Spad = _pad128(S)
    q = jnp.asarray(rng.randn(B, T, Hq, Dh).astype(np.float32))
    kn = jnp.asarray(rng.randn(B, T, Hkv, Dh).astype(np.float32))
    vn = jnp.asarray(rng.randn(B, T, Hkv, Dh).astype(np.float32))
    pads = jnp.asarray(rng.randint(0, 5, size=(B,)).astype(np.int32))
    offs = jnp.asarray(
        np.array([30, 32, S - T, 17] * ((B + 3) // 4))[:B].astype(np.int32)
    )
    kc = jnp.asarray(rng.randint(-127, 128, size=(L, B, Hkv, S, Dh)).astype(np.int8))
    vc = jnp.asarray(rng.randint(-127, 128, size=(L, B, Hkv, S, Dh)).astype(np.int8))
    ks = jnp.zeros((L, B, Hkv, Spad), jnp.bfloat16).at[..., :S].set(
        jnp.asarray(0.02 + 0.1 * rng.rand(L, B, Hkv, S), jnp.bfloat16))
    vs = jnp.zeros((L, B, Hkv, Spad), jnp.bfloat16).at[..., :S].set(
        jnp.asarray(0.02 + 0.1 * rng.rand(L, B, Hkv, S), jnp.bfloat16))
    return q, kc, vc, kn, vn, pads, offs, ks, vs


@pytest.mark.parametrize("T", [2, 5])
@pytest.mark.parametrize("layer", [0, 1])
def test_multitoken_aliased_kernel_matches_oracle(T, layer):
    """T > 1 (spec verification forward): interpret-mode kernel ==
    fused_reference_aliased — attention with the causal fresh block AND the
    [offset, offset+T) value/scale writes, incl. offsets whose window
    crosses a 32-boundary."""
    from llm_speech_summarization_tpu.kernels.fused_decode import (
        fused_decode_aliased_scales,
        fused_reference_aliased,
    )

    case = _aliased_case_T(T=T)
    q, kc, vc, kn, vn, pads, offs, ks, vs = case
    li = jnp.int32(layer)
    ref = fused_reference_aliased(q, kc, vc, kn, vn, pads, offs, li, ks, vs)
    got = fused_decode_aliased_scales(
        q, kc, vc, kn, vn, pads, offs, li, ks, vs, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-3, atol=1e-4
    )
    for g, r, name in zip(got[1:], ref[1:], ("k", "v", "ks", "vs")):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.float32), np.asarray(r).astype(np.float32),
            err_msg=f"buffer {name} (layer {layer}, T {T})",
        )


def test_multitoken_oracle_matches_decode_xla_q_math():
    """T > 1 oracle attention == the dense decode_xla_q formulation (cache
    window + causal fresh block), same construction as the T == 1 test."""
    from llm_speech_summarization_tpu.models.llama import dequantize_kv

    T = 4
    case = _case(quantized=True, seed=7)
    q1, kc, vc, _, _, pads, offs, ks, vs = case
    B, _, Hq, Dh = q1.shape
    Hkv, S = kc.shape[2], kc.shape[3]
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(B, T, Hq, Dh).astype(np.float32))
    kn = jnp.asarray(rng.randn(B, T, Hkv, Dh).astype(np.float32))
    vn = jnp.asarray(rng.randn(B, T, Hkv, Dh).astype(np.float32))
    offs = jnp.minimum(offs, S - T)
    out = fused_reference(
        q, kc, vc, kn, vn, pads, offs, jnp.int32(0),
        k_scale_layer=ks[0], v_scale_layer=vs[0],
    )[0]

    kd = dequantize_kv(kc[0], ks[0], jnp.float32)
    vd = dequantize_kv(vc[0], vs[0], jnp.float32)
    group = Hq // Hkv
    qg = q.reshape(B, T, Hkv, group, Dh)
    s_c = jnp.einsum("bthgd,bhsd->bthgs", qg, kd) * (Dh ** -0.5)
    slot = jnp.arange(S)
    valid = (slot[None, :] >= pads[:, None]) & (slot[None, :] < offs[:, None])
    s_c = jnp.where(valid[:, None, None, None, :], s_c, -1e30)
    s_f = jnp.einsum("bthgd,bshd->bthgs", qg, kn) * (Dh ** -0.5)
    causal = jnp.arange(T)[:, None] >= jnp.arange(T)[None, :]
    s_f = jnp.where(causal[None, :, None, None, :], s_f, -1e30)
    m = jnp.maximum(s_c.max(-1, keepdims=True), s_f.max(-1, keepdims=True))
    p_c, p_f = jnp.exp(s_c - m), jnp.exp(s_f - m)
    den = p_c.sum(-1, keepdims=True) + p_f.sum(-1, keepdims=True)
    pv = jnp.einsum("bthgs,bhsd->bthgd", p_c, vd) + jnp.einsum(
        "bthgs,bshd->bthgd", p_f, vn
    )
    exp = (pv / den).reshape(B, T, Hq, Dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=2e-3, atol=2e-3)


def test_llama_forward_fused_spec_verify_matches_default():
    """attn_impl='fused' on a T=3 verification forward (int8 cache,
    attn_mask=None, per-row offsets) == the decode_xla_q default: logits
    AND post-write cache contents. This is the llama_forward surface the
    slot scheduler's spec chunks call (infer/slots.py::_spec_chunk_fn)."""
    from llm_speech_summarization_tpu.models.llama import (
        init_kv_cache, init_llama_params, llama_forward, llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, L, K1 = 3, 12, 3
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, L)))
    pads = np.array([0, 4, 2], np.int32)
    mask = jnp.asarray(np.arange(L)[None, :] >= pads[:, None])
    S = 32  # fused alignment (S % 32 == 0) with K1 headroom
    cache = init_kv_cache(cfg, B, S, dtype=jnp.int8)
    out = llama_forward(
        params, cfg, input_ids=ids, attn_mask=mask,
        kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
    )
    seq = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, K1)))
    offsets = jnp.asarray([L, L, L], jnp.int32)  # per-row form (spec path)
    positions = (offsets - jnp.asarray(pads))[:, None] + jnp.arange(K1)[None, :]
    kw = dict(
        input_ids=seq, attn_mask=None, positions=positions,
        kv_cache=out.kv_cache, cache_offset=offsets,
        kv_pad_lens=jnp.asarray(pads),
    )
    o_x = llama_forward(params, cfg, attn_impl="xla", **kw)
    o_f = llama_forward(params, cfg, attn_impl="fused", **kw)
    np.testing.assert_allclose(
        np.asarray(o_x.logits), np.asarray(o_f.logits), rtol=2e-4, atol=2e-4
    )
    assert (
        np.asarray(jnp.argmax(o_x.logits, -1))
        == np.asarray(jnp.argmax(o_f.logits, -1))
    ).all()
    for a, b, name in zip(o_x.kv_cache, o_f.kv_cache, o_x.kv_cache._fields):
        if a is not None:
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=name,
            )
