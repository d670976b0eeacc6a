"""Pallas kernel parity vs the XLA reference ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.kernels.decode_attention import decode_attention
from llm_speech_summarization_tpu.kernels.flash_attention import flash_attention
from llm_speech_summarization_tpu.ops.attention import (
    dot_product_attention,
    make_attention_bias,
)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_attention_matches_xla(causal):
    B, T, Hq, Hkv, Dh = 2, 256, 4, 2, 128
    rng = np.random.RandomState(0)
    q = rng.randn(B, T, Hq, Dh).astype(np.float32)
    k = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    v = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    starts = np.array([0, 37], np.int32)  # left padding on sample 1
    ends = np.array([T, T], np.int32)

    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(starts), jnp.asarray(ends), causal=causal, interpret=True,
    )
    pos = np.arange(T)[None, :]
    valid = (pos >= starts[:, None]) & (pos < ends[:, None])
    bias = make_attention_bias(jnp.asarray(valid), jnp.asarray(valid), causal=causal)
    ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    diff = np.abs(np.asarray(out) - np.asarray(ref)) * valid[:, :, None, None]
    assert diff.max() < 5e-5


def test_flash_attention_rightpad_window():
    """Right-padded window (encoder style): valid = [0, n)."""
    B, T, Hq, Hkv, Dh = 2, 128, 4, 4, 128
    rng = np.random.RandomState(1)
    q = rng.randn(B, T, Hq, Dh).astype(np.float32)
    k = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    v = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    starts = np.zeros(2, np.int32)
    ends = np.array([128, 50], np.int32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(starts), jnp.asarray(ends), causal=False, interpret=True,
    )
    pos = np.arange(T)[None, :]
    valid = pos < ends[:, None]
    bias = make_attention_bias(jnp.asarray(valid), jnp.asarray(valid), causal=False)
    ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    diff = np.abs(np.asarray(out) - np.asarray(ref)) * valid[:, :, None, None]
    assert diff.max() < 5e-5


def test_decode_attention_matches_xla():
    B, Hq, Hkv, Dh, S = 2, 4, 2, 128, 256
    offset = 100
    rng = np.random.RandomState(2)
    q = rng.randn(B, 1, Hq, Dh).astype(np.float32)
    k_cache = rng.randn(B, Hkv, S, Dh).astype(np.float32)
    v_cache = rng.randn(B, Hkv, S, Dh).astype(np.float32)
    k_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    v_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    pads = np.array([0, 13], np.int32)

    out = decode_attention(
        jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pads), jnp.int32(offset), interpret=True,
    )

    # XLA reference: concat [cache | fresh], mask [pad, offset) + fresh
    slot = np.arange(S)[None, :]
    kv_valid = (slot >= pads[:, None]) & (slot < offset)
    kv_valid_full = np.concatenate([kv_valid, np.ones((B, 1), bool)], 1)
    kv_idx = np.concatenate([np.arange(S), [offset]]).astype(np.int32)
    bias = make_attention_bias(
        jnp.ones((B, 1), bool), jnp.asarray(kv_valid_full), causal=True,
        q_offset=jnp.full((B,), offset, jnp.int32), kv_idx=jnp.asarray(kv_idx),
    )
    k_att = np.concatenate([k_cache.transpose(0, 2, 1, 3), k_new], axis=1)
    v_att = np.concatenate([v_cache.transpose(0, 2, 1, 3), v_new], axis=1)
    ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k_att), jnp.asarray(v_att), bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_decode_attention_int8_matches_dequantized_xla():
    """Quantized kernel == XLA attention run on the dequantized cache."""
    from llm_speech_summarization_tpu.models.llama import _quantize_kv, dequantize_kv

    B, Hq, Hkv, Dh, S = 2, 4, 2, 128, 256
    offset = 100
    rng = np.random.RandomState(3)
    q = rng.randn(B, 1, Hq, Dh).astype(np.float32)
    k_cache_f = rng.randn(B, Hkv, S, Dh).astype(np.float32)
    v_cache_f = rng.randn(B, Hkv, S, Dh).astype(np.float32)
    k_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    v_new = rng.randn(B, 1, Hkv, Dh).astype(np.float32)
    pads = np.array([0, 13], np.int32)

    kq, ks = _quantize_kv(jnp.asarray(k_cache_f))
    vq, vs = _quantize_kv(jnp.asarray(v_cache_f))

    out = decode_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pads), jnp.int32(offset), k_scale=ks, v_scale=vs,
        interpret=True,
    )

    # XLA reference over the dequantized cache
    k_deq = np.asarray(dequantize_kv(kq, ks, jnp.float32))
    v_deq = np.asarray(dequantize_kv(vq, vs, jnp.float32))
    slot = np.arange(S)[None, :]
    kv_valid = (slot >= pads[:, None]) & (slot < offset)
    kv_valid_full = np.concatenate([kv_valid, np.ones((B, 1), bool)], 1)
    kv_idx = np.concatenate([np.arange(S), [offset]]).astype(np.int32)
    bias = make_attention_bias(
        jnp.ones((B, 1), bool), jnp.asarray(kv_valid_full), causal=True,
        q_offset=jnp.full((B,), offset, jnp.int32), kv_idx=jnp.asarray(kv_idx),
    )
    k_att = np.concatenate([k_deq.transpose(0, 2, 1, 3), k_new], axis=1)
    v_att = np.concatenate([v_deq.transpose(0, 2, 1, 3), v_new], axis=1)
    ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k_att), jnp.asarray(v_att), bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-3, atol=5e-4)


def test_int8_cache_generation_close_to_fp():
    """End-to-end greedy generation with an int8 cache should track the
    full-precision tokens on a tiny model (near-lossless quantization)."""
    from llm_speech_summarization_tpu.infer.generate import greedy_generate
    from llm_speech_summarization_tpu.models.llama import init_llama_params, llama_preset

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, L = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 1, cfg.vocab_size)
    mask = jnp.ones((B, L), bool)
    embeds = params["embed_tokens"][ids]
    toks_fp, _ = greedy_generate(params, cfg, embeds, mask, max_new_tokens=8,
                                 eos_id=257, cache_dtype=jnp.float32)
    toks_q, _ = greedy_generate(params, cfg, embeds, mask, max_new_tokens=8,
                                eos_id=257, cache_dtype=jnp.int8)
    agree = (np.asarray(toks_fp) == np.asarray(toks_q)).mean()
    assert agree >= 0.75, f"int8 cache diverged: agreement {agree}"


@pytest.mark.parametrize("causal", [True, False])
def test_flash_attention_backward_matches_xla(causal):
    """The Pallas FA-2 backward (dq/dk/dv kernels + GQA group-sum) must match
    jax.grad through the XLA reference attention."""
    from llm_speech_summarization_tpu.kernels.flash_attention import _xla_reference

    B, T, Hq, Hkv, Dh = 2, 256, 4, 2, 128
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, T, Hq, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, Hkv, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, Hkv, Dh), jnp.float32)
    starts = jnp.asarray(np.array([0, 37], np.int32))
    ends = jnp.asarray(np.array([T, T - 11], np.int32))
    g = jnp.asarray(rng.randn(B, T, Hq, Dh), jnp.float32)
    # zero cotangents at invalid query rows: forward emits garbage there
    # (contract: callers mask downstream), so gradients only compare on
    # the valid window
    pos = np.arange(T)[None, :]
    valid = (pos >= np.asarray(starts)[:, None]) & (pos < np.asarray(ends)[:, None])
    g = g * jnp.asarray(valid)[:, :, None, None]

    def flash_loss(q, k, v):
        out = flash_attention(q, k, v, starts, ends, causal=causal, interpret=True)
        return jnp.vdot(out, g)

    def ref_loss(q, k, v):
        return jnp.vdot(_xla_reference(q, k, v, starts, ends, causal), g)

    got = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("q k v".split(), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_flash_attention_backward_dh64():
    """Encoder shape (Dh=64, non-causal, right-padded window)."""
    from llm_speech_summarization_tpu.kernels.flash_attention import _xla_reference

    B, T, H, Dh = 2, 256, 4, 64
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, T, H, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, H, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, H, Dh), jnp.float32)
    starts = jnp.zeros((B,), jnp.int32)
    ends = jnp.asarray(np.array([T, 150], np.int32))
    g = jnp.asarray(rng.randn(B, T, H, Dh), jnp.float32)
    valid = np.arange(T)[None, :] < np.asarray(ends)[:, None]
    g = g * jnp.asarray(valid)[:, :, None, None]

    got = jax.grad(
        lambda q, k, v: jnp.vdot(
            flash_attention(q, k, v, starts, ends, causal=False, interpret=True), g
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    want = jax.grad(
        lambda q, k, v: jnp.vdot(_xla_reference(q, k, v, starts, ends, False), g),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b in zip("q k v".split(), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("T", [320, 64, 192])
def test_flash_attention_64_granular_tiles(T):
    """Full-T / 64-granular blocks (the prefill bucket is 64 now): parity
    with XLA at shapes that are NOT 128-multiples."""
    B, Hq, Hkv, Dh = 2, 4, 2, 128
    rng = np.random.RandomState(3)
    q = rng.randn(B, T, Hq, Dh).astype(np.float32)
    k = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    v = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    starts = np.array([0, T // 3], np.int32)
    ends = np.array([T, T], np.int32)

    from llm_speech_summarization_tpu.kernels.flash_attention import _pick_block

    assert _pick_block(T) == T  # full-T single block

    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(starts), jnp.asarray(ends), causal=True, interpret=True,
    )
    pos = np.arange(T)[None, :]
    valid = (pos >= starts[:, None]) & (pos < ends[:, None])
    bias = make_attention_bias(jnp.asarray(valid), jnp.asarray(valid), causal=True)
    ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    diff = np.abs(np.asarray(out) - np.asarray(ref)) * valid[:, :, None, None]
    assert diff.max() < 5e-5
