"""Attribute the prefill gap: measured ~1.25 s at B=64 x T=384 vs the
"~0.75 s compute floor" PERF.md quoted from the 197 TFLOP/s peak.

The floor arithmetic first: prefill executes ~2·P_matmul·B·T matmul FLOPs
(attention adds ~0.1% at T=384 — it is NOT the flash kernel's fault).
Against the chip's MEASURED sustained large-GEMM rate (125-135 TFLOP/s,
PERF.md "int8 matmul reality check"), not peak, the realistic floor is
2·2.82e9·64·384 / 130e12 ≈ 1.07 s. This script measures where the rest
goes, incrementally (same structure as bench_decode_gap.py):

  gemm     — the prefill GEMM skeleton only (fused wqkv/gateup, int8)
  +flash   — plus the Pallas flash attention at full T
  +write   — plus the quantized KV-cache prefill write
  real     — llama_forward prefill (last_logit_only), the engine path
  real_bf16— same but bf16 weights (int8 dequant overhead on a
             compute-bound phase was +6% in round 2)

Run: python scripts/bench_prefill_gap.py  (real TPU)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from llm_speech_summarization_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from llm_speech_summarization_tpu.models.llama import (
    _quantize_kv,
    fuse_llama_params,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_preset,
)
from llm_speech_summarization_tpu.models.llama import quantize_llama_params
from llm_speech_summarization_tpu.kernels.flash_attention import flash_attention
from llm_speech_summarization_tpu.ops.norms import rms_norm
from llm_speech_summarization_tpu.ops.rope import (
    apply_rope_cached,
    rope_cos_sin,
    rope_inv_freq,
)

B, T = 64, 384
CFG = llama_preset("llama3_3b")


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def _mm(h, lp, name):
    w = lp[name]
    if w.dtype == jnp.int8:
        return (h @ w.astype(h.dtype)) * lp[name + "_scale"].astype(h.dtype)
    return h @ w


def make_partial(level: str):
    Hq, Hkv, Dh = CFG.num_heads, CFG.num_kv_heads, CFG.head_dim

    @jax.jit
    def run(params, x, pad_lens):
        inv = rope_inv_freq(Dh, CFG.rope_theta, CFG.rope_scaling)
        pos = jnp.maximum(
            jnp.arange(T)[None, :] - pad_lens[:, None], 0
        ).astype(jnp.int32)
        cos, sin = rope_cos_sin(pos, inv)
        ends = jnp.full((B,), T, jnp.int32)

        def layer(h, lp):
            hin = h
            h = rms_norm(h, lp["input_norm"], CFG.rms_eps)
            qkv = _mm(h, lp, "wqkv")
            q = qkv[..., : Hq * Dh].reshape(B, T, Hq, Dh)
            k = qkv[..., Hq * Dh : (Hq + Hkv) * Dh].reshape(B, T, Hkv, Dh)
            v = qkv[..., (Hq + Hkv) * Dh :].reshape(B, T, Hkv, Dh)
            q = apply_rope_cached(q, cos, sin)
            k = apply_rope_cached(k, cos, sin)
            if level == "gemm":
                attn = q
            else:
                attn = flash_attention(q, k, v, pad_lens, ends, causal=True)
            h = hin + _mm(attn.reshape(B, T, Hq * Dh), lp, "wo")
            hin = h
            h = rms_norm(h, lp["post_attn_norm"], CFG.rms_eps)
            I = lp["w_down"].shape[-2]
            gu = _mm(h, lp, "w_gateup")
            h = hin + _mm(jax.nn.silu(gu[..., :I]) * gu[..., I:], lp, "w_down")
            if level == "write":
                kq, ks = _quantize_kv(k.transpose(0, 2, 1, 3))
                vq, vs = _quantize_kv(v.transpose(0, 2, 1, 3))
                return h, (kq, ks, vq, vs)
            return h, None

        x, ys = jax.lax.scan(lambda c, lp: layer(c, lp), x, params["layers"])
        xh = rms_norm(x[:, -1:, :], params["final_norm"], CFG.rms_eps)
        head = params["embed_tokens"].T
        lg = jnp.einsum("btd,dv->btv", xh, head.astype(xh.dtype),
                        preferred_element_type=jnp.float32)
        if "embed_tokens_scale" in params:
            lg = lg * params["embed_tokens_scale"].astype(jnp.float32)
        if level == "write":
            return jnp.argmax(lg[:, 0], -1), ys[0][0, 0, 0, 0]
        return jnp.argmax(lg[:, 0], -1)

    return run


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(0.02 * rng.randn(B, T, CFG.hidden_size), jnp.bfloat16)
    pad_lens = jnp.asarray(rng.randint(0, 64, size=(B,)), jnp.int32)

    base = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    params_bf16 = fuse_llama_params(base)

    flop = 2 * 2.82e9 * B * T
    print(f"matmul FLOPs ≈ {flop/1e12:.0f} TF; floor @130 TF/s ≈ "
          f"{flop/130e12*1000:.0f} ms, @197 peak ≈ {flop/197e12*1000:.0f} ms",
          flush=True)

    # the real engine prefill (embeds path, cache write, last logit)
    @jax.jit
    def real(params, x, pad_lens):
        mask = jnp.arange(T)[None, :] >= pad_lens[:, None]
        cache = init_kv_cache(CFG, B, T + 64, dtype=jnp.int8)
        out = llama_forward(
            params, CFG, inputs_embeds=x, attn_mask=mask,
            kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
        )
        return jnp.argmax(out.logits[:, 0], -1), out.kv_cache.k[0, 0, 0, 0]

    # bf16 first: quantize_llama_params DONATES its input tree, so the
    # bf16 params don't survive it (and a device copy would double HBM)
    ms = timed(real, params_bf16, x, pad_lens)
    print(f"real_bf16: {ms:7.1f} ms (bf16 weights)", flush=True)

    params = quantize_llama_params(params_bf16)
    del params_bf16  # donated

    for level in ("gemm", "flash", "write"):
        ms = timed(make_partial(level), params, x, pad_lens)
        print(f"{level:9s}: {ms:7.1f} ms", flush=True)

    ms = timed(real, params, x, pad_lens)
    print(f"real     : {ms:7.1f} ms (llama_forward prefill, int8 weights)",
          flush=True)

    # the serving point (B=128) for the pipeline-share claim
    B2 = 128
    x2 = jnp.asarray(0.02 * rng.randn(B2, T, CFG.hidden_size), jnp.bfloat16)
    pl2 = jnp.asarray(rng.randint(0, 64, size=(B2,)), jnp.int32)

    @jax.jit
    def real128(params, x, pad_lens):
        mask = jnp.arange(T)[None, :] >= pad_lens[:, None]
        cache = init_kv_cache(CFG, B2, T + 64, dtype=jnp.int8)
        out = llama_forward(
            params, CFG, inputs_embeds=x, attn_mask=mask,
            kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
        )
        return jnp.argmax(out.logits[:, 0], -1), out.kv_cache.k[0, 0, 0, 0]

    ms = timed(real128, params, x2, pl2)
    flop2 = 2 * 2.82e9 * B2 * T
    print(f"real B128: {ms:7.1f} ms (int8; {flop2/1e12:.0f} TF → "
          f"{flop2/(ms/1000)/1e12:.0f} TF/s effective)", flush=True)


if __name__ == "__main__":
    main()
