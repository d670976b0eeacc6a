"""Attribute the decode-step gap above the bandwidth roofline.

PERF.md: the B=128/S=448 int8-weights+int8-KV decode step measures
~14 ms against a ~9 ms pure-bandwidth floor, "with the rest in per-layer
non-GEMM ops across 28 sequential scan steps". This script rebuilds the
per-layer computation incrementally — GEMMs only, +norms, +rope,
+attention, +cache-write — each as the same scan-over-layers + fori_loop
structure as the real step (models/llama.py), so the deltas attribute the
gap to specific op families on the real chip.

Run: python scripts/bench_decode_gap.py  (real TPU; ~2 min warm)
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
    fuse_llama_params,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_preset,
    quantize_llama_params,
    _quantize_kv,
)
from llm_speech_summarization_tpu.ops.norms import rms_norm
from llm_speech_summarization_tpu.ops.rope import (
    apply_rope_cached,
    rope_cos_sin,
    rope_inv_freq,
)

STEPS = 32
B, S, OFF = 128, 448, 384
CFG = llama_preset("llama3_3b")


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / STEPS * 1000.0


def _mm(h, lp, name):
    w = lp[name]
    if w.dtype == jnp.int8:
        return (h @ w.astype(h.dtype)) * lp[name + "_scale"].astype(h.dtype)
    return h @ w


def make_partial_loop(level: str):
    """Build a fori_loop of scan-over-layers 'steps' including only the op
    families up to ``level``. Shapes/GEMMs match the real decode step."""
    Hq, Hkv, Dh = CFG.num_heads, CFG.num_kv_heads, CFG.head_dim
    D = CFG.hidden_size

    @jax.jit
    def run(params, cache, x):
        inv = rope_inv_freq(Dh, CFG.rope_theta, CFG.rope_scaling)

        def step(i, carry):
            x, cache = carry
            pos = jnp.full((B, 1), OFF + i, jnp.int32)
            cos, sin = rope_cos_sin(pos, inv)

            def layer(h, xs):
                lp, ckv = xs
                hin = h
                if level != "gemm":
                    h = rms_norm(h, lp["input_norm"], CFG.rms_eps)
                qkv = _mm(h, lp, "wqkv")
                q = qkv[..., : Hq * Dh].reshape(B, 1, Hq, Dh)
                k = qkv[..., Hq * Dh : (Hq + Hkv) * Dh].reshape(B, 1, Hkv, Dh)
                v = qkv[..., (Hq + Hkv) * Dh :].reshape(B, 1, Hkv, Dh)
                if level not in ("gemm", "norms"):
                    q = apply_rope_cached(q, cos, sin)
                    k = apply_rope_cached(k, cos, sin)
                if level in ("gemm", "norms", "rope"):
                    attn = q  # skip the cache read entirely
                else:  # attn / write: the real fused decode attention
                    k_cache, v_cache, k_scale, v_scale = ckv
                    group = Hq // Hkv
                    qg = q.reshape(B, 1, Hkv, group, Dh)
                    s_c = jnp.einsum(
                        "bthgd,bhsd->bthgs", qg, k_cache.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                    ) * k_scale[:, None, :, None, :].astype(jnp.float32)
                    s_c = s_c * (Dh ** -0.5)
                    slot = jnp.arange(S, dtype=jnp.int32)
                    valid = slot[None, :] < (OFF + i)
                    s_c = jnp.where(valid[:, None, None, None, :], s_c, -1e30)
                    s_f = jnp.einsum(
                        "bthgd,bshd->bthgs", qg, k.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                    ) * (Dh ** -0.5)
                    m = jnp.maximum(
                        jnp.max(s_c, -1, keepdims=True),
                        jnp.max(s_f, -1, keepdims=True),
                    )
                    p_c = jnp.exp(s_c - m)
                    p_f = jnp.exp(s_f - m)
                    den = jnp.sum(p_c, -1, keepdims=True) + jnp.sum(
                        p_f, -1, keepdims=True
                    )
                    pv = jnp.einsum(
                        "bthgs,bhsd->bthgd",
                        (p_c * v_scale[:, None, :, None, :].astype(jnp.float32)
                         ).astype(q.dtype),
                        v_cache.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                    ) + jnp.einsum(
                        "bthgs,bshd->bthgd", p_f.astype(q.dtype),
                        v.astype(q.dtype), preferred_element_type=jnp.float32,
                    )
                    attn = (pv / den).reshape(B, 1, Hq, Dh).astype(q.dtype)
                h = hin + _mm(attn.reshape(B, 1, Hq * Dh), lp, "wo")
                hin = h
                if level != "gemm":
                    h = rms_norm(h, lp["post_attn_norm"], CFG.rms_eps)
                I = lp["w_down"].shape[-2]
                gu = _mm(h, lp, "w_gateup")
                h = hin + _mm(jax.nn.silu(gu[..., :I]) * gu[..., I:], lp, "w_down")
                return h, (k, v)

            x, (k_new, v_new) = jax.lax.scan(layer, x, (params["layers"], cache[:4]))
            if level == "write":
                kq, ks = _quantize_kv(k_new.transpose(0, 1, 3, 2, 4))
                vq, vs = _quantize_kv(v_new.transpose(0, 1, 3, 2, 4))

                def wr(buf, new):
                    idx = (0, 0, 0, OFF + i) + (0,) * (buf.ndim - 4)
                    return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype), idx)

                cache = (
                    wr(cache[0], kq), wr(cache[1], vq),
                    wr(cache[2], ks), wr(cache[3], vs), )
            # head projection + argmax (always: it is in the roofline)
            xh = rms_norm(x, params["final_norm"], CFG.rms_eps)
            head = params["embed_tokens"].T
            lg = jnp.einsum("btd,dv->btv", xh, head.astype(xh.dtype),
                            preferred_element_type=jnp.float32)
            lg = lg * params["embed_tokens_scale"].astype(jnp.float32)
            nxt = jnp.argmax(lg[:, 0], -1)
            x = x + 0e-9 * nxt[:, None, None].astype(x.dtype)  # keep live
            return x, cache

        x, cache = jax.lax.fori_loop(0, STEPS, step, (x, cache))
        return x[0, 0, 0], cache[0][0, 0, 0, 0]

    return run


def main():
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    params = quantize_llama_params(fuse_llama_params(params))
    cache = init_kv_cache(CFG, B, S, dtype=jnp.int8)
    cache_t = (cache.k, cache.v, cache.k_scale, cache.v_scale)
    x = jnp.ones((B, 1, CFG.hidden_size), jnp.bfloat16)

    for level in ("gemm", "norms", "rope", "attn", "write"):
        run = make_partial_loop(level)
        ms = timed(run, params, cache_t, x)
        print(f"{level:6s}: {ms:6.2f} ms/step", flush=True)

    # the real product step for reference
    @jax.jit
    def real(params, cache, tok):
        def body(i, carry):
            cache, tok = carry
            out = llama_forward(
                params, CFG, input_ids=tok,
                attn_mask=jnp.ones((B, 1), bool),
                positions=jnp.full((B, 1), OFF + i, jnp.int32),
                kv_cache=cache, cache_offset=jnp.int32(OFF) + i,
                kv_pad_lens=jnp.zeros((B,), jnp.int32),
            )
            return out.kv_cache, jnp.argmax(
                out.logits[:, 0], -1
            ).astype(jnp.int32)[:, None]

        cache, tok = jax.lax.fori_loop(0, STEPS, body, (cache, tok))
        return tok, cache.k[0, 0, 0, 0]

    ms = timed(real, params, cache, jnp.ones((B, 1), jnp.int32))
    print(f"real  : {ms:6.2f} ms/step (llama_forward, int8 weights+KV)", flush=True)


if __name__ == "__main__":
    main()
