"""Decode-step breakdown on the real chip (VERDICT r1 #3).

Times a fori_loop of decode steps (one jitted program, host-sync at the
end) under ablations that isolate each HBM/compute term:

  full        — logits + sampling + cache read/write (the product step)
  no_head     — compute_logits=False (isolates the lm_head read)
  tiny_cache  — S=64 (isolates KV-cache streaming)
  bf16_cache  — unquantized cache (KV traffic x2 vs int8)

Roofline at B=128 / S=448 / int8: weights ~7.8 ms + KV ~1.5 ms + head
~1 ms -> ~10 ms/step.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from llm_speech_summarization_tpu.models.llama import (
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_preset,
)

STEPS = 32


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a) if hasattr(a, "dtype") else a, out)
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    np.asarray(leaves[0])
    return (time.perf_counter() - t0) / STEPS * 1000.0


def make_loop(cfg, B, S, offset, cache_dtype, compute_logits=True, unroll=1):
    @jax.jit
    def run(params, cache, tok):
        def body(i, carry):
            cache, tok = carry
            out = llama_forward(
                params, cfg,
                input_ids=tok,
                attn_mask=jnp.ones((B, 1), bool),
                positions=jnp.full((B, 1), offset + i, jnp.int32),
                kv_cache=cache,
                cache_offset=jnp.int32(offset) + i,
                kv_pad_lens=jnp.zeros((B,), jnp.int32),
                compute_logits=compute_logits,
                scan_unroll=unroll,
            )
            nxt = (
                jnp.argmax(out.logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
                if compute_logits
                else tok
            )
            return out.kv_cache, nxt

        cache, tok = jax.lax.fori_loop(0, STEPS, body, (cache, tok))
        return tok, cache.k[0, 0, 0, 0]

    return run


def main():
    cfg = llama_preset("llama3_3b")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    for B in (128,):
        for name, S, cdt, logits, unroll in (
            ("full_int8_S448_u2", 448, jnp.int8, True, 2),
            ("full_int8_S448_u4", 448, jnp.int8, True, 4),
            ("full_int8_S448_u7", 448, jnp.int8, True, 7),
        ):
            offset = min(S - STEPS - 1, 384)
            cache = init_kv_cache(cfg, B, S, dtype=cdt)
            tok = jnp.ones((B, 1), jnp.int32)
            run = make_loop(cfg, B, S, offset, cdt, logits, unroll)
            ms = timed(run, params, cache, tok)
            print(f"B={B} {name}: {ms:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
