"""Isolate the decode cache-write cost (scripts/bench_decode_gap.py found
+2.66 ms/step vs a ~0.1 ms bandwidth floor at B=128/S=448 int8).

Each case runs a fori_loop of STEPS iterations whose body does ONLY the
per-step cache update (plus a trivial compute to keep the loop live),
isolating the write pattern:

  int8_full     — k/v int8 values + bf16 scales, per-step DUS (the product
                  pattern, models/llama.py::write)
  int8_novals   — scales only (isolates the (L,B,Hkv,S) bf16 scatter)
  int8_noscale  — values only (isolates the (L,B,Hkv,S,Dh) int8 scatter)
  bf16_full     — bf16 cache, no scales
  static_off    — int8_full but writing at a STATIC slot (is dynamic-start
                  lowering the problem, or the scatter shape itself?)
  chunk16       — deferred writes: accumulate 16 steps in a small ring
                  buffer, one 16-slot DUS per 16 steps (the candidate fix)
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

STEPS = 32
L, B, Hkv, S, Dh = 28, 128, 8, 448, 128
OFF = 384


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / STEPS * 1000.0


def fresh():
    k = jnp.ones((L, B, Hkv, 1, Dh), jnp.bfloat16)
    return k


def make(case):
    @jax.jit
    def run(kc, vc, ks, vs, x):
        def body(i, carry):
            kc, vc, ks, vs, x = carry
            x = x * 1.000001
            newv = x[None, :, None, None, :Dh] * jnp.ones(
                (L, B, Hkv, 1, Dh), jnp.bfloat16
            )
            q8 = newv.astype(jnp.int8)
            sc = jnp.max(newv, -1).astype(jnp.bfloat16)
            off = OFF + i if case != "static_off" else OFF

            def dus(buf, upd):
                idx = (0, 0, 0, off) + (0,) * (buf.ndim - 4)
                return jax.lax.dynamic_update_slice(buf, upd.astype(buf.dtype), idx)

            if case in ("int8_full", "static_off"):
                kc = dus(kc, q8)
                vc = dus(vc, q8)
                ks = dus(ks, sc)
                vs = dus(vs, sc)
            elif case == "int8_novals":
                ks = dus(ks, sc)
                vs = dus(vs, sc)
            elif case == "int8_noscale":
                kc = dus(kc, q8)
                vc = dus(vc, q8)
            elif case == "bf16_full":
                kc = dus(kc, newv)
                vc = dus(vc, newv)
            return kc, vc, ks, vs, x

        out = jax.lax.fori_loop(0, STEPS, body, (kc, vc, ks, vs, x))
        return out[0][0, 0, 0, 0, 0], out[2][0, 0, 0, 0], out[4][0, 0]

    @jax.jit
    def run_chunk(kc, vc, ks, vs, x):
        C = 16
        ringk = jnp.zeros((L, B, Hkv, C, Dh), jnp.int8)
        rings = jnp.zeros((L, B, Hkv, C), jnp.bfloat16)

        def body(c, carry):
            kc, vc, ks, vs, x, rk, rs = carry

            def inner(i, ic):
                x, rk, rs = ic
                x = x * 1.000001
                newv = x[None, :, None, None, :Dh] * jnp.ones(
                    (L, B, Hkv, 1, Dh), jnp.bfloat16
                )
                rk = jax.lax.dynamic_update_slice(
                    rk, newv.astype(jnp.int8), (0, 0, 0, i, 0)
                )
                rs = jax.lax.dynamic_update_slice(
                    rs, jnp.max(newv, -1).astype(jnp.bfloat16), (0, 0, 0, i)
                )
                return x, rk, rs

            x, rk, rs = jax.lax.fori_loop(0, C, inner, (x, rk, rs))
            off = OFF + c * C
            kc = jax.lax.dynamic_update_slice(kc, rk, (0, 0, 0, off, 0))
            vc = jax.lax.dynamic_update_slice(vc, rk, (0, 0, 0, off, 0))
            ks = jax.lax.dynamic_update_slice(ks, rs, (0, 0, 0, off))
            vs = jax.lax.dynamic_update_slice(vs, rs, (0, 0, 0, off))
            return kc, vc, ks, vs, x, rk, rs

        out = jax.lax.fori_loop(0, STEPS // C, body,
                                (kc, vc, ks, vs, x, ringk, rings))
        return out[0][0, 0, 0, 0, 0], out[2][0, 0, 0, 0], out[4][0, 0]

    return run_chunk if case == "chunk16" else run


def main():
    kc = jnp.zeros((L, B, Hkv, S, Dh), jnp.int8)
    vc = jnp.zeros((L, B, Hkv, S, Dh), jnp.int8)
    ks = jnp.zeros((L, B, Hkv, S), jnp.bfloat16)
    vs = jnp.zeros((L, B, Hkv, S), jnp.bfloat16)
    kcb = jnp.zeros((L, B, Hkv, S, Dh), jnp.bfloat16)
    x = jnp.ones((B, 4096), jnp.bfloat16)

    for case in ("int8_full", "int8_novals", "int8_noscale", "bf16_full",
                 "static_off", "chunk16"):
        run = make(case)
        args = (kcb, kcb, ks, vs, x) if case == "bf16_full" else (kc, vc, ks, vs, x)
        ms = timed(run, *args)
        print(f"{case:12s}: {ms:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
