"""Measure this chip's sustained GEMM rate AT THE PREFILL SHAPES.

VERDICT r4 weak #6: PERF.md's prefill attribution concluded "147 TF/s
effective", ABOVE the 125-135 TF/s 'measured sustained' ceiling — an
impossible number if that ceiling were real. But the 125-135 figure was
inferred by normalizing the KD train step (a mixed GEMM/attention/conv
program), and the only direct measurement in PERF.md (85 TF/s bf16 at
(8192,3072,8192)) is a single odd shape. This script measures the thing
the attribution actually needs: a 28-layer chain of the EXACT fused
prefill GEMMs — (B·T,3072)@(3072,5120) wqkv, (B·T,3072)@(3072,3072) wo,
(B·T,3072)@(3072,16384) gateup, (B·T,8192)@(8192,3072) down — chained
through the activation like the real program, bf16 and weight-int8
variants, at B·T = 64·384.

Timing rule: jax.block_until_ready does NOT sync on axon — every timing
forces a host transfer (np.asarray), per CLAUDE.md.

Run: timeout 600 python scripts/bench_gemm_ceiling.py  (real TPU)
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

L = 28
D, QKV, I = 3072, 5120, 8192
BT = 64 * 384


def build(int8: bool):
    # weights are built ON DEVICE (jitted init): materializing ~5.6 GB on
    # the host and shipping it through the axon tunnel took >10 min
    @jax.jit
    def init():
        key = jax.random.PRNGKey(0)

        def w(k, m, n):
            a = jax.random.normal(k, (L, m, n), jnp.float32) / (m ** 0.5)
            if int8:
                s = jnp.abs(a).max(axis=1, keepdims=True) / 127.0 + 1e-8
                return (
                    jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8),
                    s.astype(jnp.bfloat16),
                )
            return a.astype(jnp.bfloat16), None

        ks = jax.random.split(key, 4)
        return dict(
            wqkv=w(ks[0], D, QKV), wo=w(ks[1], D, D),
            wgu=w(ks[2], D, 2 * I), wd=w(ks[3], I, D),
        )

    stacked = init()
    # scale shape: (L, 1, n) -> per-layer (1, n), broadcasting like before

    def mm(x, wpair):
        wt, sc = wpair
        y = jnp.dot(x, wt.astype(jnp.bfloat16))
        if sc is not None:
            y = y * sc.astype(jnp.bfloat16)
        return y

    @jax.jit
    def chain(x, ls):
        def body(h, lp):
            a = mm(h, lp["wqkv"])  # (BT, 5120)
            h = h + mm(a[:, :D], lp["wo"])
            g = mm(h, lp["wgu"])
            h = h + mm(g[:, :I] * g[:, I:], lp["wd"])
            return h, None

        h, _ = jax.lax.scan(body, x, ls)
        # return a TINY value: returning h itself hauls 151 MB back
        # through the axon tunnel per timed call (~4 s of pure transfer,
        # 5x the compute being measured)
        return jnp.sum(h[:8, :8])

    return stacked, chain


def main():
    assert jax.default_backend() != "cpu", "run on the real chip"
    x = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (BT, D), jnp.float32)
        .astype(jnp.bfloat16)
    )()
    flop = 2 * BT * L * (D * QKV + D * D + D * 2 * I + I * D)
    print(f"chain FLOPs = {flop/1e12:.1f} TF at BT={BT}", flush=True)
    for int8 in (False, True):
        ls, chain = build(int8)
        np.asarray(chain(x, ls))  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chain(x, ls))
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1000
        print(
            f"{'int8' if int8 else 'bf16'} weights: {ms:7.1f} ms → "
            f"{flop/(ms/1000)/1e12:6.1f} TF/s sustained",
            flush=True,
        )


if __name__ == "__main__":
    main()
