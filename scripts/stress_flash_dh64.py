"""Stress the Dh=64 encoder flash kernel on the real chip (VERDICT r1 #2).

Runs the exact HuBERT-large bench shape (B=128, T=512, H=16, Dh=64,
non-causal, ends=499) repeatedly with host syncs, checking values against
the XLA reference once. Exit code 0 = no fault observed.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from llm_speech_summarization_tpu.kernels.flash_attention import (
    _xla_reference,
    flash_attention,
)

B, T, H, Dh = 128, 512, 16, 64
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, T, H, Dh), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, T, H, Dh), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, T, H, Dh), jnp.bfloat16)
starts = jnp.zeros((B,), jnp.int32)
ends = jnp.full((B,), 499, jnp.int32)

print(f"backend={jax.default_backend()} iters={ITERS}", flush=True)

out = np.asarray(flash_attention(q, k, v, starts, ends, causal=False), np.float32)
ref = np.asarray(
    _xla_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        starts, ends, False,
    ),
    np.float32,
)
err = np.max(np.abs(out[:, :499] - ref[:, :499]))
print(f"max abs err vs XLA ref (valid rows): {err:.4f}", flush=True)
assert err < 0.1, "value mismatch"

t0 = time.perf_counter()
for i in range(ITERS):
    out = flash_attention(q, k, v, starts, ends, causal=False)
    s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    assert np.isfinite(s), f"non-finite at iter {i}"
    if (i + 1) % 10 == 0:
        print(f"iter {i + 1}/{ITERS} ok sum={s:.1f}", flush=True)
print(f"STRESS OK: {ITERS} iters in {time.perf_counter() - t0:.1f}s", flush=True)
