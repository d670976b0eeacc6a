"""Per-row token sampling for the continuous-batching decoder.

The reference ships greedy decode with sampling sketched but disabled
(reference: inference.py:58-64 leaves ``do_sample=True, temperature=0.7``
commented out); the one-shot engine exposes HF generate's knobs as STATIC
per-batch arguments (infer/generate.py::_sample). A continuous-batching
scheduler cannot use static knobs: every decode chunk advances slots that
belong to DIFFERENT requests, each with its own temperature / top-k /
top-p / seed. This module is the per-row, fully-traced counterpart — one
fixed jitted program serves any mix of greedy and sampling requests.

TPU-first design notes:
  * Candidate window: sampling happens inside the top ``CANDIDATES`` (64)
    logits from a single ``lax.top_k`` sweep — vocab-sized per-row sorts
    every step would dwarf the attention cost. Top-p within a 64-candidate
    window is the standard serving approximation (exact whenever the
    nucleus fits 64 tokens, which peaked LLM decode distributions
    essentially always satisfy).
  * Randomness is a counter-based integer hash, not threefry: each slot
    stores one 64-bit seed (two uint32 words, set at admission) and the
    draw at cache offset t mixes (seed, t) through murmur3 finalizers into
    ONE uniform, consumed by an exact inverse-CDF pick over the candidate
    window. Step t of a request is a pure function of (seed, t) — replays
    are reproducible, the decode state carries no evolving key — and the
    whole sampler lowers to a few dozen vector ops (a vmapped threefry
    ``categorical`` here made the serving chunk program pathologically
    slow to compile on the remote-compile backend: >10 min vs seconds).
  * Greedy rows (temperature <= 0) take an EXACT full-vocab argmax — a
    greedy request co-batched with sampling ones is token-identical to a
    greedy-only decoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30
CANDIDATES = 64  # static top-k sweep size; per-row top_k/top_p act inside it


def key_data_from_seed(seed: int):
    """(2,) uint32 seed words for one request (host-side, numpy-only):
    schedulers build admission waves without touching the device."""
    import numpy as np

    s = int(seed) & 0xFFFFFFFFFFFFFFFF
    return np.array([(s >> 32) & 0xFFFFFFFF, s & 0xFFFFFFFF], np.uint32)


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3's 32-bit finalizer: full avalanche on uint32 lanes."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _uniform_rows(rng: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """(N,) uniforms in [0, 1): hash of (per-row 64-bit seed, position)."""
    hi = rng[:, 0]
    lo = rng[:, 1]
    pos = positions.astype(jnp.uint32)
    h = _fmix32(lo ^ (pos * jnp.uint32(0x9E3779B9)))
    h = _fmix32(h ^ _fmix32(hi + jnp.uint32(0x165667B1)))
    # 24 high bits → f32 uniform (f32 has 24 bits of mantissa; using all 32
    # would round some values up to exactly 1.0)
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def sample_rows(
    logits: jnp.ndarray,  # (N, V)
    rng: jnp.ndarray,  # (N, 2) uint32 seed words per row
    positions: jnp.ndarray,  # (N,) int32 — the draw counter: the row's
    # UNPADDED position (offset - pad_len). Callers must not key this to a
    # padded/bucketed offset — bucket choice depends on what co-batches,
    # and a seeded request must replay identically in any batch
    temps: jnp.ndarray,  # (N,) f32; <= 0 → greedy for that row
    top_ks: jnp.ndarray,  # (N,) int32; <= 0 → disabled
    top_ps: jnp.ndarray,  # (N,) f32; >= 1 → disabled
) -> jnp.ndarray:
    """(N,) int32 next-token ids with independent sampling params per row."""
    V = logits.shape[-1]
    C = min(CANDIDATES, V)
    vals, idx = jax.lax.top_k(logits, C)  # (N, C), descending
    # greedy == idx[:, 0] EXACTLY: lax.top_k sorts descending with ties
    # toward lower indices, same as argmax — no second full-vocab scan
    greedy = idx[:, 0].astype(jnp.int32)
    scaled = vals.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]
    # per-row top-k: candidates are sorted, so top-k is a positional mask
    pos = jnp.arange(C)[None, :]
    kk = jnp.where(top_ks <= 0, C, jnp.minimum(top_ks, C))[:, None]
    scaled = jnp.where(pos < kk, scaled, NEG_INF)
    # per-row top-p (nucleus): keep the smallest prefix whose mass reaches
    # top_p; `cum - probs < p` always keeps the top candidate, so a
    # degenerate top_p still yields a valid (argmax) draw
    probs = jax.nn.softmax(scaled, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < jnp.maximum(top_ps, 1e-6)[:, None]
    # exact inverse-CDF draw over the kept prefix with one uniform per row:
    # renormalize the kept mass, pick the first candidate whose cumulative
    # renormalized mass exceeds u
    kept = jnp.where(keep, probs, 0.0)
    kept_cum = jnp.cumsum(kept, axis=-1)
    total = kept_cum[:, -1:]
    u = _uniform_rows(rng, positions)[:, None] * total
    choice = jnp.minimum(
        jnp.sum((kept_cum <= u).astype(jnp.int32), axis=-1), C - 1
    )
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    return jnp.where(temps <= 0.0, greedy, sampled.astype(jnp.int32))


def pack_sampling_params(sampling, n: int):
    """Host-side packing shared by both schedulers: a length-n list of
    ``(temperature, top_k, top_p, seed) | None`` → (rngs, temps, top_ks,
    top_ps) numpy arrays, padded rows greedy. Returns None when every
    entry is None (callers keep the greedy fast path)."""
    import numpy as np

    if sampling is None or all(s is None for s in sampling):
        return None
    temps = np.zeros((n,), np.float32)
    top_ks = np.zeros((n,), np.int32)
    top_ps = np.ones((n,), np.float32)
    rngs = np.zeros((n, 2), np.uint32)
    for i, sp in enumerate(sampling[:n]):
        if sp is None:
            continue
        temperature, top_k, top_p, seed = sp
        temps[i] = temperature
        top_ks[i] = top_k
        top_ps[i] = top_p
        rngs[i] = key_data_from_seed(seed)
    return rngs, temps, top_ks, top_ps
