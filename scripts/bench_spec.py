"""Speculative-decoding measurement (VERDICT r2 #10; PERF.md).

Self-speculative greedy decode (infer/generate.py::speculative_generate):
k-token n-gram draft + one (k+1)-token verification forward per round.
Decode is weight-stream bound, so the verification forward costs about one
decode step; at acceptance rate α each round commits 1+αk tokens.

Random-init weights give the honest WORST case (α≈0 → pure overhead); the
``--alpha1`` mode feeds the greedy stream back as the draft (upper bound,
α=1). Real-weight summarization sits between; the breakeven α follows
from the two bounds.

Usage: python scripts/bench_spec.py [--batches 1,8] [--k 4] [--max-new 64]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from llm_speech_summarization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llm_speech_summarization_tpu.infer.generate import (  # noqa: E402
    greedy_generate,
    speculative_generate,
)
from llm_speech_summarization_tpu.models.llama import (  # noqa: E402
    init_llama_params,
    llama_preset,
)

L = 320
ROUNDS = 3


def timed(fn):
    out = fn()
    _ = np.asarray(out[0])  # compile + sync
    ts = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    batches, k, max_new = [1, 8], 4, 64
    for a in sys.argv:
        if a.startswith("--batches="):
            batches = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--k="):
            k = int(a.split("=")[1])
        if a.startswith("--max-new="):
            max_new = int(a.split("=")[1])

    cfg = llama_preset("llama3_3b")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    for B in batches:
        embeds = jnp.asarray(0.02 * rng.randn(B, L, cfg.hidden_size), jnp.bfloat16)
        mask = jnp.ones((B, L), bool)

        t_g, (g_toks, g_lens) = timed(lambda: greedy_generate(
            params, cfg, embeds, mask, max_new_tokens=max_new, eos_id=-1,
        ))
        n_g = int(np.sum(np.asarray(g_lens)))
        t_s, (s_toks, s_lens, s_rounds) = timed(lambda: speculative_generate(
            params, cfg, embeds, mask, max_new_tokens=max_new, eos_id=-1, k=k,
        ))
        n_s = int(np.sum(np.asarray(s_lens)))
        rounds = int(s_rounds)
        # α=1 upper bound: feed the SPEC path's own stream back as the
        # draft — self-consistent, so every round commits k+1. (Feeding the
        # plain-greedy stream fails on bf16 hardware: a T=1 step and a
        # T=k+1 forward round 128k-vocab near-ties differently, argmax
        # flips, and acceptance collapses — a precision artifact, not a
        # logic one; the CPU f32 equivalence test is exact.)
        t_a, (_, a_lens, a_rounds) = timed(lambda: speculative_generate(
            params, cfg, embeds, mask, max_new_tokens=max_new, eos_id=-1, k=k,
            draft_override=s_toks,
        ))
        n_a = int(np.sum(np.asarray(a_lens)))
        same = bool(np.array_equal(np.asarray(s_toks), np.asarray(g_toks)))
        step_ms = t_g / max_new * 1000
        round_ms = t_s / max(rounds, 1) * 1000
        print(
            f"B={B} k={k} max_new={max_new}: greedy {n_g / t_g:.1f} tok/s "
            f"({step_ms:.1f} ms/step) | spec(ngram) {n_s / t_s:.1f} tok/s "
            f"({rounds} rounds, {round_ms:.1f} ms/round) | "
            f"spec(self-draft) {n_a / t_a:.1f} tok/s ({int(a_rounds)} rounds) | "
            f"round/step cost {round_ms / step_ms:.2f}x | "
            f"tokens == plain greedy: {same}",
            flush=True,
        )


if __name__ == "__main__":
    main()
