"""Paged-vs-dense decode-step timing at full size (PERF.md paged section).

Round-2 numbers at N=64 slots, 3B geometry: dense 12.3 ms/step, paged-bf16
28.2, paged-int8 22.2 — the paged kernel was DMA-ISSUE-bound (one DMA per
(head, page) per step). Round 3 moves the pools to a PAGE-major layout so
one DMA per (sequence, page) carries all Hkv heads (kernels/
paged_attention.py); this script measures the effect end-to-end through
``SlotDecoder.decode_chunk`` (the serving hot loop).

Usage: python scripts/bench_paged.py [--modes dense,paged,paged_int8]
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

from llm_speech_summarization_tpu.infer.slots import SlotDecoder  # noqa: E402
from llm_speech_summarization_tpu.models.llama import (  # noqa: E402
    init_llama_params,
    llama_preset,
)

N_SLOTS = 64
ADMIT = 32  # the 60%-of-worst pool admits ~38 full-budget rows; the decode
# program's cost is N_SLOTS-bound either way (empty slots compute too)
PROMPT = 384
MAX_NEW = 64  # max_len 448 — the round-2 measurement point; larger budgets
# inflate the 60%-of-worst pool past HBM next to the 6.4 GB bf16 weights
CHUNK = 16
ROUNDS = 2


def run(params, cfg, paged: bool, cache_dtype) -> float:
    dec = SlotDecoder(
        params, cfg, eos_id=0, n_slots=N_SLOTS, max_prompt_len=PROMPT,
        max_new_tokens=MAX_NEW, cache_dtype=cache_dtype, paged=paged,
        page_size=64,
    )
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        0.02 * rng.randn(ADMIT, PROMPT, cfg.hidden_size), jnp.bfloat16
    )
    mask = jnp.ones((ADMIT, PROMPT), bool)
    dec.admit(embeds, mask, list(range(ADMIT)), [MAX_NEW] * ADMIT)
    dec.decode_chunk(CHUNK)  # compile + warm
    _ = dec.sync_flags()
    times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        dec.decode_chunk(CHUNK)
        _ = dec.sync_flags()  # host sync (block_until_ready is a no-op here)
        times.append((time.perf_counter() - t0) / CHUNK * 1000.0)
    return float(np.median(times))


def main():
    modes = "dense,paged,paged_int8"
    for a in sys.argv:
        if a.startswith("--modes="):
            modes = a.split("=")[1]
    cfg = llama_preset("llama3_3b")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    results = {}
    for mode in modes.split(","):
        paged = mode.startswith("paged")
        dtype = jnp.int8 if mode.endswith("int8") else jnp.bfloat16
        results[mode] = run(params, cfg, paged, dtype)
        print(f"{mode}: {results[mode]:.2f} ms/step @ N={N_SLOTS} (admitted {ADMIT})", flush=True)
    if "dense" in results and "paged" in results:
        print(f"paged/dense ratio: {results['paged'] / results['dense']:.2f}x")


if __name__ == "__main__":
    main()
