"""Spec governor PROMOTE path on the real chip (VERDICT r3 #7).

Drives the continuous scheduler with a repetition-heavy stream: an LLM
with zeroed weights emits a constant token (all logits equal → greedy
argmax is token 0 forever — the degenerate form of the reference's
documented repetition failure mode, reference: inference.py:169-171), so
the output-history n-gram drafter predicts perfectly and acceptance ≈ 1.
Asserts the governor PROMOTES (acceptance above threshold after the run)
and reports spec vs plain wall/req-throughput on the same traffic.

Default uses the tiny config: promotion economics live in CHUNK-BOUNDARY
counts (each chunk is a ~0.15 s remote dispatch on this tunnel), which
the tiny model exposes directly without 3B compile times. ``--full``
(VERDICT r4 #5) repeats the proof on the full-size 3B config — the
serving point where a verify round costs ~1.17x a plain step — with
fewer requests to bound the run.

Run: python scripts/bench_spec_promote.py [--full]  (real TPU)
"""

import sys
import threading
import time

sys.path.insert(0, ".")

from llm_speech_summarization_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llm_speech_summarization_tpu.configs import load_config  # noqa: E402
from llm_speech_summarization_tpu.infer.engine import (  # noqa: E402
    LLMSpeechTextInference,
)
from llm_speech_summarization_tpu.serve.server import (  # noqa: E402
    ContinuousBatchingEngine,
    _Request,
)

FULL = "--full" in sys.argv
CFG_YAML = (
    "llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml"
    if FULL
    else "llm_speech_summarization_tpu/configs/yaml/tiny_test.yaml"
)
N_REQ = 8 if FULL else 16
BUDGET = 64


def run(engine, spec_k: int):
    cb = ContinuousBatchingEngine(
        engine, n_slots=8, chunk_steps=4, max_prompt_len=256,
        max_new_tokens=BUDGET, spec_k=spec_k,
    )
    try:
        # warm the compile shapes out of the timed window
        cb.submit(_Request("text", "warmup request", "", BUDGET), timeout=600)
        chunks = {"n": 0}
        orig = cb.decoder.decode_chunk

        def counted(*a, **kw):
            chunks["n"] += 1
            return orig(*a, **kw)

        cb.decoder.decode_chunk = counted
        t0 = time.monotonic()
        threads = []
        for i in range(N_REQ):
            th = threading.Thread(
                target=cb.submit,
                args=(_Request("text", f"repeat this please {i}", "", BUDGET),),
                kwargs={"timeout": 600},
            )
            th.start()
            threads.append(th)
        for th in threads:
            th.join()
        wall = time.monotonic() - t0
        acc = cb.spec_governor.acceptance if cb.spec_governor else None
        return wall, chunks["n"], acc
    finally:
        cb.shutdown()


def main():
    engine = LLMSpeechTextInference(load_config(CFG_YAML))
    engine.llm_params = jax.tree_util.tree_map(
        lambda a: a * 0 if jnp.issubdtype(a.dtype, jnp.floating) else a,
        engine.llm_params,
    )
    for spec_k in (0, 4):
        wall, chunks, acc = run(engine, spec_k)
        extra = f" governor acceptance={acc:.3f}" if acc is not None else ""
        print(
            f"spec_k={spec_k}: {N_REQ} reqs x {BUDGET} tok in {wall:.2f} s "
            f"({N_REQ / wall:.2f} req/s, {chunks} decode chunks){extra}",
            flush=True,
        )
        if spec_k > 0:
            assert acc is not None and acc > 0.05, (
                f"governor failed to promote on the repetitive stream: {acc}"
            )
            print("governor PROMOTED (acceptance above breakeven)", flush=True)


if __name__ == "__main__":
    main()
