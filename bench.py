"""Benchmark: batched audio-prompt inference throughput on one TPU chip.

Measures the product path (reference: inference.py:95-137): waveform →
HuBERT-large → pool projector → [prefix|audio|suffix] splice → Llama-3.2-3B
prefill + KV-cache greedy decode of 64 tokens, batched over 128 utterances of
10 s each. Random-init weights (no egress in this environment); throughput
is weight-independent.

Rounds run as ONE pipelined bulk stream (`generate_audio_response_batches`):
batch i+1's host upload + encoder forward overlaps batch i's prefill+decode
— the steady-state regime a sustained bulk workload sees; token streams are
identical to per-batch calls (tests/test_generate.py). The reported value
is BATCH / (wall / ROUNDS).

Fault tolerance (VERDICT r1 #2): the shared tunneled chip's worker process
can crash mid-run ("kernel fault"). Each attempt rebuilds the engine from
scratch; after ATTEMPTS_WITH_FLASH failed attempts the Pallas encoder
attention is gated off (LSS_ENCODER_FLASH=0) to isolate the suspect kernel.
The JSON line is emitted as long as ONE attempt completed its stream.

Baseline note: the reference publishes NO numbers (BASELINE.md). The
vs_baseline denominator is a documented estimate of the reference's
single-GPU (A100, fp16, bs=1, HF eager generate) rate on the same
workload: ~35 tok/s decode → ~1.9 s/utterance → ~0.53 utt/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")
from llm_speech_summarization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BASELINE_UTT_PER_S = 0.53  # documented estimate, see module docstring

BATCH = 128
AUDIO_SECONDS = 10.0
MAX_NEW_TOKENS = 64
ROUNDS = 4  # one pipelined stream: the first batch's un-hidden upload amortizes over rounds
MAX_ATTEMPTS = 4
ATTEMPTS_WITH_FLASH = 2  # after this many failures, gate off encoder flash


def _run_attempt(audios):
    """Build a fresh engine and time ONE pipelined stream of ROUNDS batches.

    The stream runs through the bulk API
    (``generate_audio_response_batches``): batch i+1's host upload +
    encoder forward overlaps batch i's prefill+decode — the steady-state
    bulk-summarization regime (token streams identical to per-batch calls,
    tests/test_generate.py). The stream is all-or-nothing: a mid-stream
    worker fault discards the attempt and the NEXT attempt re-times the
    full stream on a rebuilt engine (a crash invalidates all device state,
    so the engine is never reused).

    Returns (seconds_per_round | None, error | None).
    """
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    try:
        cfg = load_config("llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml")
        engine = LLMSpeechTextInference(cfg)
        # warmup (compile)
        engine.generate_audio_response_batch(audios, max_new_tokens=MAX_NEW_TOKENS)
        t0 = time.perf_counter()
        outs = engine.generate_audio_response_batches(
            [audios] * ROUNDS, max_new_tokens=MAX_NEW_TOKENS
        )
        wall = time.perf_counter() - t0
        assert len(outs) == ROUNDS
        return wall / ROUNDS, None
    except Exception as e:  # noqa: BLE001 — worker faults surface as many types
        traceback.print_exc(file=sys.stderr)
        return None, e


def main():
    rng = np.random.RandomState(0)
    sr = 16000
    audios = [
        (0.1 * rng.randn(int(AUDIO_SECONDS * sr))).astype(np.float32) for _ in range(BATCH)
    ]

    sec_per_round = None
    encoder_flash = os.environ.get("LSS_ENCODER_FLASH", "1") != "0"
    for attempt in range(1, MAX_ATTEMPTS + 1):
        if attempt > ATTEMPTS_WITH_FLASH and encoder_flash:
            print(
                f"[bench] attempt {attempt}: gating off Pallas encoder attention "
                "(LSS_ENCODER_FLASH=0) to isolate suspected kernel fault",
                file=sys.stderr,
            )
            os.environ["LSS_ENCODER_FLASH"] = "0"
            encoder_flash = False
        sec_per_round, err = _run_attempt(audios)
        if err is None:
            break
        print(
            f"[bench] attempt {attempt} failed: {err!r}; retrying in {5 * attempt}s",
            file=sys.stderr,
        )
        time.sleep(5 * attempt)

    if sec_per_round is None:
        print("[bench] all attempts failed, no timed stream completed", file=sys.stderr)
        sys.exit(1)

    utt_per_s = BATCH / sec_per_round
    print(
        json.dumps(
            {
                "metric": "audio_prompt_utterances_per_s_per_chip",
                "value": round(utt_per_s, 3),
                "unit": "utt/s",
                "vs_baseline": round(utt_per_s / BASELINE_UTT_PER_S, 2),
                "rounds": ROUNDS,
                "encoder_flash": encoder_flash,
            }
        )
    )


if __name__ == "__main__":
    main()
